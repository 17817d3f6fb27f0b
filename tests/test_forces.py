import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu import rng
from obmd_tpu.cells import GridSpec, build_cells
from obmd_tpu.config import DPDParams, LJCutParams, LJCutRFParams
from obmd_tpu.forces.pairs import pair_sweep, trial_energy_force
from obmd_tpu.geometry import Box


def _mk_system(n=80, seed=0, box=None):
    box = box or Box((0.0, 0.0, 0.0), (5.0, 4.0, 4.0), (False, True, True))
    r = np.random.default_rng(seed)
    x = r.uniform(np.asarray(box.lo), np.asarray(box.hi), (n, 3)).astype(np.float32)
    v = r.normal(0, 1, (n, 3)).astype(np.float32)
    types = r.integers(0, 2, n).astype(np.int32)
    tags = np.arange(1, n + 1, dtype=np.int32)
    q = r.normal(0, 0.5, n).astype(np.float32)
    return box, x, v, types, tags, q


def _min_image(d, box):
    L = np.asarray(box.lengths)
    per = np.asarray(box.periodic)
    return np.where(per, d - L * np.round(d / L), d)


def _brute_dpd(params, box, x, v, types, dt):
    """Conservative + drag only (deterministic part), f64."""
    n = len(x)
    a0 = np.asarray(params.a0)
    gam = np.asarray(params.gamma)
    cut = np.asarray(params.cut)
    f = np.zeros((n, 3))
    e = np.zeros(n)
    w = np.zeros(6)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = _min_image(x[i].astype(np.float64) - x[j], box)
            rsq = d @ d
            ti, tj = types[i], types[j]
            if rsq >= cut[ti, tj] ** 2 or rsq < 1e-20:
                continue
            r = np.sqrt(rsq)
            wd = 1 - r / cut[ti, tj]
            dv = (v[i] - v[j]).astype(np.float64)
            dot = d @ dv
            fpair = (a0[ti, tj] * wd - gam[ti, tj] * wd * wd * dot / r) / r
            f[i] += fpair * d
            e[i] += 0.25 * a0[ti, tj] * cut[ti, tj] * wd * wd  # half share
            fv = fpair * d
            w += 0.5 * np.array([d[0] * fv[0], d[1] * fv[1], d[2] * fv[2],
                                 d[0] * fv[1], d[0] * fv[2], d[1] * fv[2]])
    return f, e, w


def _sweep(params, box, x, v, types, tags, q, dt=0.01, salt=0, cap=16,
           energy=True, virial=True):
    spec = GridSpec.create(box, params.max_cut, cap)

    @jax.jit
    def go(x, v, types, tags, q, salt):
        tab = build_cells(spec, x, jnp.ones(len(x), bool))
        pf = pair_sweep(params, box, spec, tab, x, v, types, tags, q,
                        salt, dt=dt, compute_energy=energy,
                        compute_virial=virial)
        return pf, tab.overflow

    pf, overflow = go(jnp.asarray(x), jnp.asarray(v), jnp.asarray(types),
                      jnp.asarray(tags), jnp.asarray(q), jnp.uint32(salt))
    assert int(overflow) == 0
    return pf


def test_dpd_deterministic_matches_brute():
    box, x, v, types, tags, q = _mk_system(n=90, seed=2)
    params = DPDParams.create(temp=1.0, cutoff=1.0, seed=1,
                              a0=[[25.0, 30.0], [30.0, 20.0]],
                              gamma=[[4.5, 3.0], [3.0, 5.0]],
                              cut=[[1.0, 0.8], [0.8, 1.0]], ntypes=2)
    # zero temperature -> sigma = 0 -> no random force
    params0 = DPDParams.create(temp=0.0, cutoff=1.0, seed=1,
                               a0=params.a0, gamma=params.gamma,
                               cut=params.cut, ntypes=2)
    pf = _sweep(params0, box, x, v, types, tags, q)
    fb, eb, wb = _brute_dpd(params, box, x, v, types, 0.01)
    np.testing.assert_allclose(np.asarray(pf.f), fb, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pf.pe), eb, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pf.virial), wb, rtol=2e-4, atol=2e-3)


def test_dpd_noise_newton_third_law():
    """Total random force must vanish: pair noise is symmetric."""
    box, x, v, types, tags, q = _mk_system(n=120, seed=3)
    params = DPDParams.create(temp=1.0, cutoff=1.0, seed=7, a0=25.0,
                              gamma=4.5, ntypes=1)
    pf = _sweep(params, box, x, v, types, tags, q, salt=1234,
                energy=False, virial=False)
    total = np.asarray(pf.f).sum(axis=0)
    assert np.abs(total).max() < 5e-3  # f32 accumulation noise only


def test_dpd_noise_statistics():
    """Random-force contribution has the right per-pair variance."""
    box, x, v, types, tags, q = _mk_system(n=100, seed=4)
    params = DPDParams.create(temp=1.0, cutoff=1.0, seed=7, a0=0.0,
                              gamma=4.5, ntypes=1)  # only noise (a0=0, v=0)
    v0 = np.zeros_like(v)
    dt = 0.04

    spec = GridSpec.create(box, params.max_cut, 16)
    tab = build_cells(spec, jnp.asarray(x), jnp.ones(len(x), bool))

    @jax.jit
    def one(salt):
        return pair_sweep(params, box, spec, tab, jnp.asarray(x),
                          jnp.asarray(v0), jnp.asarray(types),
                          jnp.asarray(tags), jnp.asarray(q), salt,
                          dt=dt).f

    samples = [np.asarray(one(jnp.uint32(salt))) for salt in range(200)]
    s = np.stack(samples)
    # each atom's force = sum_j sigma wd_ij xi_ij rhat /sqrt(dt);
    # E[f]=0 across salts: |mean| must stay within ~5 standard errors
    mean = s.mean(axis=0)
    stderr = s.std(axis=0) / np.sqrt(len(samples)) + 1e-6
    assert (np.abs(mean) < 5.0 * stderr).all()
    # global variance sanity: sigma = sqrt(2*T*gamma) = 3.0
    # Var(f_x of atom i) = sum_j sigma^2 wd^2 rhatx^2 / dt -- check against
    # direct computation
    cut = 1.0
    var_pred = np.zeros((len(x), 3))
    for i in range(len(x)):
        for j in range(len(x)):
            if i == j:
                continue
            d = _min_image(x[i].astype(np.float64) - x[j], box)
            rsq = d @ d
            if rsq >= cut**2 or rsq < 1e-20:
                continue
            r = np.sqrt(rsq)
            wd = 1 - r / cut
            var_pred[i] += 9.0 * wd**2 * (d / r) ** 2 / dt
    var_obs = s.var(axis=0)
    ratio = (var_obs.sum()) / (var_pred.sum())
    assert 0.9 < ratio < 1.1


def _brute_lj(params, box, x, types):
    n = len(x)
    eps = np.asarray(params.epsilon)
    sig = np.asarray(params.sigma)
    cut = np.asarray(params.cut)
    f = np.zeros((n, 3))
    e = np.zeros(n)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = _min_image(x[i].astype(np.float64) - x[j], box)
            rsq = d @ d
            ti, tj = types[i], types[j]
            if rsq >= cut[ti, tj] ** 2:
                continue
            s6 = sig[ti, tj] ** 6
            r6 = rsq ** -3
            f[i] += (24 * eps[ti, tj] * s6 * r6 * (2 * s6 * r6 - 1) / rsq) * d
            e[i] += 0.5 * (4 * eps[ti, tj] * s6 * r6 * (s6 * r6 - 1))
    return f, e


def test_lj_matches_brute():
    box = Box((0.0, 0.0, 0.0), (8.0, 6.0, 6.0), (False, True, True))
    r = np.random.default_rng(5)
    # lattice + jitter to avoid r->0 blowups
    gx, gy, gz = np.meshgrid(np.arange(0.5, 8, 1.2), np.arange(0.5, 6, 1.2),
                             np.arange(0.5, 6, 1.2), indexing="ij")
    x = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    x += r.uniform(-0.1, 0.1, x.shape)
    x = x.astype(np.float32)
    n = len(x)
    types = r.integers(0, 2, n).astype(np.int32)
    tags = np.arange(1, n + 1, dtype=np.int32)
    params = LJCutParams.create(cutoff=2.5, epsilon=[[1.0, 0.8], [0.8, 0.6]],
                                sigma=[[1.0, 0.9], [0.9, 0.8]], ntypes=2)
    pf = _sweep(params, box, x, np.zeros_like(x), types, tags,
                np.zeros(n, np.float32), cap=96)
    fb, eb = _brute_lj(params, box, x, types)
    np.testing.assert_allclose(np.asarray(pf.f), fb, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pf.pe), eb, rtol=2e-3, atol=2e-3)


def _brute_ljrf(params, box, x, types, q):
    """LJ + reaction field per pair_lj_cut_rf.cpp:118-171."""
    n = len(x)
    eps = np.asarray(params.epsilon)
    sig = np.asarray(params.sigma)
    cut = np.asarray(params.cut)
    erf = np.asarray(params.eps_rf)
    rc = params.cut_coul
    f = np.zeros((n, 3))
    e = np.zeros(n)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = _min_image(x[i].astype(np.float64) - x[j], box)
            rsq = d @ d
            ti, tj = types[i], types[j]
            fp = 0.0
            if rsq < cut[ti, tj] ** 2:
                s6 = sig[ti, tj] ** 6
                r6 = rsq ** -3
                fp += 24 * eps[ti, tj] * s6 * r6 * (2 * s6 * r6 - 1) / rsq
                e[i] += 0.5 * (4 * eps[ti, tj] * s6 * r6 * (s6 * r6 - 1))
            if rsq < rc * rc:
                r = np.sqrt(rsq)
                rf1 = erf[ti, tj] - 1.0
                rf2 = 1.0 + 2.0 * erf[ti, tj]
                qq = q[i] * q[j]
                fp += qq * (1 / (rsq * r) - (1 / rc**3) * (2 * rf1 / rf2))
                ec = (qq / r * (1 + (rf1 / rf2) * (r / rc) ** 3)
                      - qq / rc * (3 * erf[ti, tj] / rf2))
                e[i] += 0.5 * ec
            f[i] += fp * d
    return f, e


def test_ljrf_matches_brute():
    box = Box((0.0, 0.0, 0.0), (8.0, 6.0, 6.0), (False, True, True))
    r = np.random.default_rng(6)
    gx, gy, gz = np.meshgrid(np.arange(0.5, 8, 1.1), np.arange(0.5, 6, 1.1),
                             np.arange(0.5, 6, 1.1), indexing="ij")
    x = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    x += r.uniform(-0.08, 0.08, x.shape)
    x = x.astype(np.float32)
    n = len(x)
    types = r.integers(0, 2, n).astype(np.int32)
    tags = np.arange(1, n + 1, dtype=np.int32)
    q = r.choice([-0.5, 0.5], n).astype(np.float32)
    params = LJCutRFParams.create(cut_lj=2.0, cut_coul=2.2,
                                  epsilon=[[1.0, 0.8], [0.8, 0.6]],
                                  sigma=[[1.0, 0.9], [0.9, 0.8]],
                                  eps_rf=[[80.0, 80.0], [80.0, 80.0]],
                                  ntypes=2)
    pf = _sweep(params, box, x, np.zeros_like(x), types, tags, q, cap=80)
    fb, eb = _brute_ljrf(params, box, x, types, q)
    np.testing.assert_allclose(np.asarray(pf.f), fb, rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(pf.pe), eb, rtol=3e-3, atol=3e-3)


def test_trial_energy_matches_brute():
    """USHER's energy scan: trial particle vs all atoms, conservative DPD."""
    box, x, v, types, tags, q = _mk_system(n=70, seed=8)
    params = DPDParams.create(temp=1.0, cutoff=1.0, seed=1, a0=209.6,
                              gamma=4.5, ntypes=1)
    types = np.zeros(len(x), np.int32)
    spec = GridSpec.create(box, params.max_cut, 16)
    tab = build_cells(spec, jnp.asarray(x), jnp.ones(len(x), bool))
    cand = np.asarray([[2.5, 2.0, 2.0], [0.3, 0.3, 0.3], [4.9, 3.9, 3.9]],
                      np.float32)
    E, F = jax.jit(lambda c: trial_energy_force(
        params, box, spec, tab, jnp.asarray(x), jnp.asarray(types),
        jnp.asarray(q), c, jnp.zeros(3, jnp.int32)))(jnp.asarray(cand))
    for k in range(len(cand)):
        e_ref, f_ref = 0.0, np.zeros(3)
        for j in range(len(x)):
            d = _min_image(cand[k].astype(np.float64) - x[j], box)
            rsq = d @ d
            if rsq >= 1.0 or rsq < 1e-20:
                continue
            r = np.sqrt(rsq)
            wd = 1 - r
            e_ref += 0.5 * 209.6 * wd * wd
            f_ref += 209.6 * wd / r * d
        np.testing.assert_allclose(float(E[k]), e_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(F[k]), f_ref, rtol=1e-3,
                                   atol=1e-3)
