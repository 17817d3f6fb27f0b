"""Pallas USHER kernel (forces/pallas_usher.py) vs the XLA batch search —
small sizes, interpreter mode on CPU (on TPU the cellpad engine uses the
kernel; on CPU it falls back to XLA, so this test pins the equivalence)."""
import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu.config import Capacity, DPDParams, ObmdParams, SceneConfig, UsherParams
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.obmd.subset import Subset, usher_search_subset_batch
from obmd_tpu.forces.pallas_usher import usher_search_pallas


def test_pallas_usher_matches_xla_batch():
    box = Box((0.0, 0.0, 0.0), (8.0, 4.0, 4.0), (False, True, True))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=1, a0=60.0,
                            gamma=4.5)
    r5 = RegionBlock((0.0, 0.0, 0.0), (1.6, 4.0, 4.0))
    r6 = RegionBlock((6.4, 0.0, 0.0), (8.0, 4.0, 4.0))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    obmd = ObmdParams(ntype=0, nfreq=1, seed=2, pxx=1.0, alpha=0.5,
                      tau=0.01, nbuf=50.0, region1=r5, region2=r6,
                      region3=deg, region4=deg, region5=r5, region6=r6,
                      buffer_size=1.6,
                      usher=UsherParams(etarget=12.0, nattempt=10),
                      insert_kmax=8)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                      capacity=Capacity(n_max=256, cell_capacity=24),
                      obmd=obmd, skin=0.3, force_path="sweep")

    r = np.random.default_rng(3)
    B = 140
    def mk_sub(lo, hi):
        xs = r.uniform(lo, hi, (B, 3)).astype(np.float32)
        valid = np.ones(B, bool)
        valid[-12:] = False
        return Subset(idx=jnp.zeros((B,), jnp.int32), x=jnp.asarray(xs),
                      type=jnp.zeros((B,), jnp.int32),
                      q=jnp.zeros((B,), jnp.float32),
                      valid=jnp.asarray(valid),
                      overflow=jnp.zeros((), bool))
    sub_l = mk_sub([0.0, 0.0, 0.0], [2.6, 4.0, 4.0])
    sub_r = mk_sub([5.4, 0.0, 0.0], [8.0, 4.0, 4.0])

    K = 8
    kk = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(kk)
    cand_l = r5.sample_uniform(jax.random.uniform(k1, (K, 3)))
    cand_r = r6.sample_uniform(jax.random.uniform(k2, (K, 3)))
    ctype = jnp.zeros((K,), jnp.int32)

    # float64 oracle of the identical algorithm (ref :1531-1611); compare
    # each implementation's verdicts against it on candidates whose final
    # margins are robust (fp ulp differences between div and hardware
    # rsqrt legitimately flip candidates that graze the etarget threshold
    # or the region boundary mid-walk)
    def oracle(sub, cand, region):
        xs = np.asarray(sub.x, np.float64)
        val = np.asarray(sub.valid)
        u = cfg.obmd.usher
        out = []
        for k in range(K):
            p = np.asarray(cand)[k].astype(np.float64)
            acc = False
            fragile = False
            for _ in range(u.nattempt + 1):
                d = p[None, :] - xs
                d[:, 1] -= 4.0 * np.round(d[:, 1] / 4.0)
                d[:, 2] -= 4.0 * np.round(d[:, 2] / 4.0)
                rsq = (d * d).sum(-1)
                inr = val & (rsq < 1.0) & (rsq > 1e-20)
                r = np.sqrt(np.maximum(rsq, 1e-20))
                wd = 1.0 - r
                E = np.sum(np.where(inr, 0.5 * 60.0 * wd * wd, 0.0))
                F = np.sum(np.where(inr, (60.0 * wd / r), 0.0)[:, None] * d,
                           axis=0)
                if abs(E - u.etarget) < 0.2:
                    fragile = True
                if E < u.etarget + 1e-6:
                    acc = True
                    break
                fabs = np.linalg.norm(F)
                if fabs < 1e-6:
                    break
                ds = min((E - u.etarget) / fabs, u.ds0)
                if E > u.uovlp:
                    ds = u.dsovlp - (4.0 * u.eps / max(E, 1e-6)) ** (1 / 12)
                p2 = p + F / fabs * ds
                lo, hi = np.asarray(region.lo), np.asarray(region.hi)
                dist = np.minimum(p2 - lo, hi - p2).min()
                if abs(dist) < 1e-3:
                    fragile = True
                if dist < 0:
                    break
                p = p2
            out.append((acc, fragile))
        return out

    pa, aa, _ = usher_search_subset_batch(cfg, sub_l, sub_r, cand_l,
                                          cand_r, ctype, r5, r6)
    pb, ab, _ = usher_search_pallas(cfg, sub_l, sub_r, cand_l, cand_r,
                                    r5, r6)
    checked = 0
    for side, (sub, cand, region) in enumerate(
            ((sub_l, cand_l, r5), (sub_r, cand_r, r6))):
        for k, (acc, fragile) in enumerate(oracle(sub, cand, region)):
            if fragile:
                continue
            checked += 1
            assert bool(np.asarray(aa)[side, k]) == acc, ("xla", side, k)
            assert bool(np.asarray(ab)[side, k]) == acc, ("pallas", side, k)
    assert checked >= 6          # enough robust candidates actually compared


def _mk_scene(pair, ntype=0, n_types=1):
    box = Box((0.0, 0.0, 0.0), (8.0, 4.0, 4.0), (False, True, True))
    r5 = RegionBlock((0.0, 0.0, 0.0), (1.6, 4.0, 4.0))
    r6 = RegionBlock((6.4, 0.0, 0.0), (8.0, 4.0, 4.0))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    obmd = ObmdParams(ntype=ntype, nfreq=1, seed=2, pxx=1.0, alpha=0.5,
                      tau=0.01, nbuf=50.0, region1=r5, region2=r6,
                      region3=deg, region4=deg, region5=r5, region6=r6,
                      buffer_size=1.6,
                      usher=UsherParams(etarget=9.0, nattempt=12),
                      insert_kmax=8)
    cfg = SceneConfig(box=box, masses=(1.0,) * n_types, pair=pair, dt=0.01,
                      capacity=Capacity(n_max=256, cell_capacity=24),
                      obmd=obmd, skin=0.3, force_path="sweep")
    return cfg, r5, r6


def _cross_check(cfg, r5, r6, seed=3, multi=False):
    """Pallas vs XLA verdict/position agreement on margin-robust
    candidates (fp-fragile ones — |E - etarget| grazing the gate at the
    final position — are excluded, same rationale as the oracle above)."""
    from obmd_tpu.obmd.subset import conservative_energy_force
    r = np.random.default_rng(seed)
    B = 120

    def mk_sub(lo, hi):
        xs = r.uniform(lo, hi, (B, 3)).astype(np.float32)
        valid = np.ones(B, bool)
        valid[-10:] = False
        ty = (r.integers(0, 2, B) if multi else np.zeros(B)).astype(np.int32)
        return Subset(idx=jnp.zeros((B,), jnp.int32), x=jnp.asarray(xs),
                      type=jnp.asarray(ty),
                      q=jnp.zeros((B,), jnp.float32),
                      valid=jnp.asarray(valid),
                      overflow=jnp.zeros((), bool))

    sub_l = mk_sub([0.0, 0.0, 0.0], [2.6, 4.0, 4.0])
    sub_r = mk_sub([5.4, 0.0, 0.0], [8.0, 4.0, 4.0])
    K = 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    cand_l = r5.sample_uniform(jax.random.uniform(k1, (K, 3)))
    cand_r = r6.sample_uniform(jax.random.uniform(k2, (K, 3)))
    ctype = jnp.full((K,), cfg.obmd.ntype, jnp.int32)

    pa, aa, _ = usher_search_subset_batch(cfg, sub_l, sub_r, cand_l,
                                          cand_r, ctype, r5, r6)
    pb, ab, _ = usher_search_pallas(cfg, sub_l, sub_r, cand_l, cand_r,
                                    r5, r6)
    et = float(cfg.obmd.usher.etarget)
    checked = 0
    for side, sub in ((0, sub_l), (1, sub_r)):
        Ea, _ = conservative_energy_force(cfg.pair, sub, cfg.box,
                                          pa[side], ctype)
        Eb, _ = conservative_energy_force(cfg.pair, sub, cfg.box,
                                          pb[side], ctype)
        for k in range(K):
            if (abs(float(Ea[k]) - et) < 0.3
                    or abs(float(Eb[k]) - et) < 0.3):
                continue
            checked += 1
            assert (bool(np.asarray(aa)[side, k])
                    == bool(np.asarray(ab)[side, k])), (side, k)
            if np.asarray(aa)[side, k]:
                assert np.abs(np.asarray(pa)[side, k]
                              - np.asarray(pb)[side, k]).max() < 2e-3
    assert checked >= 6


def test_pallas_usher_multitype_dpd():
    """Round-5: the kernel's per-lane a0/cut rows cover ntypes > 1."""
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=1,
                            a0=((40.0, 80.0), (80.0, 60.0)),
                            gamma=4.5, ntypes=2)
    cfg, r5, r6 = _mk_scene(pair, ntype=1, n_types=2)
    _cross_check(cfg, r5, r6, multi=True)


def test_pallas_usher_lj():
    """Round-5: lj/cut trial energies in-kernel (lj3/lj4/cut/shift
    per-lane rows)."""
    from obmd_tpu.config import LJCutParams
    pair = LJCutParams.create(cutoff=1.2, epsilon=1.0, sigma=0.9,
                              shift=True)
    cfg, r5, r6 = _mk_scene(pair)
    _cross_check(cfg, r5, r6, seed=9)


def test_pallas_usher_ljrf_neutral():
    """Round-5: lj/cut/rf with neutral trials — the RF term vanishes
    identically (q_trial = 0), the kernel runs the LJ rows (the charged
    MOLECULE templates keep the XLA search)."""
    from obmd_tpu.config import LJCutRFParams
    pair = LJCutRFParams.create(cut_lj=1.2, epsilon=0.8, sigma=0.9,
                                eps_rf=80.0)
    cfg, r5, r6 = _mk_scene(pair)
    _cross_check(cfg, r5, r6, seed=11)
