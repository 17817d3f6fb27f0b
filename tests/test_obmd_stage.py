import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from obmd_tpu.config import (Capacity, DPDParams, ObmdParams, SceneConfig,
                             UsherParams)
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.obmd import stage
from obmd_tpu.state import init_state


def _cfg(usher=True, near=None, pxx=10.0, dpxx=0.0, freq=0.0, nbuf=20.0,
         n_max=64, insert_kmax=8):
    box = Box((0.0, 0.0, 0.0), (10.0, 4.0, 4.0), (False, True, True))
    b = 2.0  # buffer size
    r1 = RegionBlock((0.0, 0.0, 0.0), (b, 4.0, 4.0))
    r2 = RegionBlock((8.0, 0.0, 0.0), (10.0, 4.0, 4.0))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=3, a0=25.0, gamma=4.5)
    obmd = ObmdParams(
        ntype=0, nfreq=1, seed=11, pxx=pxx, dpxx=dpxx, freq=freq,
        alpha=0.5, tau=0.01, nbuf=nbuf,
        region1=r1, region2=r2, region3=deg, region4=deg, region5=r1,
        region6=r2, buffer_size=b, g_fac=0.25,
        usher=UsherParams(etarget=10.0, nattempt=20) if usher else None,
        near=near, insert_kmax=insert_kmax)
    return SceneConfig(box=box, masses=(2.0,), pair=pair, dt=0.01,
                       capacity=Capacity(n_max=n_max, cell_capacity=8),
                       obmd=obmd)


def test_delete_outside_tally():
    cfg = _cfg()
    x = np.asarray([[-0.5, 1, 1],    # out left
                    [10.5, 1, 1],    # out right
                    [5.0, 1, 1],     # inside
                    [0.0, 1, 1]])    # on boundary -> kept (strict <,>)
    v = np.asarray([[1.0, 2.0, 3.0], [-1.0, 0.5, 0.0], [9, 9, 9], [1, 1, 1]])
    st = init_state(cfg, x, v=v)
    st2, vnewl, vnewr = jax.jit(lambda s: stage.delete_outside(cfg, s))(st)
    assert int(st2.natoms) == 2
    # mass = 2.0
    np.testing.assert_allclose(np.asarray(vnewl), [2.0, 4.0, 6.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(vnewr), [-2.0, 1.0, 0.0], atol=1e-6)
    assert int(st2.obmd.ndeleted) == 2
    alive = np.asarray(st2.alive)
    assert alive[2] and alive[3] and not alive[0] and not alive[1]


def test_feedback_count_truncation():
    # ninsert = -(int)((cnt/mol_len - alpha*nbuf)*dt/tau), trunc toward zero
    # (fix_obmd_merged.cpp:586)
    import jax.numpy as jnp
    ni = stage.feedback_count(jnp.int32(4), 1, 0.5, 20.0, 0.01, 0.001)
    # (4 - 10)*10 = -60 -> ninsert = 60
    assert int(ni) == 60
    ni = stage.feedback_count(jnp.int32(12), 1, 0.5, 20.0, 0.01, 0.001)
    # (12-10)*10 = 20 -> ninsert = -20 (no insertion)
    assert int(ni) == -20
    # fractional truncation: (4-10)*0.01/0.063 = -0.95.. -> 0
    ni = stage.feedback_count(jnp.int32(4), 1, 0.5, 20.0, 0.01, 0.063)
    assert int(ni) == 0


def test_smooth_weight_formula():
    cfg = _cfg()
    m = jnp.asarray([1.0])
    # plateau region deep in left buffer: g = m
    g = stage.smooth_weight(cfg, jnp.asarray([0.5]), m)
    np.testing.assert_allclose(np.asarray(g), [1.0], atol=1e-6)
    # ROI: zero
    g = stage.smooth_weight(cfg, jnp.asarray([5.0]), m)
    np.testing.assert_allclose(np.asarray(g), [0.0], atol=1e-6)
    # rolloff zone x in (lo + 0.75*b, lo+b) = (1.5, 2.0): between 0 and 1,
    # matching 0.5*(1+cos(pi/gfac*(x-b)/(-b) - pi))
    xs = np.asarray([1.6, 1.8, 1.95])
    g = np.asarray(stage.smooth_weight(cfg, jnp.asarray(xs), m))
    gf, b = 0.25, 2.0
    carg = (1 / gf) * np.pi * (xs - b) / (-b) - np.pi
    expect = 0.5 * (1 + np.cos(carg))
    np.testing.assert_allclose(g, expect, atol=1e-6)
    assert ((g > 0) & (g < 1)).all()
    # weight is continuous at the plateau edge
    geps = np.asarray(stage.smooth_weight(cfg, jnp.asarray([1.5 - 1e-4,
                                                            1.5 + 1e-4]), m))
    assert abs(geps[0] - geps[1]) < 1e-3
    # right buffer mirror
    gr = np.asarray(stage.smooth_weight(cfg, jnp.asarray([9.5, 8.2]), m))
    gl = np.asarray(stage.smooth_weight(cfg, jnp.asarray([0.5, 1.8]), m))
    np.testing.assert_allclose(gr, gl, atol=1e-5)


def test_boundary_force_sums_to_setpoint():
    """sum_i F g_i/sum(g) == F exactly, and only buffer members pushed."""
    cfg = _cfg()
    r = np.random.default_rng(0)
    x = r.uniform([0, 0, 0], [10, 4, 4], (50, 3))
    st = init_state(cfg, x)
    mfl = jnp.asarray([3.0, 0.5, 0.0])
    mfr = jnp.asarray([-2.0, 0.0, 0.0])
    st = st.replace(obmd=st.obmd.replace(momentum_force_left=mfl,
                                         momentum_force_right=mfr))
    f = jax.jit(lambda s: stage.apply_boundary_force(cfg, s, jnp.zeros((cfg.capacity.n_max, 3))))(st)
    f = np.asarray(f)
    x0 = x[:, 0]
    in_left = x0 <= 2.0
    in_right = x0 >= 8.0
    roi = ~in_left & ~in_right
    assert np.abs(f[:50][roi]).max() < 1e-6
    np.testing.assert_allclose(f[:50][in_left].sum(axis=0), [3.0, 0.5, 0.0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(f[:50][in_right].sum(axis=0), [-2.0, 0.0, 0.0],
                               rtol=1e-4, atol=1e-5)


def test_pre_exchange_momentum_force_law():
    """With no atoms outside and an empty system, the setpoint forces are
    pure pressure terms: left = +pxx*A, right = -pxx*A (ref :607-630)."""
    cfg = _cfg(pxx=10.0, nbuf=0.0)  # nbuf=0 -> no insertion wanted
    x = np.asarray([[5.0, 1.0, 1.0]])
    st = init_state(cfg, x)
    from obmd_tpu.integrate import make_grid_spec
    spec = make_grid_spec(cfg)
    st2 = jax.jit(lambda s: stage.pre_exchange(cfg, spec, s))(st)
    area = 16.0
    np.testing.assert_allclose(np.asarray(st2.obmd.momentum_force_left),
                               [100.0 * 1.6, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.obmd.momentum_force_right),
                               [-100.0 * 1.6, 0, 0], rtol=1e-5)
    assert float(st2.sim_time) > 0


def test_pressure_wave_phase():
    """factor = pxx + dpxx*sin(2 pi freq t) with t advanced before use."""
    cfg = _cfg(pxx=0.0, dpxx=5.0, freq=10.0, nbuf=0.0)
    st = init_state(cfg, np.asarray([[5.0, 1.0, 1.0]]))
    from obmd_tpu.integrate import make_grid_spec
    spec = make_grid_spec(cfg)
    st2 = jax.jit(lambda s: stage.pre_exchange(cfg, spec, s))(st)
    t = 0.01
    expect = 5.0 * np.sin(2 * np.pi * 10.0 * t) * 16.0
    np.testing.assert_allclose(float(st2.obmd.momentum_force_left[0]),
                               expect, rtol=1e-4)


def test_insertion_fills_buffer():
    """Empty buffers + feedback law -> particles inserted in regions 5/6
    with v=0, fresh tags, correct type."""
    cfg = _cfg(nbuf=4.0, insert_kmax=8)  # want alpha*nbuf=2 per buffer
    # 1 atom mid-box; buffers empty -> ninsert = -(0 - 2)*0.01/0.01 = 2/buffer
    st = init_state(cfg, np.asarray([[5.0, 2.0, 2.0]]))
    from obmd_tpu.integrate import make_grid_spec
    spec = make_grid_spec(cfg)
    st2 = jax.jit(lambda s: stage.pre_exchange(cfg, spec, s))(st)
    n_ins = int(st2.obmd.ninserted)
    assert n_ins == 4  # 2 per buffer, empty system -> all accepted
    alive = np.asarray(st2.alive)
    new = alive.copy()
    new[0] = False
    xs = np.asarray(st2.x)[new]
    x0 = xs[:, 0]
    assert ((x0 <= 2.0) | (x0 >= 8.0)).all()
    assert (np.asarray(st2.v)[new] == 0).all()
    tags = np.asarray(st2.tag)[new]
    assert sorted(tags.tolist()) == [2, 3, 4, 5]
    assert int(st2.maxtag) == 5


def test_usher_rejects_overfull():
    """A candidate landing on top of a dense cluster must be steered away or
    rejected; accepted candidates must satisfy E < etarget."""
    cfg = _cfg(nbuf=2.0, insert_kmax=4, n_max=1400)
    # pack the left insertion region with a dense grid so energies are high
    g = np.mgrid[0.1:2.0:0.3, 0.1:4.0:0.3, 0.1:4.0:0.3].reshape(3, -1).T
    st = init_state(cfg, g)
    from obmd_tpu.integrate import make_grid_spec
    from obmd_tpu.cells import build_cells
    from obmd_tpu.forces.pairs import trial_energy_force
    import jax.numpy as jnp
    spec = make_grid_spec(cfg)
    st2 = jax.jit(lambda s: stage.pre_exchange(cfg, spec, s))(st)
    # every accepted new atom must have conservative energy < etarget at its
    # final site (measured against the pre-insertion configuration)
    alive = np.asarray(st2.alive)
    new = alive.copy()
    new[:len(g)] = False
    if new.sum():
        tab = build_cells(spec, st.x, st.alive)
        E, _ = trial_energy_force(cfg.pair, cfg.box, spec, tab, st.x,
                                  st.type, st.q,
                                  jnp.asarray(np.asarray(st2.x)[new]),
                                  jnp.zeros(int(new.sum()), jnp.int32))
        assert (np.asarray(E) < 10.0 + 1e-3).all()
