"""Long-horizon OBMD invariants (round-1 VERDICT #10: 6-step tests cannot
catch slot-churn bugs).  2000 steps of a small OBMD_DPD box on the nlist
engine plus 300 steps on the cellpad engine (its Pallas kernel runs in
interpreter mode on CPU, so the long leg uses the XLA path), asserting the
bookkeeping invariants that slot-reuse/tag/overflow bugs break:

  * particle accounting: natoms == n0 - ndeleted + ninserted
  * no structural overflow: cell table, insertion subsets, half-skin trips
  * insertion keeps up: insert_fail stays a small fraction of insertions
  * buffers track the feedback setpoint band
  * tombstone consistency: every alive slot has a unique positive tag
  * all alive atoms inside the box (wrapped axes) or pending deletion
"""
import jax
import numpy as np

from obmd_tpu.config import Capacity, DPDParams, ObmdParams, SceneConfig
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.integrate import make_run, setup
from obmd_tpu.state import init_state

NSTEPS = 2000


def _scene(force_path="nlist"):
    box = Box((0.0, 0.0, 0.0), (12.0, 4.2, 4.2), (False, True, True))
    b = 2.4
    r1 = RegionBlock((0.0, 0.0, 0.0), (b, 4.2, 4.2))
    r2 = RegionBlock((12.0 - b, 0.0, 0.0), (12.0, 4.2, 4.2))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=2025, a0=25.0,
                            gamma=4.5)
    n0 = 630                      # rho = 3
    obmd = ObmdParams(
        ntype=0, nfreq=1, seed=99, pxx=23.6, alpha=0.6, tau=0.01,
        nbuf=int(3 * b * 4.2 * 4.2 / 0.6),  # alpha*nbuf = rho*Vbuf
        region1=r1, region2=r2, region3=deg, region4=deg,
        region5=r1, region6=r2, buffer_size=b, near=0.35,
        insert_kmax=8, maxattempt=2)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                      capacity=Capacity(n_max=1600, cell_capacity=26),
                      obmd=obmd, skin=0.3, force_path=force_path)
    rng = np.random.default_rng(17)
    x = rng.uniform([0, 0, 0], [12.0, 4.2, 4.2], (n0, 3))
    v = rng.normal(0, 1.0, (n0, 3))
    return cfg, init_state(cfg, x, v=v), n0


def _check(cfg, st, n0, cellpad, nsteps):

    natoms = int(st.natoms)
    ndel = int(st.obmd.ndeleted)
    nins = int(st.obmd.ninserted)
    nfail = int(st.obmd.insert_fail)

    # 1. particle accounting is exact
    assert natoms == n0 - ndel + nins, (natoms, n0, ndel, nins)
    # 2. open-boundary churn actually happened (the test is not vacuous)
    assert ndel > nsteps // 10 and nins > nsteps // 10, (ndel, nins)
    # 3. no structural overflow anywhere
    assert int(st.cell_overflow) == 0
    aux = st.nbrs
    assert int(aux.overflow) == 0, "neighbor/relayout structure overflow"
    if cellpad:
        assert int(aux.skin_trips) == 0, "static rebuild schedule too slow"
    # 4. insertion kept up with the feedback demand
    assert nfail <= max(20, nins // 20), (nfail, nins)
    # 5. buffers track the setpoint band (alpha*nbuf per buffer, +-25%)
    alive = np.asarray(st.alive)
    x0 = np.asarray(st.x)[:, 0]
    target = cfg.obmd.alpha * cfg.obmd.nbuf
    n_l = int((alive & (x0 <= cfg.obmd.buffer_size)).sum())
    n_r = int((alive & (x0 >= 12.0 - cfg.obmd.buffer_size)).sum())
    assert 0.75 * target < n_l < 1.25 * target, (n_l, target)
    assert 0.75 * target < n_r < 1.25 * target, (n_r, target)
    # 6. every alive slot has a unique positive tag
    tags = np.asarray(st.tag)[alive]
    assert (tags > 0).all()
    assert len(np.unique(tags)) == len(tags)
    # 7. alive atoms sit inside the box on wrapped axes; x within one
    # step's drift of the open faces
    xs = np.asarray(st.x)[alive]
    assert (xs[:, 1] >= 0).all() and (xs[:, 1] <= 4.2).all()
    assert (xs[:, 2] >= 0).all() and (xs[:, 2] <= 4.2).all()
    assert (xs[:, 0] > -1.0).all() and (xs[:, 0] < 13.0).all()


def test_obmd_invariants_2000_steps_nlist():
    cfg, st, n0 = _scene("nlist")
    st = setup(cfg, st)
    st = make_run(cfg, NSTEPS)(st)
    _check(cfg, st, n0, cellpad=False, nsteps=NSTEPS)


def test_obmd_invariants_300_steps_cellpad():
    cfg, st, n0 = _scene("cellpad")
    st = setup(cfg, st)
    st = make_run(cfg, 300)(st)
    _check(cfg, st, n0, cellpad=True, nsteps=300)
