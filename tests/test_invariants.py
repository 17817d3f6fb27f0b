"""Loud-failure enforcement of the validity counters (VERDICT round-2
weak #3: telemetry existed — skin_trips, cell_overflow, relayout overflow —
but nothing raised, so an under-provisioned scene could silently run with
stale or dropped pairs, the failure class behind the round-2 hot-thermostat
incident).  These tests pin that under-provisioning now fails loudly."""
import dataclasses

import jax
import numpy as np
import pytest

from obmd_tpu.config import Capacity, DPDParams, SceneConfig
from obmd_tpu.geometry import Box
from obmd_tpu.integrate import make_run, make_step, setup
from obmd_tpu.observe import check_invariants
from obmd_tpu.state import init_state


def _dense_gas(n=600, box_len=6.0, seed=0):
    r = np.random.default_rng(seed)
    x = r.uniform(0.0, box_len, (n, 3))
    v = r.normal(0.0, 1.0, (n, 3))
    return x, v


def _cfg(force_path, cell_capacity, **kw):
    box = Box((0.0, 0.0, 0.0), (6.0, 6.0, 6.0), (True, True, True))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=5, a0=25.0, gamma=4.5)
    return SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                       capacity=Capacity(n_max=700,
                                         cell_capacity=cell_capacity),
                       skin=0.3, force_path=force_path, **kw)


def test_cellpad_setup_raises_on_dropped_atoms():
    """cell_capacity too small for the density: setup_cellpad must raise,
    not silently drop atoms (this silently lost 332/500 atoms before)."""
    x, v = _dense_gas()
    cfg = _cfg("cellpad", cell_capacity=2)
    st = init_state(cfg, x, v=v)
    with pytest.raises(ValueError, match="dropped"):
        setup(cfg, st)


def test_check_invariants_raises_on_skin_trips():
    """rebuild_every far beyond the drift budget: skin_trips increments and
    check_invariants raises; a generous schedule passes."""
    x, v = _dense_gas()
    cfg = _cfg("cellpad", cell_capacity=48, rebuild_every=200)
    st = setup(cfg, init_state(cfg, x, v=v))
    st = make_run(cfg, 400)(st)
    assert int(st.nbrs.skin_trips) > 0
    with pytest.raises(RuntimeError, match="skin_trips"):
        check_invariants(cfg, st)
    tel = check_invariants(cfg, st, raise_on_violation=False)
    assert tel["skin_trips"] > 0

    cfg_ok = _cfg("cellpad", cell_capacity=48)     # auto schedule
    st2 = setup(cfg_ok, init_state(cfg_ok, x, v=v))
    st2 = make_run(cfg_ok, 400)(st2)
    check_invariants(cfg_ok, st2)                  # must not raise


def test_check_invariants_raises_on_nlist_overflow():
    """max_neighbors far below the true neighbor count: row overflow is
    counted and enforced (asymmetric truncation breaks force symmetry)."""
    x, v = _dense_gas()
    cfg = dataclasses.replace(
        _cfg("nlist", cell_capacity=48),
        capacity=Capacity(n_max=700, cell_capacity=48, max_neighbors=8))
    st = setup(cfg, init_state(cfg, x, v=v))
    step = jax.jit(make_step(cfg))
    for _ in range(3):
        st = step(st)
    with pytest.raises(RuntimeError, match="overflow"):
        check_invariants(cfg, st)


def test_auto_rebuild_every_scales_with_temperature():
    """Hotter scenes get a shorter relayout period (ADVICE round-2: v_fast
    was a hard-coded constant calibrated at T=1)."""
    from obmd_tpu.engine_cellpad import auto_rebuild_every
    cold = _cfg("cellpad", cell_capacity=48)
    hot = dataclasses.replace(
        cold, pair=DPDParams.create(temp=4.0, cutoff=1.0, seed=5, a0=25.0,
                                    gamma=4.5))
    assert auto_rebuild_every(hot) <= auto_rebuild_every(cold)
    assert auto_rebuild_every(hot) >= 1
