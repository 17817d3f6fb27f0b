"""Multi-chip SPMD step (atom decomposition over a virtual 8-device CPU
mesh) — collectives validated against the single-chip nlist engine."""
import dataclasses

import jax
import numpy as np
import pytest

from obmd_tpu import scenes
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.parallel.atom_decomp import (make_mesh, make_sharded_step,
                                           shard_state)


@pytest.fixture(scope="module")
def scene():
    sc = scenes.obmd_dpd_scene(scale=0.1, seed=0, n_max=1800, insert_kmax=4,
                               cell_capacity=16, force_path="nlist")
    state = setup(sc.cfg, sc.state)
    return sc.cfg, state


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_counts(scene):
    cfg, state = scene
    mesh = make_mesh(8)
    sstate = shard_state(state, mesh)
    sstep = make_sharded_step(cfg, mesh)
    lstep = jax.jit(make_step(cfg))

    s_sh, s_l = sstate, state
    for _ in range(3):
        s_sh = sstep(s_sh)
        s_l = lstep(s_l)
    assert int(s_sh.natoms) == int(s_l.natoms)
    assert int(s_sh.obmd.ndeleted) == int(s_l.obmd.ndeleted)
    assert int(s_sh.obmd.ninserted) == int(s_l.obmd.ninserted)
    # same atoms (tags), same positions up to fp ordering
    a1, a2 = np.asarray(s_sh.alive), np.asarray(s_l.alive)
    m1 = {int(t): np.asarray(s_sh.x)[i]
          for i, t in enumerate(np.asarray(s_sh.tag)) if a1[i]}
    m2 = {int(t): np.asarray(s_l.x)[i]
          for i, t in enumerate(np.asarray(s_l.tag)) if a2[i]}
    assert set(m1) == set(m2)
    diffs = [np.abs(m1[t] - m2[t]).max() for t in m1]
    assert max(diffs) < 2e-3


def test_sharded_state_placement(scene):
    cfg, state = scene
    mesh = make_mesh(8)
    sstate = shard_state(state, mesh)
    # per-atom leaves sharded over the axis, scalars replicated
    assert len(sstate.x.sharding.device_set) == 8
    assert int(sstate.natoms) == int(state.natoms)
