"""The measurement-only A/B kernel variants must be explicit build args —
NEVER environment-sensitive.  Round 4 shipped `OBMD_AB_*` env reads inside
the production pair kernel; a stale shell variable could silently remove
the DPD random force (breaking fluctuation-dissipation) or the y/z
minimum image.  Round 5 moved them to `make_pair_kernel(variant=...)`.
These tests lock both halves in: env pollution is inert, explicit
variants act."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obmd_tpu import scenes
from obmd_tpu.cells import BIG
from obmd_tpu.forces.pallas_dpd import make_pair_kernel
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.integrate import setup


def _scene():
    sc = scenes.obmd_dpd_scene(scale=0.5, seed=19, n_max=8192)
    state = setup(sc.cfg, sc.state)
    geom = ec.make_geometry(sc.cfg)
    return sc.cfg, geom, state


def _pack(geom, state):
    nb, cap, lanes = geom.n_blocks, geom.cap, geom.lanes
    a3 = state.alive[:, None]
    xm = jnp.where(a3, state.x, BIG).astype(jnp.float32)
    fld = jnp.concatenate([xm, state.v.astype(jnp.float32)], axis=1)
    fld = fld.reshape(nb, cap, lanes, 6).transpose(0, 3, 1, 2)
    tag = state.tag.reshape(nb, cap, lanes)
    rank = jnp.arange(cap, dtype=jnp.int32)[None, :, None]
    occ = jnp.max(jnp.where(state.alive.reshape(nb, cap, lanes), rank, -1),
                  axis=(1, 2)) + 1
    return fld, tag, occ


def _forces(geom, cfg, state, **kw):
    kern = make_pair_kernel(geom, params=cfg.pair, dt=cfg.dt, **kw)
    fld, tag, occ = _pack(geom, state)
    return np.asarray(kern(fld, tag, jnp.uint32(55), occ, None))


def test_env_pollution_cannot_change_forces(monkeypatch):
    """A polluted environment must have ZERO effect on kernel physics."""
    cfg, geom, state = _scene()
    f_clean = _forces(geom, cfg, state)
    monkeypatch.setenv("OBMD_AB_NOISE", "off")
    monkeypatch.setenv("OBMD_AB_MI", "off")
    monkeypatch.setenv("OBMD_AB_HASH", "lite")
    f_dirty = _forces(geom, cfg, state)
    assert np.array_equal(f_clean, f_dirty)


def test_no_env_reads_in_kernel_module():
    """Static check: the kernel module performs no environment reads at
    all (the round-4 knobs were module-level `os.environ` lookups)."""
    import obmd_tpu.forces.pallas_dpd as mod
    src = open(mod.__file__).read()
    assert "os.environ" not in src and "getenv" not in src


def test_variant_noise_off_equals_sigma_zero():
    """Explicit variant={'noise': 'off'} is exactly the sigma=0 kernel —
    the knob removes ONLY the random-force term."""
    import dataclasses
    cfg, geom, state = _scene()
    f_off = _forces(geom, cfg, state, variant={"noise": "off"})
    # sigma = sqrt(2 T gamma) is derived: temp=0 zeroes exactly the noise
    p0 = dataclasses.replace(cfg.pair, temp=0.0)
    cfg0 = dataclasses.replace(cfg, pair=p0)
    f_sig0 = _forces(geom, cfg0, state)
    assert np.array_equal(f_off, f_sig0)
    # ... and it actually differs from the production kernel
    f_prod = _forces(geom, cfg, state)
    assert np.abs(f_prod - f_off).max() > 1e-3


def test_variant_mi_off_changes_periodic_forces():
    """mi=off drops the per-pair y/z min-image rounds.  They only act on
    atoms that crossed a periodic face mid-epoch (at a fresh layout the
    roll-wrap deltas are already exact), so push some face-huggers across
    y=0 WITHOUT a relayout first."""
    cfg, geom, state = _scene()
    xs = jnp.asarray(state.x)
    face = state.alive & (xs[:, 1] < 0.06)
    assert int(jnp.sum(face)) >= 5
    xs = jnp.where(face[:, None], xs.at[:, 1].add(-0.12), xs)
    state = state.replace(x=cfg.box.wrap(xs))
    f_prod = _forces(geom, cfg, state)
    f_nomi = _forces(geom, cfg, state, variant={"mi": "off"})
    assert np.abs(f_prod - f_nomi).max() > 1e-4


def test_variant_hash_full_changes_noise_only_statistically():
    """hash=full (the old 3-round construction, kept for A/B) alters the
    noise stream (different draws) but not the conservative/drag terms:
    with noise off, full == baseline.  (Round 5 made the multiplicative
    mix + 1-round finalizer THE production hash, bitwise-matching
    rng.pair_noise.)"""
    cfg, geom, state = _scene()
    f_full = _forces(geom, cfg, state, variant={"hash": "full"})
    f_prod = _forces(geom, cfg, state)
    assert np.abs(f_full - f_prod).max() > 1e-4
    f_a = _forces(geom, cfg, state, variant={"noise": "off"})
    f_b = _forces(geom, cfg, state,
                  variant={"noise": "off", "hash": "full"})
    assert np.array_equal(f_a, f_b)


def test_unknown_variant_key_raises():
    cfg, geom, state = _scene()
    with pytest.raises(ValueError, match="unknown A/B variant"):
        make_pair_kernel(geom, params=cfg.pair, dt=cfg.dt,
                         variant={"typo": "on"})
