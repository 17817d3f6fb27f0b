"""Equal-style-variable analogues: callable boundary-law parameters traced
into the jitted step (ref fix_obmd_merged.cpp:563-572 re-evaluation)."""
import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu.integrate import make_grid_spec
from obmd_tpu.obmd import stage
from obmd_tpu.state import init_state
from tests.test_obmd_stage import _cfg

import dataclasses


def test_callable_pxx_wave():
    """pxx as a callable of sim time — the Couette/sound-wave config path
    (BASELINE.json configs 2-3)."""
    def pxx_fn(t):
        return 4.0 + 2.0 * jnp.sin(20.0 * t)

    cfg = _cfg(pxx=pxx_fn, nbuf=0.0)
    st = init_state(cfg, np.asarray([[5.0, 1.0, 1.0]]))
    spec = make_grid_spec(cfg)
    pre = jax.jit(lambda s: stage.pre_exchange(cfg, spec, s))
    st1 = pre(st)
    # factor uses t+dt for the wave but pxx itself is evaluated at t
    area = 16.0
    expect1 = (4.0 + 2.0 * np.sin(20.0 * 0.0)) * area
    np.testing.assert_allclose(float(st1.obmd.momentum_force_left[0]),
                               expect1, rtol=1e-5)
    # advance a few steps: the value must track sim_time
    st2 = pre(pre(st1))
    t = float(st1.sim_time) + float(st1.sim_time)  # 2 more calls, dt each
    expect3 = (4.0 + 2.0 * np.sin(20.0 * 3 * 0.01)) * area
    # evaluated at the *pre-advance* time of the 3rd call = 2*dt
    expect3 = (4.0 + 2.0 * np.sin(20.0 * 2 * 0.01)) * area
    np.testing.assert_allclose(float(st2.obmd.momentum_force_left[0]),
                               expect3, rtol=1e-4)


def test_callable_alpha_tau():
    calls = dict(n=0)

    def alpha_fn(t):
        return 0.5 + 0.0 * t

    cfg = _cfg(nbuf=4.0)
    cfg = dataclasses.replace(
        cfg, obmd=dataclasses.replace(cfg.obmd, alpha=alpha_fn))
    st = init_state(cfg, np.asarray([[5.0, 2.0, 2.0]]))
    spec = make_grid_spec(cfg)
    st2 = jax.jit(lambda s: stage.pre_exchange(cfg, spec, s))(st)
    # alpha=0.5, nbuf=4 -> 2 insertions per buffer as in the static test
    assert int(st2.obmd.ninserted) == 4
