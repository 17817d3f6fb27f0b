"""Binary checkpoint / restart.

Counterpart of write_restart.cpp / read_restart.cpp — but *complete*: unlike
the reference, where fix obmd declares restart_global=1 yet checkpoints
nothing (fix_obmd_merged.h:36-45; SURVEY.md §5), this saves the full engine
state including sim_time (pressure-wave phase), the PRNG key, insertion/
deletion counters, and the boundary-force setpoints, so a restarted run is
statistically seamless.

Format: a single .npz with every State leaf + a pickled SceneConfig.
Callable (equal-style-variable) parameters are pickled by reference to their
module path; lambdas are rejected with a clear error.
"""
from __future__ import annotations

import io
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SceneConfig
from ..state import State


def _flatten(state: State):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_checkpoint(path: str, cfg: SceneConfig, state: State):
    # neighbor structures are derived data — rebuilt on load (setup()/
    # integrate.make_step handle a fresh build), so only physical state is
    # serialized.
    state = state.replace(nbrs=None)
    leaves, _ = _flatten(state)
    try:
        cfg_bytes = pickle.dumps(cfg)
    except Exception as e:  # lambdas in callable params
        raise ValueError(
            "SceneConfig contains unpicklable callable parameters; use "
            "module-level functions for v_-style parameters to checkpoint"
        ) from e
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["cfg"] = np.frombuffer(cfg_bytes, dtype=np.uint8)
    with open(path, "wb") as fh:
        np.savez(fh, **arrays)


def load_checkpoint(path: str, cfg: SceneConfig | None = None):
    """Returns (cfg, state).  Pass cfg to override the stored one (e.g. when
    it contains callables that could not be checkpointed)."""
    with np.load(path) as z:
        stored = pickle.loads(z["cfg"].tobytes())
        cfg = cfg or stored
        n = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    # Rebuild the treedef from a template state of the right capacity.
    from ..state import init_state
    template = init_state(cfg, np.zeros((0, 3)))
    _, treedef = jax.tree_util.tree_flatten(template)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    # Neighbor structures are rebuilt lazily by setup(); resume with
    # integrate.setup(cfg, state) or pass straight to make_step after it.
    return cfg, state
