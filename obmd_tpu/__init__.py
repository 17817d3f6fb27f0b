"""obmd_tpu — TPU-native open-boundary molecular dynamics.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
OBMD-LAMMPS-extension reference (LAMMPS fork with `fix obmd`,
`pair lj/cut/rf`, DPD workloads): open x-boundaries with buffer regions,
deletion with momentum accounting, feedback-law particle insertion
(near/USHER), and imposed boundary conditions distributed over buffer
particles — fused into a single jit-compiled velocity-Verlet step over a
fixed-capacity masked SoA state.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: the engine compiles a handful of large
# programs (sort-based binning, 27-offset sweeps); caching them across
# processes cuts cold-start from minutes to seconds.
try:  # pragma: no cover
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ.get("OBMD_TPU_COMPCACHE",
                                       _os.path.expanduser("~/.cache/obmd_tpu_xla")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from .config import (Capacity, DPDParams, LJCutParams, LJCutRFParams,
                     ObmdParams, SceneConfig, UsherParams)
from .geometry import Box, RegionBlock
from .integrate import make_run, make_step, run_loop, setup
from .state import (State, init_state, kinetic_energy, momentum, temperature)

__version__ = "0.1.0"

__all__ = [
    "Box", "RegionBlock", "Capacity", "DPDParams", "LJCutParams",
    "LJCutRFParams", "ObmdParams", "SceneConfig", "UsherParams", "State",
    "init_state", "temperature", "kinetic_energy", "momentum",
    "make_step", "make_run", "run_loop", "setup",
]
