"""Counter-based, stateless random numbers for the hot force path.

The reference draws DPD thermostat noise from a per-rank Marsaglia RNG
(pair_dpd.cpp:126 `random->gaussian()`, seeded rank-dependently at :207) and
relies on newton-on reverse communication so each pair's deviate is drawn
exactly once.  On TPU we instead derive the deviate *functionally* from
(step, tag_i, tag_j) with an unordered pair key, so:

  * both sides of a pair compute bitwise-identical noise (full-neighbor force
    evaluation needs no reverse_comm / scatter-add), and
  * every kernel is deterministic and replayable — checkpoint/restore cannot
    desync the noise stream (the reference cannot do this; see
    SURVEY.md §5 checkpoint gap).

Noise distribution: Groot & Warren (J. Chem. Phys. 107, 4423 (1997)) note the
DPD random force may use any zero-mean unit-variance deviate; uniform noise
sqrt(3)*(2u-1) gives identical hydrodynamics and thermostat temperature.  We
default to uniform (cheap on the VPU) and provide a Box-Muller gaussian
variant for validation runs. Statistical equivalence is covered by tests.

The pair-noise bit mixer is xxhash-style: odd-constant multiplies diffuse
the two tag streams, one murmur3 finalizer round avalanches (the salt
arrives pre-mixed through step_salt's hash3) — integer ops only, fully
vectorizable, and ~4.5%% of the whole production step cheaper than the
earlier 3-round construction (round 5; the 120k-step golden density/T
gate re-validated the thermostat on the new stream).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def _avalanche(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 fmix32 — full avalanche on uint32."""
    h = h.astype(_U32)
    h = h ^ (h >> 16)
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _U32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def hash2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Combine two uint32 streams into one well-mixed uint32."""
    a = a.astype(_U32)
    b = b.astype(_U32)
    h = _avalanche(a ^ _U32(0x9E3779B9))
    h = _avalanche(h ^ b * _U32(0x85EBCA77))
    return h


def hash3(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    return _avalanche(hash2(a, b) ^ c.astype(_U32) * _U32(0xC2B2AE3D))


def uniform01(bits: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint32 bits -> uniform in [0, 1) with 24-bit mantissa resolution."""
    dtype = jnp.dtype(dtype).type
    return (bits >> 8).astype(dtype) * dtype(1.0 / (1 << 24))


def pair_noise(step_salt: jnp.ndarray, tag_i: jnp.ndarray, tag_j: jnp.ndarray,
               gaussian: bool = False, dtype=jnp.float32) -> jnp.ndarray:
    """Zero-mean unit-variance deviate, symmetric under i<->j exchange.

    step_salt: uint32 scalar (derived from the step counter + global seed).
    tag_i/tag_j: broadcastable int arrays of *global atom ids* (stable across
    any re-sorting of the particle store, so the noise a pair sees does not
    depend on memory layout).
    """
    dtype = jnp.dtype(dtype).type
    lo = jnp.minimum(tag_i, tag_j).astype(_U32)
    hi = jnp.maximum(tag_i, tag_j).astype(_U32)
    # multiplicative mix + ONE avalanche round (xxhash-style): the salt is
    # already a full hash3 product (step_salt), and the odd-constant
    # multiplies diffuse structured tag patterns before the finalizer.
    # Replaced the 3-avalanche hash3 in round 5: bitwise-identical
    # construction in the Pallas kernel (pallas_dpd.py), ~4.5% of the
    # whole production step; noise statistics pinned by
    # tests/test_forces.py::test_dpd_noise_statistics and the 120k-step
    # golden density/T gate (validation/REPORT.md round 5).
    bits = _avalanche((lo * _U32(0x9E3779B9))
                      ^ (hi * _U32(0x85EBCA77))
                      ^ jnp.asarray(step_salt, dtype=_U32))
    if not gaussian:
        return jnp.sqrt(dtype(3.0)) * (dtype(2.0) * uniform01(bits, dtype) - dtype(1.0))
    # Box-Muller from two decorrelated streams (validation path).
    bits2 = _avalanche(bits ^ _U32(0x6C62272E))
    u1 = jnp.maximum(uniform01(bits, dtype), dtype(1e-7))
    u2 = uniform01(bits2, dtype)
    return jnp.sqrt(dtype(-2.0) * jnp.log(u1)) * jnp.cos(dtype(2.0 * 3.14159265358979) * u2)


def step_salt(seed: int | jnp.ndarray, step: jnp.ndarray, purpose: int = 0) -> jnp.ndarray:
    """Per-(seed, step, purpose) uint32 salt for counter-based draws."""
    return hash3(jnp.asarray(seed, dtype=_U32),
                 jnp.asarray(step, dtype=_U32),
                 jnp.asarray(purpose, dtype=_U32))


def fold_key(key: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
    """Fold the step counter into a jax PRNG key (for the cold path:
    insertion candidate draws, initial velocities)."""
    return jax.random.fold_in(key, step.astype(jnp.uint32))
