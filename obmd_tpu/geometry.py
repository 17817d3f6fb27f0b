"""Box geometry, periodic wrapping, minimum image, and axis-aligned regions.

TPU-native counterpart of the reference's Domain/Region layer
(reference: code/src/domain.cpp:529 `pbc()`, :980 `minimum_image()`;
code/src/region_block.cpp:289 `inside()`).

The OBMD workloads are non-periodic in x (`boundary f p p`) and periodic in
y,z; `Box.periodic` records per-axis periodicity so the same functions serve
fully periodic closed-box tests as well.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Box:
    """Orthogonal simulation box.

    lo/hi: python floats (static — they shape the cell grid at trace time).
    periodic: per-axis periodicity flags; OBMD uses (False, True, True).
    """

    lo: Tuple[float, float, float]
    hi: Tuple[float, float, float]
    periodic: Tuple[bool, bool, bool] = (False, True, True)

    @property
    def lengths(self) -> Tuple[float, float, float]:
        return tuple(h - l for l, h in zip(self.lo, self.hi))

    @property
    def volume(self) -> float:
        lx, ly, lz = self.lengths
        return lx * ly * lz

    @property
    def cross_area(self) -> float:
        """Area of the x-normal face (Ly*Lz) — the buffer/ROI interface area
        used in the boundary-force law (fix_obmd_merged.cpp:609)."""
        _, ly, lz = self.lengths
        return ly * lz

    def wrap(self, x: jnp.ndarray) -> jnp.ndarray:
        """Wrap positions into the box along periodic axes only.

        Counterpart of Domain::pbc (domain.cpp:529) which, with boundary
        `f p p`, remaps y,z and leaves x untouched.
        x: [..., 3].
        """
        lo = jnp.asarray(self.lo, dtype=x.dtype)
        length = jnp.asarray(self.lengths, dtype=x.dtype)
        per = jnp.asarray(self.periodic)
        wrapped = lo + jnp.mod(x - lo, length)
        return jnp.where(per, wrapped, x)

    def min_image(self, d: jnp.ndarray) -> jnp.ndarray:
        """Minimum-image convention on displacement vectors [..., 3].

        Counterpart of Domain::minimum_image (domain.cpp:980); only periodic
        axes are folded.
        """
        length = jnp.asarray(self.lengths, dtype=d.dtype)
        per = jnp.asarray(self.periodic)
        folded = d - length * jnp.round(d / length)
        return jnp.where(per, folded, d)


@dataclasses.dataclass(frozen=True)
class RegionBlock:
    """Axis-aligned block region with inclusive bounds.

    Counterpart of RegBlock::inside (region_block.cpp:289-293):
    a point matches iff lo <= p <= hi on every axis.  Degenerate (zero or
    negative extent) blocks match nothing unless lo == hi exactly on all axes
    and the point sits on that plane — mirroring the reference, where the
    example's zero-extent shear regions match (0,0,0) only; any physical atom
    effectively never matches.
    """

    lo: Tuple[float, float, float]
    hi: Tuple[float, float, float]

    def match(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [..., 3] -> bool[...]. Inclusive on all faces."""
        lo = jnp.asarray(self.lo, dtype=x.dtype)
        hi = jnp.asarray(self.hi, dtype=x.dtype)
        return jnp.all((x >= lo) & (x <= hi), axis=-1)

    @property
    def extent(self) -> Tuple[float, float, float]:
        return tuple(h - l for l, h in zip(self.lo, self.hi))

    @property
    def volume(self) -> float:
        ex = self.extent
        return max(ex[0], 0.0) * max(ex[1], 0.0) * max(ex[2], 0.0)

    def sample_uniform(self, key_bits: jnp.ndarray) -> jnp.ndarray:
        """Map uniform [0,1) triples [..., 3] into the block."""
        lo = jnp.asarray(self.lo, dtype=key_bits.dtype)
        hi = jnp.asarray(self.hi, dtype=key_bits.dtype)
        return lo + key_bits * (hi - lo)


@dataclasses.dataclass(frozen=True)
class RegionSphere:
    """`region ID sphere x y z R` (region_sphere.cpp::inside — a point
    matches iff its distance from the center is <= R, inclusive like every
    LAMMPS region).  Used for group/census membership and create_atoms
    fills; fix obmd's six regions remain blocks by construction."""

    center: Tuple[float, float, float]
    radius: float

    def match(self, x):
        c = jnp.asarray(self.center, dtype=x.dtype)
        d = x - c
        return jnp.sum(d * d, axis=-1) <= jnp.asarray(
            self.radius * self.radius, dtype=x.dtype)

    @property
    def lo(self) -> Tuple[float, float, float]:
        return tuple(c - self.radius for c in self.center)

    @property
    def hi(self) -> Tuple[float, float, float]:
        return tuple(c + self.radius for c in self.center)

    @property
    def volume(self) -> float:
        return 4.0 / 3.0 * np.pi * self.radius ** 3


@dataclasses.dataclass(frozen=True)
class RegionCylinder:
    """`region ID cylinder dim c1 c2 radius lo hi`
    (region_cylinder.cpp::inside): axis-aligned cylinder along `axis`
    ('x'|'y'|'z'); (c1, c2) are the center coordinates in the other two
    dimensions IN x,y,z ORDER with the axis removed, exactly the LAMMPS
    argument convention.  Inclusive bounds."""

    axis: str
    c1: float
    c2: float
    radius: float
    lo_axis: float
    hi_axis: float

    def __post_init__(self):
        if self.axis not in ("x", "y", "z"):
            raise ValueError("cylinder axis must be x, y or z")

    def _dims(self):
        ax = "xyz".index(self.axis)
        other = [d for d in range(3) if d != ax]
        return ax, other

    def match(self, x):
        ax, (d1, d2) = self._dims()
        e1 = x[..., d1] - jnp.asarray(self.c1, x.dtype)
        e2 = x[..., d2] - jnp.asarray(self.c2, x.dtype)
        in_r = e1 * e1 + e2 * e2 <= jnp.asarray(
            self.radius * self.radius, x.dtype)
        a = x[..., ax]
        return in_r & (a >= jnp.asarray(self.lo_axis, x.dtype)) \
            & (a <= jnp.asarray(self.hi_axis, x.dtype))

    @property
    def lo(self) -> Tuple[float, float, float]:
        ax, (d1, d2) = self._dims()
        out = [0.0, 0.0, 0.0]
        out[ax] = self.lo_axis
        out[d1] = self.c1 - self.radius
        out[d2] = self.c2 - self.radius
        return tuple(out)

    @property
    def hi(self) -> Tuple[float, float, float]:
        ax, (d1, d2) = self._dims()
        out = [0.0, 0.0, 0.0]
        out[ax] = self.hi_axis
        out[d1] = self.c1 + self.radius
        out[d2] = self.c2 + self.radius
        return tuple(out)

    @property
    def volume(self) -> float:
        return np.pi * self.radius ** 2 * max(self.hi_axis - self.lo_axis,
                                              0.0)


def box_from_array(lo, hi, periodic=(False, True, True)) -> Box:
    return Box(tuple(float(v) for v in np.asarray(lo)),
               tuple(float(v) for v in np.asarray(hi)),
               tuple(bool(p) for p in periodic))
