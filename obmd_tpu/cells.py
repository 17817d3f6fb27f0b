"""Cell-grid neighbor structure (the TPU replacement for LAMMPS binning +
Verlet lists, reference: nbin_standard.cpp:82,221 + npair_* styles).

Instead of ragged per-atom neighbor lists, atoms are binned into a dense
[n_cells, capacity] table of slot indices (sentinel-padded).  Pair kernels
iterate cells x 27-stencil x capacity^2 with masks — fully static shapes,
no scatter-adds in the inner loop (full-neighbor evaluation, both halves of
every pair computed; Newton's third law holds because the pair noise and
forces are symmetric functions of the unordered pair).

The grid is rebuilt every step (the reference's OBMD example also
reneighbors every step: `neigh_modify delay 0 every 1` + fix obmd nfreq=1,
SURVEY.md §3.2), so cells are sized by the bare cutoff, no skin.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from .geometry import Box

# Sentinel coordinate for empty slots: large-but-finite so padded-vs-real
# displacements stay finite (no NaN through where-masks).
BIG = 1.0e8


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static cell-grid geometry derived from (box, cutoff). Hashable."""

    dims: Tuple[int, int, int]          # cells per axis
    cell_size: Tuple[float, float, float]
    lo: Tuple[float, float, float]
    periodic: Tuple[bool, bool, bool]
    capacity: int

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.dims
        return nx * ny * nz

    @staticmethod
    def create(box: Box, cutoff: float, capacity: int) -> "GridSpec":
        dims = []
        csize = []
        for L, per in zip(box.lengths, box.periodic):
            n = max(1, int(np.floor(L / cutoff)))
            # A periodic axis spanned by <3 cells aliases the -1/+1 stencil
            # neighbors under mod; both stencil builders (stencil_neighbors,
            # gathered._axis_offsets) deduplicate, so n=2 is kept — collapsing
            # to 1 cell would concentrate atoms and overflow cell capacity
            # (dropped atoms break nlist row symmetry; tests/test_conservation).
            dims.append(n)
            csize.append(L / n)
        return GridSpec(dims=tuple(dims), cell_size=tuple(csize),
                        lo=box.lo, periodic=box.periodic, capacity=capacity)

    def stencil_neighbors(self) -> np.ndarray:
        """[n_offsets, n_cells] int32: linear cell id of each stencil neighbor
        of each cell; `n_cells` marks an invalid neighbor (outside a
        non-periodic axis).  Computed in numpy at trace time — a compile-time
        constant.  Duplicate neighbor cells (from tiny periodic axes) are
        deduplicated to avoid double counting pairs.
        """
        nx, ny, nz = self.dims
        n_cells = self.n_cells
        cx, cy, cz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                                 indexing="ij")
        cx, cy, cz = cx.ravel(), cy.ravel(), cz.ravel()

        offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                for dz in (-1, 0, 1)]
        out = np.empty((len(offs), n_cells), dtype=np.int32)
        for k, (dx, dy, dz) in enumerate(offs):
            ids = []
            for d, c, n, per in ((dx, cx, nx, self.periodic[0]),
                                 (dy, cy, ny, self.periodic[1]),
                                 (dz, cz, nz, self.periodic[2])):
                nc = c + d
                if per:
                    nc = nc % n
                ids.append(nc)
            ix, iy, iz = ids
            lin = (ix * ny + iy) * nz + iz
            invalid = np.zeros(n_cells, dtype=bool)
            for d, i, n, per in ((dx, ix, nx, self.periodic[0]),
                                 (dy, iy, ny, self.periodic[1]),
                                 (dz, iz, nz, self.periodic[2])):
                if not per:
                    invalid |= (i < 0) | (i >= n)
            out[k] = np.where(invalid, n_cells, lin)
        # Deduplicate: if two offsets map a cell to the same neighbor cell
        # (happens when a periodic axis has 1 cell), keep only one copy.
        # The central offset (index 13, (0,0,0)) must be the survivor because
        # the pair sweep applies its self-pair mask to that offset only.
        order = [13] + [k for k in range(len(offs)) if k != 13]
        for pos, k in enumerate(order):
            for kk in order[:pos]:
                dup = (out[k] == out[kk]) & (out[k] != n_cells)
                out[k] = np.where(dup, n_cells, out[k])
        return out

    def cell_of(self, x: jnp.ndarray) -> jnp.ndarray:
        """Linear cell id for positions [..., 3]; clipped into the grid (atoms
        that drifted past a free boundary land in the edge cell — they are
        deleted by the OBMD stage before/at the next force evaluation)."""
        lo = jnp.asarray(self.lo, dtype=x.dtype)
        cs = jnp.asarray(self.cell_size, dtype=x.dtype)
        dims = jnp.asarray(self.dims, dtype=jnp.int32)
        c = jnp.floor((x - lo) / cs).astype(jnp.int32)
        c = jnp.clip(c, 0, dims - 1)
        nx, ny, nz = self.dims
        return (c[..., 0] * ny + c[..., 1]) * nz + c[..., 2]


@struct.dataclass
class CellTable:
    """Binned atom slots.  table[c, s] in [0, N]: slot index of the s-th atom
    of cell c, or N (sentinel) if empty.  overflow counts atoms that did not
    fit their cell (diagnostic — raise capacity if nonzero)."""

    table: jnp.ndarray      # [n_cells + 1, capacity] i32 (last row = trash)
    overflow: jnp.ndarray   # i32 scalar


def build_cells(spec: GridSpec, x: jnp.ndarray, alive: jnp.ndarray) -> CellTable:
    """Bin atoms by position.  Dead atoms go to the trash row.

    Counterpart of NBinStandard::bin_atoms (nbin_standard.cpp:221), built as
    sort + rank-in-cell + scatter so every shape is static.
    """
    n = x.shape[0]
    n_cells = spec.n_cells
    cap = spec.capacity

    cell = jnp.where(alive, spec.cell_of(x), n_cells)            # [N]
    order = jnp.argsort(cell, stable=True)                        # [N]
    sorted_cell = cell[order]
    start = jnp.searchsorted(sorted_cell, sorted_cell, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - start.astype(jnp.int32)

    in_grid = sorted_cell < n_cells
    fits = rank < cap
    overflow = jnp.sum((in_grid & ~fits).astype(jnp.int32))

    # Scatter slot indices into the padded table; everything that does not
    # fit goes to the trash row (row n_cells).
    dest_cell = jnp.where(in_grid & fits, sorted_cell, n_cells)
    dest_rank = jnp.where(in_grid & fits, rank, cap - 1)
    flat = dest_cell * cap + dest_rank
    table = jnp.full(((n_cells + 1) * cap,), n, dtype=jnp.int32)
    table = table.at[flat].set(order.astype(jnp.int32), mode="drop")
    # The trash row must stay all-sentinel (dead atoms were scattered there).
    table = table.reshape(n_cells + 1, cap)
    table = table.at[n_cells].set(jnp.full((cap,), n, dtype=jnp.int32))
    return CellTable(table=table, overflow=overflow)


def gather_padded(arr: jnp.ndarray, idx: jnp.ndarray, fill) -> jnp.ndarray:
    """Gather rows of `arr` [N, ...] at `idx` (values in [0, N]; N = sentinel
    -> `fill`)."""
    pad = jnp.full((1,) + arr.shape[1:], fill, dtype=arr.dtype)
    return jnp.concatenate([arr, pad], axis=0)[idx]
