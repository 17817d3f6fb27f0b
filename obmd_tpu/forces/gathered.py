"""Per-atom neighbor-gather force path.

Computes forces for a *subset* of atoms against the full system through the
cell table: for each target atom, gather its 27 surrounding cells and apply
the pair law.  This is the force path for the multi-chip atom-decomposition
step (each device computes forces only for the atoms it owns, from
replicated gathered state) — the TPU-native analogue of the reference's
owned-atom force evaluation + reverse_comm (comm_brick.cpp:598), except no
reverse pass is needed because every device evaluates both sides of its own
atoms' pairs.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..cells import BIG, CellTable, GridSpec, gather_padded
from ..config import LJCutRFParams, PairParams
from ..geometry import Box
from .pairs import make_pair_law


def _axis_offsets(n: int, periodic: bool):
    """Unique stencil offsets along one axis.  A periodic axis spanned by
    n<3 cells would alias -1/+1 (or even 0) to the same cell under mod —
    visiting it multiple times and double-counting every pair (the nlist
    rows then overflow and top_k truncates *asymmetrically*, breaking
    sum(f)=0; see tests/test_conservation.py).  Deduplicate at trace time;
    non-periodic axes are range-masked instead, no aliasing."""
    if periodic and n == 1:
        return (0,)
    if periodic and n == 2:
        return (0, 1)
    return (-1, 0, 1)


def neighbor_slots(spec: GridSpec, ctab: CellTable, pos: jnp.ndarray):
    """[K, S*cap] global slot indices of all atoms in the (up to 27)
    distinct stencil cells around each position (sentinel N for empty)."""
    dims = spec.dims
    n_cells = spec.n_cells
    dtype = pos.dtype
    lo = jnp.asarray(spec.lo, dtype=dtype)
    cs = jnp.asarray(spec.cell_size, dtype=dtype)
    nd = jnp.asarray(dims, dtype=jnp.int32)
    cc = jnp.clip(jnp.floor((pos - lo) / cs).astype(jnp.int32), 0, nd - 1)
    offs = jnp.asarray([(a, b, c)
                        for a in _axis_offsets(dims[0], spec.periodic[0])
                        for b in _axis_offsets(dims[1], spec.periodic[1])
                        for c in _axis_offsets(dims[2], spec.periodic[2])],
                       dtype=jnp.int32)
    nb = cc[:, None, :] + offs[None, :, :]
    per = jnp.asarray(spec.periodic)
    ok = jnp.all(jnp.where(per, True, (nb >= 0) & (nb < nd)), axis=-1)
    nb = jnp.where(per, jnp.mod(nb, nd), nb)
    lin = (nb[..., 0] * dims[1] + nb[..., 1]) * dims[2] + nb[..., 2]
    lin = jnp.where(ok, lin, n_cells)
    return ctab.table[lin].reshape(pos.shape[0], -1)


def forces_for_subset(params: PairParams, box: Box, spec: GridSpec,
                      ctab: CellTable, full_x, full_v, full_type, full_tag,
                      full_q, my_slot, my_x, my_v, my_type, my_tag, my_q,
                      salt, *, dt: float, my_pb=None, bond=None,
                      sig_scale=None):
    """Forces on `my` atoms [K] (their global slot ids given in `my_slot`)
    against the full system.  Self-pairs excluded by slot identity.

    my_pb [K, P]: partner TAGS of my atoms (-1 = none; P = 2 for chains,
    4 for branched topologies).  A neighbor whose tag matches a partner
    tag is a 1-2 pair: it is excluded from the pair law and, when `bond`
    is given, contributes the bond force instead — the special_bonds +
    bond-style evaluation fused into the sweep (the slab path's bond
    mechanism: partners are found positionally among owned + halo atoms,
    so bonds crossing slab faces need no slot refs).

    sig_scale: optional per-step noise-amplitude scale (dpd/tstat
    temperature ramp, pair_dpd_tstat.cpp:52-60)."""
    dtype = full_x.dtype
    n_full = full_x.shape[0]
    pair_fn = make_pair_law(params, dt, dtype)
    charged = isinstance(params, LJCutRFParams)

    jdx = neighbor_slots(spec, ctab, my_x)           # [K, M]
    if jnp.dtype(dtype) == jnp.float32:
        # packed 32B-row gather; int columns exponent-biased so the f32
        # view is never denormal (TPU flushes denormals in transit — see
        # forces/nlist.py)
        bias = jnp.int32(0x40000000)
        meta = (full_type.astype(jnp.int32) ^ bias).view(dtype)
        packed = jnp.concatenate(
            [full_x, full_v, (full_tag ^ bias).view(dtype)[:, None],
             meta[:, None]],
            axis=1)
        g = gather_padded(packed, jdx, 0.0)
        xj = jnp.where((jdx < n_full)[..., None], g[..., 0:3], BIG)
        vj = g[..., 3:6]
        gj = g[..., 6].view(jnp.int32) ^ bias
        tj = g[..., 7].view(jnp.int32) ^ bias
    else:
        xj = gather_padded(full_x, jdx, BIG)
        vj = gather_padded(full_v, jdx, 0.0)
        tj = gather_padded(full_type, jdx, 0)
        gj = gather_padded(full_tag, jdx, -1)

    d = box.min_image(my_x[:, None, :] - xj)
    dv = my_v[:, None, :] - vj
    rsq = jnp.sum(d * d, axis=-1)
    valid = (xj[..., 0] < BIG * 0.5) & (jdx != my_slot[:, None])

    kwargs = {}
    if charged:
        qj = gather_padded(full_q, jdx, 0.0)
        kwargs = dict(qi=my_q[:, None], qj=qj)
    if sig_scale is not None:
        kwargs["sig_scale"] = sig_scale
    from .pairs import apply_pair_law
    if my_pb is not None:
        isb = jnp.zeros_like(valid)
        for c in range(my_pb.shape[1]):
            isb = isb | (gj == my_pb[:, c:c + 1])
        isb = valid & isb
        valid_pair = valid & ~isb
    else:
        isb = None
        valid_pair = valid
    fvec, e = apply_pair_law(params, pair_fn, rsq, d, dv, my_type[:, None],
                             tj, my_tag[:, None], gj, salt, **kwargs)
    fvec = jnp.where(valid_pair[..., None], fvec, 0.0)
    f = jnp.sum(fvec, axis=1)
    pe = 0.5 * jnp.sum(jnp.where(valid_pair, e, 0.0), axis=1)
    if isb is not None and bond is not None:
        from .bonded import bond_pair_fvec
        fb = bond_pair_fvec(bond, rsq, d)
        f = f + jnp.sum(jnp.where(isb[..., None], fb, 0.0), axis=1)
    return f, pe
