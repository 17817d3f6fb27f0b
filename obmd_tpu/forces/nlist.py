"""[N, K] Verlet-list force evaluation — the hot force path.

Perfect TPU layout: every per-pair quantity lives in [N, K] arrays (K padded
to the lane width by construction), the only irregular op is the neighbor
gather, and there is no scatter in the inner loop (full list: both halves of
each pair computed; Newton holds through pair-symmetric noise).

Counterpart of PairDPD::compute over a half list + reverse_comm in the
reference (pair_dpd.cpp:66-163, comm_brick.cpp:598), with the list-cutoff /
force-cutoff split of the standard Verlet-list scheme.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..cells import BIG, gather_padded
from ..config import LJCutRFParams, PairParams
from ..geometry import Box
from .pairs import PairFields, make_pair_law


def nlist_sweep(params: PairParams, box: Box, nlist, x, v, types, tag, q,
                alive, salt, *, dt: float,
                bond1=None, bond2=None, more_bonds=(), sig_scale=None,
                compute_energy: bool = False,
                compute_virial: bool = False,
                compute_virial_atom: bool = False) -> PairFields:
    """Force (and optional energy/virial) from an [N, K] neighbor list.

    Dead neighbors (deleted since list build) are masked via `alive`;
    pairs beyond the *force* cutoff are masked by the pair law itself.
    """
    dtype = x.dtype
    n = x.shape[0]
    pair_fn = make_pair_law(params, dt, dtype)
    charged = isinstance(params, LJCutRFParams)

    idx = nlist                                         # [N, K]
    if jnp.dtype(dtype) == jnp.float32:
        # One packed-row gather instead of five scalar-gathers: TPU gathers
        # pay per index, so fetching a contiguous 32-byte row per neighbor
        # beats gathering each field separately.  Row layout:
        # [x, y, z, vx, vy, vz, tag(bitcast), meta(type|alive<<30, bitcast)].
        # Int bit patterns are XORed with 0x40000000 before the f32 view:
        # small ints view as DENORMAL floats and the TPU flushes denormals
        # to zero in transit — gathered tags silently became 0, which
        # killed the pair-noise hash (thermostat froze, T -> 0).
        # alive rides in bit 29 (bit 30 is the bias bit, which must stay
        # untouched by the payload so the XOR always yields a normal f32)
        bias = jnp.int32(0x40000000)
        meta = ((types.astype(jnp.int32)
                 | (alive.astype(jnp.int32) << 29)) ^ bias).view(dtype)
        tagb = (tag ^ bias).view(dtype)
        packed = jnp.concatenate(
            [x, v, tagb[:, None], meta[:, None]], axis=1)
        g = gather_padded(packed, idx, 0.0)             # [N, K, 8]
        xj = jnp.where((idx < n)[..., None], g[..., 0:3], BIG)
        vj = g[..., 3:6]
        gj = g[..., 6].view(jnp.int32) ^ bias
        metaj = g[..., 7].view(jnp.int32) ^ bias
        tj = metaj & 0xFFFF
        aj = ((metaj >> 29) & 1) > 0
    else:
        xj = gather_padded(x, idx, BIG)
        vj = gather_padded(v, idx, 0.0)
        tj = gather_padded(types, idx, 0)
        gj = gather_padded(tag, idx, -1)
        aj = gather_padded(alive, idx, False)

    d = box.min_image(x[:, None, :] - xj)               # [N, K, 3]
    dv = v[:, None, :] - vj
    rsq = jnp.sum(d * d, axis=-1)
    valid = aj & alive[:, None] & (idx < n)
    if bond1 is not None:
        # special_bonds fene: 1-2 pairs excluded from the pair style.
        # bond1/bond2 hold partner SLOTS; list entries are slots too, so
        # the comparison needs no tag resolution.
        valid = valid & (idx != bond1[:, None]) & (idx != bond2[:, None])
        for mb in more_bonds:
            valid = valid & (idx != mb[:, None])

    kwargs = {}
    if charged:
        qj = gather_padded(q, idx, 0.0)
        kwargs = dict(qi=q[:, None], qj=qj)
    if sig_scale is not None:
        kwargs["sig_scale"] = sig_scale
    from .pairs import apply_pair_law
    fvec, e = apply_pair_law(params, pair_fn, rsq, d, dv, types[:, None],
                             tj, tag[:, None], gj, salt, **kwargs)
    fvec = jnp.where(valid[..., None], fvec, 0.0)
    f = jnp.sum(fvec, axis=1)

    pe = None
    if compute_energy:
        pe = 0.5 * jnp.sum(jnp.where(valid, e, 0.0), axis=1)
    w = None
    if compute_virial:
        w = 0.5 * jnp.stack([
            jnp.sum(d[..., 0] * fvec[..., 0]),
            jnp.sum(d[..., 1] * fvec[..., 1]),
            jnp.sum(d[..., 2] * fvec[..., 2]),
            jnp.sum(d[..., 0] * fvec[..., 1]),
            jnp.sum(d[..., 0] * fvec[..., 2]),
            jnp.sum(d[..., 1] * fvec[..., 2]),
        ])
    wa = None
    if compute_virial_atom:
        wa = 0.5 * jnp.stack([
            jnp.sum(d[..., 0] * fvec[..., 0], axis=1),
            jnp.sum(d[..., 1] * fvec[..., 1], axis=1),
            jnp.sum(d[..., 2] * fvec[..., 2], axis=1),
            jnp.sum(d[..., 0] * fvec[..., 1], axis=1),
            jnp.sum(d[..., 0] * fvec[..., 2], axis=1),
            jnp.sum(d[..., 1] * fvec[..., 2], axis=1),
        ], axis=-1)
    return PairFields(f=f, pe=pe, virial=w, virial_atom=wa)
