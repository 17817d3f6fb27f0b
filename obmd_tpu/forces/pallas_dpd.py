"""Pallas DPD force kernel over the padded cell-major layout.

The hot force op of the engine (counterpart of PairDPD::compute,
DPD-BASIC/pair_dpd.cpp:66-163), designed around what the TPU does well:

  * State lives in a padded cell-major layout: slot = (block, rank, lane)
    where a lane is a cell.  A block's 128 lanes span P x-slabs of S = ny*nz
    cells each (P = 128 // S when S divides 128).  Neighbor-cell access then
    never gathers: y/z neighbors are lane *rolls* (two rolls + a static
    select implement the periodic wrap), x neighbors come from the
    prev/mid/next block windows fetched by BlockSpec.
  * Dead/padding slots carry position BIG, so the r < cutoff and r > eps
    masks eliminate them with zero extra bookkeeping.
  * The DPD random force is generated in-kernel from the pair-symmetric
    counter hash (the rng.pair_noise construction, uint32 ops) — Newton's
    third law holds bitwise, no reverse-communication analogue needed.

Handles up to 4 atom types (per-pair a0/gamma/sigma/cut tables indexed by
a packed type code), optional charge (reaction-field term), and gaussian or
uniform pair noise; systems with more types fall back to the XLA paths
(see engine_cellpad.py's kernel-eligibility gate).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32


class PadGeometry(NamedTuple):
    """Static geometry of the padded cell-major layout.

    cap is the STORAGE rank count (tile sublane width); fill_cap <= cap
    is the FILING capacity — the max atoms per cell before overflow.
    They differ only when the requested capacity would give the big-tile
    kernel a (fill_cap * cap) tile that is not a multiple of 8 sublanes
    (f32 tiling): e.g. capacity 15 stores 16 ranks but files 15, so the
    i-side of the big tile runs 15 ranks against a 16-rank j side —
    (240, lanes) tiles, 6.25%% less pair work than a full cap-16 build
    with zero Mosaic padding waste (a (225, lanes) tile measured 6x
    slower).  Rows fill_cap..cap-1 are never filed (dead BIG slots)."""

    dims: Tuple[int, int, int]       # cells per axis (nx, ny, nz)
    cell_size: Tuple[float, float, float]
    lo: Tuple[float, float, float]
    s: int                           # ny*nz (cells per x-slab)
    p: int                           # x-slabs per block
    lanes: int                       # p*s == 128, or s padded up to 128k
    n_blocks: int
    cap: int
    periodic_x: bool = False
    periodic_yz: Tuple[bool, bool] = (True, True)
    fill_cap: int = 0                # 0 -> == cap

    @property
    def fcap(self) -> int:
        return self.fill_cap or self.cap

    @property
    def n_slots(self) -> int:
        return self.n_blocks * self.cap * self.lanes

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.dims
        return nx * ny * nz

    @staticmethod
    def create(box, cutoff: float, cap: int) -> "PadGeometry":
        periodic_x = bool(box.periodic[0])
        dims = []
        csize = []
        for L, per in zip(box.lengths, box.periodic):
            n = max(1, int(np.floor(L / cutoff)))
            if per and n < 3:
                n = 1
            dims.append(n)
            csize.append(L / n)
        nx, ny, nz = dims
        if ny == 2 or nz == 2:
            raise ValueError("periodic axis with exactly 2 cells unsupported")
        if periodic_x and nx < 3:
            raise ValueError("periodic x needs >= 3 cells on the cellpad path")
        s = ny * nz
        if s <= 128 and 128 % s == 0:
            p = 128 // s
            lanes = 128
        else:
            p = 1
            lanes = ((s + 127) // 128) * 128
        if periodic_x:
            # blocks must tile the x axis exactly so block-index wrap is a
            # clean periodic image
            while p > 1 and nx % p != 0:
                p //= 2
            lanes = p * s if p * s == 128 else ((s + 127) // 128) * 128
            if p == 1:
                lanes = ((s + 127) // 128) * 128
        n_blocks = (nx + p - 1) // p
        # storage-rank padding for the big-tile kernel (see class doc):
        # requested cap = filing capacity; pad storage so fill*store is a
        # multiple of 8 sublanes.  Only for big-tile-eligible capacities —
        # larger caps run the rank-looped kernel whose tiles Mosaic pads
        # implicitly anyway.
        fill = cap
        store = cap
        if cap <= 20 and (cap * cap) % 8 != 0:
            while (fill * store) % 8 != 0:
                store += 1
        return PadGeometry(dims=tuple(dims), cell_size=tuple(csize),
                           lo=box.lo, s=s, p=p, lanes=lanes,
                           n_blocks=n_blocks, cap=store,
                           periodic_x=periodic_x,
                           periodic_yz=(bool(box.periodic[1]),
                                        bool(box.periodic[2])),
                           fill_cap=fill)

    def cell_of(self, x):
        """Linear cell id in (block, lane)-compatible order for [...,3]."""
        lo = jnp.asarray(self.lo, dtype=x.dtype)
        cs = jnp.asarray(self.cell_size, dtype=x.dtype)
        nd = jnp.asarray(self.dims, dtype=jnp.int32)
        c = jnp.clip(jnp.floor((x - lo) / cs).astype(jnp.int32), 0, nd - 1)
        nx, ny, nz = self.dims
        return (c[..., 0] * ny + c[..., 1]) * nz + c[..., 2]

    def slot_of_cell(self, cell):
        """(block, lane) of a linear cell id, accounting for lane padding
        when p == 1 and s < lanes."""
        slab = cell // self.s
        within = cell % self.s
        if self.p == 1:
            return slab, within
        block = slab // self.p
        lane = (slab % self.p) * self.s + within
        return block, lane


def _avalanche_u32(h):
    h = h ^ (h >> 16)
    h = h * _U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _U32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def make_pair_kernel(geom: PadGeometry, *, a0: float = 0.0,
                     gamma: float = 0.0, sigma: float = 0.0, cut: float = 1.0,
                     dt: float = 0.01, law: str = "dpd",
                     lj_eps: float = 1.0, lj_sig: float = 1.0,
                     exclude_bonded: bool = False, n_excl: int = 2,
                     params=None, bigtile=None, variant=None):
    """Newton half-stencil pair kernel — each unordered pair computed ONCE
    (the counterpart of the reference's newton-on half list,
    npair_half_bin_newton.cpp + reverse_comm, comm_brick.cpp:598).

    Directed stencil: the self cell with rank-ordered masking (sj > si) plus
    13 directed neighbor offsets (dxs=+1 with the full 3x3 y/z fan; dxs=0
    with dy=+1 fan; dxs=0, dy=0, dz=+1).  Per directed offset the j-side
    reactions are accumulated in a scratch buffer and rolled back once after
    the rank loop (rolls are linear, so the roll-back commutes with the
    accumulation).  Pairs that cross into the next block write their j
    reaction into a second output, which the wrapper shifts by one block and
    adds — the reverse-communication analogue, as pure XLA adds.

    Periodic y/z images are handled by the roll-wrap select itself (the
    wrapped replica gets +-L added to its position lane), so the inner loop
    carries no min-image rounds on axes with >= 3 cells.

    Calling convention:
      fld f32 [nb, NF, cap, lanes] with channels x,y,z,vx,vy,vz[,q][,type]
      (q present for lj/cut/rf, a float type channel for ntypes > 1),
      tag i32 [nb, cap, lanes], salt u32[1], occ i32 [nb],
      optional pbond i32 [nb, n_excl, cap, lanes] -> f [nb, 3, cap, lanes]
      (n_excl = 2 partner-tag exclusion channels for chains, 4 for
      branched topologies).

    When `params` (a config PairParams) is given, the law, per-type-pair
    coefficient tables, charge handling, and channel count derive from it
    (multi-type coefficients are blended in-kernel with one-hot masks over
    the float type channel — tiny T^2 unrolled selects, no gathers).  The
    scalar kwargs remain for the legacy single-type call sites.
    """
    from ..config import (DPDParams, DPDTstatParams, LJCutParams,
                          LJCutRFParams)
    # `variant` is a MEASUREMENT-ONLY knob for the validation/prof_* A/B
    # drivers ({"hash": "lite", "noise": "off", "mi": "off"}).  It is an
    # explicit build argument — never read from the environment — so a
    # polluted shell cannot alter production physics (tests/test_ab_knobs.py
    # locks this in).  Snapshotted into locals here (true build-time read).
    variant = dict(variant or {})
    # round 5: the multiplicative-mix + 1-round hash IS production (it
    # matches rng.pair_noise bitwise); "full" selects the old 3-round
    # construction for A/B profiling
    ab_hash_full = variant.pop("hash", "") == "full"
    ab_noise_off = variant.pop("noise", "") == "off"
    ab_mi_off = variant.pop("mi", "") == "off"
    if variant:
        raise ValueError(f"unknown A/B variant keys: {sorted(variant)}")
    nx, ny, nz = geom.dims
    s, p, lanes, cap = geom.s, geom.p, geom.lanes, geom.cap
    nb = geom.n_blocks
    ly = float(ny * geom.cell_size[1])
    lz = float(nz * geom.cell_size[2])
    lx = float(nx * geom.cell_size[0])
    dtinvsqrt = float(1.0 / np.sqrt(dt))
    eps = 1.0e-10
    sqrt3 = float(np.sqrt(3.0))
    per_x = geom.periodic_x
    mi_y = ny < 3          # single-cell periodic axis: min-image in-loop
    mi_z = nz < 3

    # ---- coefficient plumbing -------------------------------------------
    # Periodic axes need TRUE per-pair min-image: the roll-wrap deltas are
    # exact only for the epoch layout, but atoms that cross a periodic face
    # mid-epoch (position re-wrapped, lane-cell stale) would lose all their
    # pairs until the next relayout — measured as a ~7% hot thermostat on
    # the closed DPD box.  The rounds cost a few % and restore exactness
    # for any drift within the skin budget.
    per_y = bool(geom.periodic_yz[0])
    per_z = bool(geom.periodic_yz[1])

    ntypes = 1
    charged = False
    qq = 1.0
    cut_coul = 0.0
    eps_rf_tab = None
    gaussian_noise = bool(getattr(params, "gaussian_noise", False))
    # dpd/tstat temperature ramp (pair_dpd_tstat.cpp:52-60): the per-step
    # noise-amplitude scale sqrt(T(step)/t_start) enters as a prefetched
    # runtime scalar; constant-T builds compile the multiply away entirely
    from ..config import DPDTstatParams as _Tstat
    ramp = isinstance(params, _Tstat) and params.is_ramp
    if params is not None:
        ntypes = params.ntypes
        if isinstance(params, (DPDParams, DPDTstatParams)):
            law = "dpd"
            a0_tab = (params.a0 if isinstance(params, DPDParams)
                      else tuple((0.0,) * ntypes for _ in range(ntypes)))
            gam_tab, sig_tab = params.gamma, params.sigma
            cut_tab = params.cut
        elif isinstance(params, LJCutRFParams):
            law = "ljrf"
            charged = True
            qq = float(params.qqrd2e)
            cut_coul = float(params.cut_coul)
            eps_tab, sigm_tab = params.epsilon, params.sigma
            cut_tab = params.cut
            eps_rf_tab = params.eps_rf
        elif isinstance(params, LJCutParams):
            law = "lj"
            eps_tab, sigm_tab = params.epsilon, params.sigma
            cut_tab = params.cut
        else:
            raise TypeError(f"pallas kernel: unsupported params {type(params)}")
    else:
        if law == "dpd":
            a0_tab = ((float(a0),),)
            gam_tab = ((float(gamma),),)
            sig_tab = ((float(sigma),),)
        else:
            eps_tab = ((float(lj_eps),),)
            sigm_tab = ((float(lj_sig),),)
        cut_tab = ((float(cut),),)

    multi = ntypes > 1
    NF = 6 + (1 if charged else 0) + (1 if multi else 0)
    CH_Q = 6
    CH_T = 6 + (1 if charged else 0)

    def pair_coef(tab):
        """Per-pair coefficient from the float type channels (T^2 one-hot
        blend; a plain trace-time scalar for single-type)."""
        t = [[float(v) for v in row] for row in np.asarray(tab)]
        if not multi:
            c = float(t[0][0])      # python float: folds into the kernel
            return lambda tif, tjf: c

        def get(tif, tjf):
            acc = None
            for t1 in range(ntypes):
                for t2 in range(ntypes):
                    m = (tif == jnp.float32(t1)) & (tjf == jnp.float32(t2))
                    term = jnp.where(m, jnp.float32(t[t1][t2]),
                                     jnp.float32(0.0))
                    acc = term if acc is None else acc + term
            return acc
        return get

    if law == "dpd":
        c_a0 = pair_coef(a0_tab)
        c_gam = pair_coef(gam_tab)
        c_sig = pair_coef(sig_tab)
    else:
        # LAMMPS lj1/lj2 prefactors per pair
        epsA = np.asarray(eps_tab, dtype=np.float64)
        sigA = np.asarray(sigm_tab, dtype=np.float64)
        s6A = sigA ** 6
        c_lj1 = pair_coef(48.0 * epsA * s6A * s6A)
        c_lj2 = pair_coef(24.0 * epsA * s6A)
        if law == "ljrf":
            erfA = np.asarray(eps_rf_tab, dtype=np.float64)
            c_rf = pair_coef(2.0 * (erfA - 1.0) / (2.0 * erfA + 1.0))
    c_cut = pair_coef(cut_tab)
    max_cut = float(np.max(np.asarray(cut_tab)))
    if charged:
        max_cut = max(max_cut, cut_coul)

    dys = (-1, 0, 1) if ny >= 3 else (0,)
    dzs = (-1, 0, 1) if nz >= 3 else (0,)
    directed = [(1, dy, dz) for dy in dys for dz in dzs]
    if ny >= 3:
        directed += [(0, 1, dz) for dz in dzs]
    if nz >= 3:
        directed += [(0, 0, 1)]

    def kernel(salt_ref, occ_ref, *rest):
        if ramp:
            sig_ref, *rest = rest
            sig_rt = sig_ref[0]
        else:
            sig_rt = None
        mid_f, next_f, mid_t, next_t, *rest = rest
        if exclude_bonded:
            pb_ref, out_ref, out2_ref, acc, acc2, jacc = rest
        else:
            out_ref, out2_ref, acc, acc2, jacc = rest
            pb_ref = None
        i = pl.program_id(0)
        salt = salt_ref[0]
        si_max = occ_ref[i]
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (cap, lanes), 1)
        rank_idx = jax.lax.broadcasted_iota(jnp.int32, (cap, lanes), 0)
        slab_q = lane_idx // s

        acc[...] = jnp.zeros((3, cap, lanes), jnp.float32)
        acc2[...] = jnp.zeros((3, cap, lanes), jnp.float32)

        def nbr(val, dstride: int, group: int, wrap_delta: float = 0.0):
            """out[l] = val[l + dstride] wrapping inside `group`-aligned lane
            groups; wrapped lanes get +-wrap_delta (periodic position
            image)."""
            if dstride == 0:
                return val
            r1 = pltpu.roll(val, (-dstride) % lanes, 1)
            pos = lane_idx % group
            if dstride > 0:
                r2 = pltpu.roll(val, (group - dstride) % lanes, 1)
                wrapped = pos >= group - dstride
            else:
                r2 = pltpu.roll(val, (-dstride - group) % lanes, 1)
                wrapped = pos < -dstride
            if wrap_delta != 0.0:
                r2 = r2 + jnp.float32(wrap_delta)
            return jnp.where(wrapped, r2, r1)

        def pair_math(si, jch, tj, ok):
            """fpair (cap,lanes) and the displacement components for i at
            rank si vs the j view.  jch: the NF j-side channel arrays."""
            xj, yj, zj = jch[0], jch[1], jch[2]
            dx = mid_f[0, 0, si][None, :] - xj
            dyy = mid_f[0, 1, si][None, :] - yj
            dzz = mid_f[0, 2, si][None, :] - zj
            if per_x:
                dx = dx - lx * jnp.round(dx * (1.0 / lx))
            if per_y and not ab_mi_off:
                dyy = dyy - ly * jnp.round(dyy * (1.0 / ly))
            if per_z and not ab_mi_off:
                dzz = dzz - lz * jnp.round(dzz * (1.0 / lz))
            rsq = dx * dx + dyy * dyy + dzz * dzz
            ok = ok & (rsq > eps * eps)
            if exclude_bonded:
                for pch in range(n_excl):
                    ok = ok & (tj != pb_ref[0, pch, si][None, :])
            if multi:
                tif = jnp.broadcast_to(mid_f[0, CH_T, si][None, :],
                                       (cap, lanes))
                tjf = jch[CH_T]
            else:
                tif = tjf = None
            cutp = c_cut(tif, tjf)

            if law in ("lj", "ljrf"):
                in_lj = ok & (rsq < cutp * cutp)
                r2inv = jnp.where(in_lj, 1.0 / jnp.maximum(rsq, eps * eps),
                                  0.0)
                r6inv = r2inv * r2inv * r2inv
                fpair = r6inv * (c_lj1(tif, tjf) * r6inv
                                 - c_lj2(tif, tjf)) * r2inv
                fpair = jnp.where(in_lj, fpair, 0.0)
                if law == "ljrf":
                    # reaction-field Coulomb (pair_lj_cut_rf.cpp:118-131)
                    qi = mid_f[0, CH_Q, si][None, :]
                    qj = jch[CH_Q]
                    in_c = ok & (rsq < jnp.float32(cut_coul * cut_coul))
                    rinv = jax.lax.rsqrt(jnp.maximum(rsq, eps * eps))
                    r2i = rinv * rinv
                    qprod = jnp.float32(qq) * qi * qj
                    fcoul = qprod * (r2i * rinv
                                     - jnp.float32(1.0 / cut_coul ** 3)
                                     * c_rf(tif, tjf))
                    fpair = fpair + jnp.where(in_c, fcoul, 0.0)
            else:
                okc = ok & (rsq < cutp * cutp)
                rinv = jax.lax.rsqrt(jnp.maximum(rsq, eps * eps))
                r = rsq * rinv
                wd = 1.0 - r * (1.0 / cutp)
                dot = (dx * (mid_f[0, 3, si][None, :] - jch[3])
                       + dyy * (mid_f[0, 4, si][None, :] - jch[4])
                       + dzz * (mid_f[0, 5, si][None, :] - jch[5]))
                ti = jnp.broadcast_to(mid_t[0, si][None, :], (cap, lanes))
                lo = pltpu.bitcast(jnp.minimum(ti, tj), _U32)
                hi = pltpu.bitcast(jnp.maximum(ti, tj), _U32)
                if ab_hash_full:
                    h = _avalanche_u32(lo ^ _U32(0x9E3779B9))
                    h = _avalanche_u32(h ^ hi * _U32(0x85EBCA77))
                    h = _avalanche_u32(h ^ salt * _U32(0xC2B2AE3D))
                else:
                    # production: rng.pair_noise's construction, bitwise
                    h = _avalanche_u32((lo * _U32(0x9E3779B9))
                                       ^ (hi * _U32(0x85EBCA77)) ^ salt)
                u24 = pltpu.bitcast(h >> 8, jnp.int32)
                u01 = u24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
                if gaussian_noise:
                    # Box-Muller from two decorrelated hash draws
                    # (pair_dpd.cpp uses RanMars gaussian; the uniform
                    # default is variance-matched but decks asking for
                    # gaussian draws get them bitwise-deterministically)
                    h2 = _avalanche_u32(h ^ _U32(0x7F4A7C15))
                    u2 = (pltpu.bitcast(h2 >> 8, jnp.int32)
                          .astype(jnp.float32)
                          * jnp.float32(1.0 / (1 << 24)))
                    r_bm = jnp.sqrt(-2.0 * jnp.log(
                        jnp.maximum(u01, jnp.float32(1e-12))))
                    noise = r_bm * jnp.cos(
                        jnp.float32(2.0 * np.pi) * u2)
                else:
                    noise = sqrt3 * (2.0 * u01 - 1.0)
                fpair = c_a0(tif, tjf) * wd
                fpair = fpair - c_gam(tif, tjf) * wd * wd * dot * rinv
                if not ab_noise_off:
                    term = c_sig(tif, tjf) * wd * noise * dtinvsqrt
                    if sig_rt is not None:
                        term = term * sig_rt
                    fpair = fpair + term
                fpair = fpair * rinv
                fpair = jnp.where(okc, fpair, 0.0)
            return fpair, dx, dyy, dzz

        # ---- self cell: rank-ordered half (sj > si), both sides in acc ----
        def self_body(si, _):
            ok = rank_idx > si
            fpair, dx, dyy, dzz = pair_math(
                si, [mid_f[0, c] for c in range(NF)], mid_t[0], ok)
            fx, fy, fz = fpair * dx, fpair * dyy, fpair * dzz
            acc[0, si, :] += jnp.sum(fx, axis=0)
            acc[1, si, :] += jnp.sum(fy, axis=0)
            acc[2, si, :] += jnp.sum(fz, axis=0)
            acc[0] -= fx
            acc[1] -= fy
            acc[2] -= fz
            return 0

        jax.lax.fori_loop(0, si_max, self_body, 0)

        # ---- 13 directed neighbor offsets ----
        for dxs, dy, dz in directed:
            # x view: stitched mid/next slab shift (j slab = i slab + dxs)
            if dxs == 0:
                xsrc_f = [mid_f[0, c] for c in range(NF)]
                xsrc_t = mid_t[0]
                cross = None                      # no block crossing
            elif p == 1:
                xadj = (jnp.where(i == nb - 1, jnp.float32(lx),
                                  jnp.float32(0.0)) if per_x else 0.0)
                xsrc_f = [next_f[0, c] + (xadj if c == 0 else 0.0)
                          for c in range(NF)]
                xsrc_t = next_t[0]
                cross = "all"
            else:
                in_mid = slab_q < p - 1
                xadj = (jnp.where(i == nb - 1, jnp.float32(lx),
                                  jnp.float32(0.0)) if per_x else 0.0)

                def stitch(vm, vn, adj=None):
                    vn_r = nbr(vn, -(p - 1) * s, lanes)
                    if adj is not None:
                        vn_r = vn_r + adj
                    return jnp.where(in_mid, nbr(vm, s, lanes), vn_r)
                xsrc_f = [stitch(mid_f[0, c], next_f[0, c],
                                 xadj if (c == 0 and per_x) else None)
                          for c in range(NF)]
                xsrc_t = stitch(mid_t[0], next_t[0])
                cross = "last"                    # slab_q == p-1 lanes cross

            # y/z rolls with periodic image adjustment on the position lanes.
            # On a NON-periodic axis the rolled-around lanes are phantom
            # pairs (there is no image across a free boundary): push their
            # positions far out of any cutoff instead of shifting by +-L.
            big = 4.0 * (lx + ly + lz) + 1.0e3

            def yz(val, fidx):
                if fidx == 1:
                    wy = (ly if not mi_y else 0.0) if per_y else big
                else:
                    wy = 0.0
                if fidx == 2:
                    wz = (lz if not mi_z else 0.0) if per_z else big
                else:
                    wz = 0.0
                v = nbr(val, dy * nz, s, wrap_delta=wy * dy)
                return nbr(v, dz, nz, wrap_delta=wz * dz)

            fields = [yz(xsrc_f[c], c) for c in range(NF)]
            tj = yz(xsrc_t, -1)

            # domain-edge validity along open x
            if per_x or dxs == 0:
                gok = jnp.ones((cap, lanes), bool)
            else:
                gok = (i * p + slab_q + dxs) < nx

            jacc[...] = jnp.zeros((3, cap, lanes), jnp.float32)

            def dir_body(si, _):
                fpair, dx, dyy, dzz = pair_math(si, fields, tj, gok)
                fx, fy, fz = fpair * dx, fpair * dyy, fpair * dzz
                acc[0, si, :] += jnp.sum(fx, axis=0)
                acc[1, si, :] += jnp.sum(fy, axis=0)
                acc[2, si, :] += jnp.sum(fz, axis=0)
                jacc[0] += fx
                jacc[1] += fy
                jacc[2] += fz
                return 0

            jax.lax.fori_loop(0, si_max, dir_body, 0)

            # roll the j reactions back: undo z, undo y, undo x-stitch
            for c in range(3):
                tmp = nbr(nbr(jacc[c], -dz, nz), -dy * nz, s)
                if cross is None:
                    acc[c] -= tmp
                elif cross == "all":
                    acc2[c] -= tmp
                else:
                    in_mid = slab_q < p - 1
                    acc[c] -= nbr(jnp.where(in_mid, tmp, 0.0), -s, lanes)
                    acc2[c] -= nbr(jnp.where(in_mid, 0.0, tmp),
                                   (p - 1) * s, lanes)

        out_ref[0] = acc[...]
        out2_ref[0] = acc2[...]

    # ---- big-tile variant: all (i-rank, j-rank) pairs of a cell column as
    # ONE (IC * cap, lanes) tile per directed offset, IC = filing capacity
    # (i-rows above it are never filed — dead storage padding trimmed from
    # the i side; the j side stays storage-wide, its dead rows are
    # distance-masked).  The fori_loop variant above is bound by
    # per-iteration structure (dynamic acc[c, si] row updates +
    # (cap, lanes) mini-tiles), not by the pair arithmetic — measured:
    # full DPD == conservative-only == 2.1 ms at 94k atoms, while this
    # form runs 1.9 ms and is BITWISE identical (same op order per pair;
    # dead-rank rows contribute exact zeros).  Work scales with IC*cap
    # instead of occ*cap, so the caller gates it to small caps.
    IC = geom.fcap
    C2 = IC * cap

    def kernel_bigtile(salt_ref, occ_ref, *rest):
        if ramp:
            sig_ref, *rest = rest
            sig_rt = sig_ref[0]
        else:
            sig_rt = None
        mid_f, next_f, mid_t, next_t, *rest = rest
        if exclude_bonded:
            pb_ref, out_ref, out2_ref, acc, acc2, jacc = rest
        else:
            out_ref, out2_ref, acc, acc2, jacc = rest
            pb_ref = None
        del jacc                     # big tiles reduce j-reactions directly
        i = pl.program_id(0)
        salt = salt_ref[0]
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (cap, lanes), 1)
        slab_q = lane_idx // s
        row_big = jax.lax.broadcasted_iota(jnp.int32, (C2, lanes), 0)
        si_big = row_big // cap
        sj_big = row_big % cap

        def expand_i(v):            # (cap, lanes) -> (C2, lanes) by si
            return jnp.repeat(v[:IC], cap, axis=0)

        def expand_j(v):            # (cap, lanes) -> (C2, lanes) by sj
            return jnp.reshape(
                jnp.broadcast_to(v[None, :, :], (IC, cap, lanes)),
                (C2, lanes))

        def nbr(val, dstride: int, group: int, wrap_delta: float = 0.0):
            if dstride == 0:
                return val
            r1 = pltpu.roll(val, (-dstride) % lanes, 1)
            pos = lane_idx % group
            if dstride > 0:
                r2 = pltpu.roll(val, (group - dstride) % lanes, 1)
                wrapped = pos >= group - dstride
            else:
                r2 = pltpu.roll(val, (-dstride - group) % lanes, 1)
                wrapped = pos < -dstride
            if wrap_delta != 0.0:
                r2 = r2 + jnp.float32(wrap_delta)
            return jnp.where(wrapped, r2, r1)

        acc[...] = jnp.zeros((3, cap, lanes), jnp.float32)
        acc2[...] = jnp.zeros((3, cap, lanes), jnp.float32)

        xi = [expand_i(mid_f[0, c]) for c in range(NF)]
        ti_tag = expand_i(mid_t[0])
        if exclude_bonded:
            pb_i = [expand_i(pb_ref[0, ch]) for ch in range(n_excl)]

        def pair_tile(jch, tj, ok):
            """fpair (C2, lanes) + displacement — the exact pair_math op
            sequence on expanded tiles (bitwise-identical forces)."""
            dx = xi[0] - jch[0]
            dyy = xi[1] - jch[1]
            dzz = xi[2] - jch[2]
            if per_x:
                dx = dx - lx * jnp.round(dx * (1.0 / lx))
            if per_y and not ab_mi_off:
                dyy = dyy - ly * jnp.round(dyy * (1.0 / ly))
            if per_z and not ab_mi_off:
                dzz = dzz - lz * jnp.round(dzz * (1.0 / lz))
            rsq = dx * dx + dyy * dyy + dzz * dzz
            ok = ok & (rsq > eps * eps)
            if exclude_bonded:
                for ch in range(n_excl):
                    ok = ok & (tj != pb_i[ch])
            if multi:
                tif = xi[CH_T]
                tjf = jch[CH_T]
            else:
                tif = tjf = None
            cutp = c_cut(tif, tjf)

            if law in ("lj", "ljrf"):
                in_lj = ok & (rsq < cutp * cutp)
                r2inv = jnp.where(in_lj, 1.0 / jnp.maximum(rsq, eps * eps),
                                  0.0)
                r6inv = r2inv * r2inv * r2inv
                fpair = r6inv * (c_lj1(tif, tjf) * r6inv
                                 - c_lj2(tif, tjf)) * r2inv
                fpair = jnp.where(in_lj, fpair, 0.0)
                if law == "ljrf":
                    qi = xi[CH_Q]
                    qj = jch[CH_Q]
                    in_c = ok & (rsq < jnp.float32(cut_coul * cut_coul))
                    rinv = jax.lax.rsqrt(jnp.maximum(rsq, eps * eps))
                    r2i = rinv * rinv
                    qprod = jnp.float32(qq) * qi * qj
                    fcoul = qprod * (r2i * rinv
                                     - jnp.float32(1.0 / cut_coul ** 3)
                                     * c_rf(tif, tjf))
                    fpair = fpair + jnp.where(in_c, fcoul, 0.0)
            else:
                okc = ok & (rsq < cutp * cutp)
                rinv = jax.lax.rsqrt(jnp.maximum(rsq, eps * eps))
                r = rsq * rinv
                wd = 1.0 - r * (1.0 / cutp)
                dot = (dx * (xi[3] - jch[3])
                       + dyy * (xi[4] - jch[4])
                       + dzz * (xi[5] - jch[5]))
                lo = pltpu.bitcast(jnp.minimum(ti_tag, tj), _U32)
                hi = pltpu.bitcast(jnp.maximum(ti_tag, tj), _U32)
                if ab_hash_full:
                    h = _avalanche_u32(lo ^ _U32(0x9E3779B9))
                    h = _avalanche_u32(h ^ hi * _U32(0x85EBCA77))
                    h = _avalanche_u32(h ^ salt * _U32(0xC2B2AE3D))
                else:
                    # production: rng.pair_noise's construction, bitwise
                    h = _avalanche_u32((lo * _U32(0x9E3779B9))
                                       ^ (hi * _U32(0x85EBCA77)) ^ salt)
                u24 = pltpu.bitcast(h >> 8, jnp.int32)
                u01 = u24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
                if gaussian_noise:
                    h2 = _avalanche_u32(h ^ _U32(0x7F4A7C15))
                    u2 = (pltpu.bitcast(h2 >> 8, jnp.int32)
                          .astype(jnp.float32)
                          * jnp.float32(1.0 / (1 << 24)))
                    r_bm = jnp.sqrt(-2.0 * jnp.log(
                        jnp.maximum(u01, jnp.float32(1e-12))))
                    noise = r_bm * jnp.cos(
                        jnp.float32(2.0 * np.pi) * u2)
                else:
                    noise = sqrt3 * (2.0 * u01 - 1.0)
                fpair = c_a0(tif, tjf) * wd
                fpair = fpair - c_gam(tif, tjf) * wd * wd * dot * rinv
                if not ab_noise_off:
                    term = c_sig(tif, tjf) * wd * noise * dtinvsqrt
                    if sig_rt is not None:
                        term = term * sig_rt
                    fpair = fpair + term
                fpair = fpair * rinv
                fpair = jnp.where(okc, fpair, 0.0)
            return fpair * dx, fpair * dyy, fpair * dzz

        def reduce_i(ft):           # sum over sj -> (cap, lanes)
            ri = jnp.sum(jnp.reshape(ft, (IC, cap, lanes)), axis=1)
            if IC == cap:
                return ri
            return jnp.concatenate(
                [ri, jnp.zeros((cap - IC, lanes), jnp.float32)], axis=0)

        def reduce_j(ft):           # sum over si -> (cap, lanes)
            return jnp.sum(jnp.reshape(ft, (IC, cap, lanes)), axis=0)

        # ---- self cell: rank-ordered half (sj > si) ----
        xj = [expand_j(mid_f[0, c]) for c in range(NF)]
        tj = expand_j(mid_t[0])
        fx, fy, fz = pair_tile(xj, tj, sj_big > si_big)
        for c, ft in enumerate((fx, fy, fz)):
            acc[c] += reduce_i(ft) - reduce_j(ft)

        # ---- 13 directed neighbor offsets ----
        for dxs, dy, dz in directed:
            if dxs == 0:
                xsrc_f = [mid_f[0, c] for c in range(NF)]
                xsrc_t = mid_t[0]
                cross = None
            elif p == 1:
                xadj = (jnp.where(i == nb - 1, jnp.float32(lx),
                                  jnp.float32(0.0)) if per_x else 0.0)
                xsrc_f = [next_f[0, c] + (xadj if c == 0 else 0.0)
                          for c in range(NF)]
                xsrc_t = next_t[0]
                cross = "all"
            else:
                in_mid = slab_q < p - 1
                xadj = (jnp.where(i == nb - 1, jnp.float32(lx),
                                  jnp.float32(0.0)) if per_x else 0.0)

                def stitch(vm, vn, adj=None):
                    vn_r = nbr(vn, -(p - 1) * s, lanes)
                    if adj is not None:
                        vn_r = vn_r + adj
                    return jnp.where(in_mid, nbr(vm, s, lanes), vn_r)
                xsrc_f = [stitch(mid_f[0, c], next_f[0, c],
                                 xadj if (c == 0 and per_x) else None)
                          for c in range(NF)]
                xsrc_t = stitch(mid_t[0], next_t[0])
                cross = "last"

            big = 4.0 * (lx + ly + lz) + 1.0e3

            def yz(val, fidx):
                if fidx == 1:
                    wy = (ly if not mi_y else 0.0) if per_y else big
                else:
                    wy = 0.0
                if fidx == 2:
                    wz = (lz if not mi_z else 0.0) if per_z else big
                else:
                    wz = 0.0
                v = nbr(val, dy * nz, s, wrap_delta=wy * dy)
                return nbr(v, dz, nz, wrap_delta=wz * dz)

            fields = [yz(xsrc_f[c], c) for c in range(NF)]
            tjv = yz(xsrc_t, -1)

            if per_x or dxs == 0:
                gok = jnp.ones((cap, lanes), bool)
            else:
                gok = (i * p + slab_q + dxs) < nx

            xjv = [expand_j(fields[c]) for c in range(NF)]
            tj_b = expand_j(tjv)
            fx, fy, fz = pair_tile(xjv, tj_b, expand_j(gok))
            for c, ft in enumerate((fx, fy, fz)):
                acc[c] += reduce_i(ft)
                tmp = nbr(nbr(reduce_j(ft), -dz, nz), -dy * nz, s)
                if cross is None:
                    acc[c] -= tmp
                elif cross == "all":
                    acc2[c] -= tmp
                else:
                    in_mid2 = slab_q < p - 1
                    acc[c] -= nbr(jnp.where(in_mid2, tmp, 0.0), -s, lanes)
                    acc2[c] -= nbr(jnp.where(in_mid2, 0.0, tmp),
                                   (p - 1) * s, lanes)

        out_ref[0] = acc[...]
        out2_ref[0] = acc2[...]

    if bigtile is None:
        # IC*cap work vs occ*cap: the structural win holds for tight caps
        # (the production OBMD repack runs filing cap 15/16); at LJ/chain-
        # sized caps (>= 24) the extra dead-rank arithmetic outweighs it
        bigtile = geom.fcap <= 20
    if bigtile:
        kernel = kernel_bigtile

    if per_x:
        def _next(i):
            return (i + 1) % nb
    else:
        def _next(i):
            return jnp.minimum(i + 1, nb - 1)

    def im(i, *_):
        return (i, 0, 0, 0)

    def inx(i, *_):
        return (_next(i), 0, 0, 0)

    def imt(i, *_):
        return (i, 0, 0)

    def inxt(i, *_):
        return (_next(i), 0, 0)

    in_specs = [
        pl.BlockSpec((1, NF, cap, lanes), im),
        pl.BlockSpec((1, NF, cap, lanes), inx),
        pl.BlockSpec((1, cap, lanes), imt),
        pl.BlockSpec((1, cap, lanes), inxt),
    ]
    if exclude_bonded:
        def imb(i, *_):
            return (i, 0, 0, 0)
        in_specs.append(pl.BlockSpec((1, n_excl, cap, lanes), imb))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if ramp else 2,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, 3, cap, lanes), im),
                   pl.BlockSpec((1, 3, cap, lanes), im)],
        scratch_shapes=[pltpu.VMEM((3, cap, lanes), jnp.float32),
                        pltpu.VMEM((3, cap, lanes), jnp.float32),
                        pltpu.VMEM((3, cap, lanes), jnp.float32)],
    )

    interpret = jax.default_backend() not in ("tpu", "axon")

    def pair_forces(fld, tag, salt, occ, pbond=None, sig_scale=None):
        args = [jnp.asarray(salt, _U32).reshape(1), occ.astype(jnp.int32)]
        if ramp:
            ss = (jnp.ones((1,), jnp.float32) if sig_scale is None
                  else jnp.asarray(sig_scale, jnp.float32).reshape(1))
            args.append(ss)
        args += [fld, fld, tag, tag]
        if exclude_bonded:
            args.append(pbond)
        out, out2 = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((nb, 3, cap, lanes), jnp.float32),
                       jax.ShapeDtypeStruct((nb, 3, cap, lanes), jnp.float32)],
            interpret=interpret,
        )(*args)
        # reverse-comm analogue: block i's cross reactions belong to block
        # i+1's atoms
        if per_x:
            carry = jnp.roll(out2, 1, axis=0)
        else:
            carry = jnp.concatenate(
                [jnp.zeros_like(out2[:1]), out2[:-1]], axis=0)
        return out + carry

    return pair_forces


def make_dpd_kernel(geom: PadGeometry, *, a0: float = 0.0,
                    gamma: float = 0.0, sigma: float = 0.0, cut: float = 1.0,
                    dt: float = 0.01, law: str = "dpd",
                    lj_eps: float = 1.0, lj_sig: float = 1.0,
                    exclude_bonded: bool = False):
    """Build fn(fld, tag, salt, occ) -> f for this geometry + pair law.

      fld: f32 [n_blocks, 6, cap, lanes]  (x, y, z, vx, vy, vz; dead = BIG)
      tag: i32 [n_blocks, cap, lanes]
      salt: u32 [1] (step salt for the pair noise)
      occ: i32 [n_blocks] (highest occupied rank + 1 per block)
      f:   f32 [n_blocks, 3, cap, lanes]

    law = "dpd" (conservative+drag+noise, pair_dpd.cpp:128-137) or
    "lj" (12-6 LJ forces, the reference's headline melt benchmark pair).
    """
    nx, ny, nz = geom.dims
    s, p, lanes, cap = geom.s, geom.p, geom.lanes, geom.cap
    nb = geom.n_blocks
    ly = float(ny * geom.cell_size[1])
    lz = float(nz * geom.cell_size[2])
    dtinvsqrt = float(1.0 / np.sqrt(dt))
    cutsq = float(cut * cut)
    eps = 1.0e-10
    sqrt3 = float(np.sqrt(3.0))
    a0f, gamf, sigf, cutf = map(float, (a0, gamma, sigma, cut))
    lx = float(nx * geom.cell_size[0])
    per_x = geom.periodic_x
    s6 = float(lj_sig) ** 6
    lj1 = 48.0 * float(lj_eps) * s6 * s6
    lj2 = 24.0 * float(lj_eps) * s6

    def kernel(salt_ref, occ_ref, prev_f, mid_f, next_f, prev_t, mid_t,
               next_t, *rest):
        if exclude_bonded:
            pb_ref, out_ref, acc = rest
        else:
            out_ref, acc = rest
            pb_ref = None
        i = pl.program_id(0)
        salt = salt_ref[0]
        # highest occupied rank + 1 of this block: the i-side loop stops
        # there (rows above hold only dead/padding slots).  The j side stays
        # cap-wide (vector dim) — dead slots are distance-masked.
        si_max = occ_ref[i]
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (cap, lanes), 1)
        rank_idx = jax.lax.broadcasted_iota(jnp.int32, (cap, lanes), 0)
        slab_q = lane_idx // s

        acc[...] = jnp.zeros((3, cap, lanes), jnp.float32)

        def nbr(val, dstride: int, group: int):
            """out[l] = val[l + dstride], wrapping inside `group`-aligned
            lane groups (two rolls + static select)."""
            if dstride == 0:
                return val
            r1 = pltpu.roll(val, (-dstride) % lanes, 1)
            pos = lane_idx % group
            if dstride > 0:
                r2 = pltpu.roll(val, (group - dstride) % lanes, 1)
                wrapped = pos >= group - dstride
            else:
                r2 = pltpu.roll(val, (-dstride - group) % lanes, 1)
                wrapped = pos < -dstride
            return jnp.where(wrapped, r2, r1)

        def contrib(src_f, src_t, dlane: int, dy: int, dz: int, x_valid,
                    same_cell: bool):
            fields = []
            for fidx in range(6):
                v = src_f[0, fidx]
                v = nbr(v, dlane, lanes)
                v = nbr(v, dy * nz, s)
                v = nbr(v, dz, nz)
                fields.append(v)
            tj = nbr(nbr(nbr(src_t[0], dlane, lanes), dy * nz, s), dz, nz)
            xj, yj, zj, vxj, vyj, vzj = fields

            def si_body(si, _):
                dx = mid_f[0, 0, si][None, :] - xj
                dyy = mid_f[0, 1, si][None, :] - yj
                dzz = mid_f[0, 2, si][None, :] - zj
                if per_x:
                    dx = dx - lx * jnp.round(dx * (1.0 / lx))
                dyy = dyy - ly * jnp.round(dyy * (1.0 / ly))
                dzz = dzz - lz * jnp.round(dzz * (1.0 / lz))
                rsq = dx * dx + dyy * dyy + dzz * dzz
                r = jnp.sqrt(rsq)
                ok = (rsq < cutsq) & (r > eps) & x_valid
                if same_cell:
                    ok = ok & (rank_idx != si)
                if exclude_bonded:
                    # special_bonds fene: 1-2 pairs skip the pair style
                    p1 = pb_ref[0, 0, si][None, :]
                    p2 = pb_ref[0, 1, si][None, :]
                    ok = ok & (tj != p1) & (tj != p2)

                if law == "lj":
                    r2inv = jnp.where(ok, 1.0 / jnp.maximum(rsq, eps * eps),
                                      0.0)
                    r6inv = r2inv * r2inv * r2inv
                    fpair = r6inv * (lj1 * r6inv - lj2) * r2inv
                    fpair = jnp.where(ok, fpair, 0.0)
                else:
                    rinv = jax.lax.rsqrt(jnp.maximum(rsq, eps * eps))
                    wd = 1.0 - r * (1.0 / cutf)
                    dot = (dx * (mid_f[0, 3, si][None, :] - vxj)
                           + dyy * (mid_f[0, 4, si][None, :] - vyj)
                           + dzz * (mid_f[0, 5, si][None, :] - vzj))

                    # tags are non-negative int32: min/max in signed domain
                    # (unsigned vector min is unsupported), hash in u32
                    ti = jnp.broadcast_to(mid_t[0, si][None, :], (cap, lanes))
                    lo = pltpu.bitcast(jnp.minimum(ti, tj), _U32)
                    hi = pltpu.bitcast(jnp.maximum(ti, tj), _U32)
                    # rng.pair_noise's production construction, bitwise
                    h = _avalanche_u32((lo * _U32(0x9E3779B9))
                                       ^ (hi * _U32(0x85EBCA77)) ^ salt)
                    # u32 -> f32 cast unsupported in Mosaic: via int32 (the
                    # top-24-bit value is always non-negative)
                    u24 = pltpu.bitcast(h >> 8, jnp.int32)
                    u01 = u24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
                    noise = sqrt3 * (2.0 * u01 - 1.0)

                    fpair = a0f * wd
                    fpair = fpair - gamf * wd * wd * dot * rinv
                    fpair = fpair + sigf * wd * noise * dtinvsqrt
                    fpair = fpair * rinv
                    fpair = jnp.where(ok, fpair, 0.0)

                acc[0, si, :] += jnp.sum(fpair * dx, axis=0)
                acc[1, si, :] += jnp.sum(fpair * dyy, axis=0)
                acc[2, si, :] += jnp.sum(fpair * dzz, axis=0)
                return 0

            jax.lax.fori_loop(0, si_max, si_body, 0)

        all_ok = jnp.ones((cap, lanes), bool)
        for dy in ((-1, 0, 1) if ny >= 3 else (0,)):
            for dz in ((-1, 0, 1) if nz >= 3 else (0,)):
                for dxs in (-1, 0, 1):
                    same = dxs == 0 and dy == 0 and dz == 0
                    if per_x:
                        gok = jnp.ones((cap, lanes), bool)
                    else:
                        gslab = i * p + slab_q + dxs
                        gok = (gslab >= 0) & (gslab < nx)
                    if dxs == 0:
                        contrib(mid_f, mid_t, 0, dy, dz, all_ok, same)
                        continue
                    if p == 1:
                        src_f, src_t = ((next_f, next_t) if dxs == 1
                                        else (prev_f, prev_t))
                        contrib(src_f, src_t, 0, dy, dz, gok, False)
                        continue
                    # mid-internal slab shift (lanes whose q+dxs stays in
                    # this block)
                    in_mid = (slab_q + dxs >= 0) & (slab_q + dxs < p)
                    contrib(mid_f, mid_t, dxs * s, dy, dz, in_mid & gok,
                            False)
                    if dxs == 1:
                        contrib(next_f, next_t, -(p - 1) * s, dy, dz,
                                (~in_mid) & gok, False)
                    else:
                        contrib(prev_f, prev_t, (p - 1) * s, dy, dz,
                                (~in_mid) & gok, False)

        out_ref[0] = acc[...]

    if geom.periodic_x:
        def _prev(i):
            return (i - 1) % nb

        def _next(i):
            return (i + 1) % nb
    else:
        def _prev(i):
            return jnp.maximum(i - 1, 0)

        def _next(i):
            return jnp.minimum(i + 1, nb - 1)

    def ip(i, *_):
        return (_prev(i), 0, 0, 0)

    def im(i, *_):
        return (i, 0, 0, 0)

    def inx(i, *_):
        return (_next(i), 0, 0, 0)

    def ipt(i, *_):
        return (_prev(i), 0, 0)

    def imt(i, *_):
        return (i, 0, 0)

    def inxt(i, *_):
        return (_next(i), 0, 0)

    in_specs = [
        pl.BlockSpec((1, 6, cap, lanes), ip),
        pl.BlockSpec((1, 6, cap, lanes), im),
        pl.BlockSpec((1, 6, cap, lanes), inx),
        pl.BlockSpec((1, cap, lanes), ipt),
        pl.BlockSpec((1, cap, lanes), imt),
        pl.BlockSpec((1, cap, lanes), inxt),
    ]
    if exclude_bonded:
        def imb(i, *_):
            return (i, 0, 0, 0)
        in_specs.append(pl.BlockSpec((1, 2, cap, lanes), imb))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 3, cap, lanes), im),
        scratch_shapes=[pltpu.VMEM((3, cap, lanes), jnp.float32)],
    )

    # Non-TPU backends (CPU tests) run the kernel in interpreter mode.
    interpret = jax.default_backend() not in ("tpu", "axon")

    def dpd_forces(fld, tag, salt, occ, pbond=None):
        args = [jnp.asarray(salt, _U32).reshape(1), occ.astype(jnp.int32),
                fld, fld, fld, tag, tag, tag]
        if exclude_bonded:
            args.append(pbond)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, 3, cap, lanes), jnp.float32),
            interpret=interpret,
        )(*args)

    return dpd_forces
