"""Pallas USHER kernel: the whole steered-insertion search in ONE kernel.

The XLA implementation of the batched USHER loop (obmd/subset.py) pays
~17 us of kernel-launch overhead per iteration — with nattempt=40 and two
buffers that is ~1.4 ms/step, dominating the OBMD stage at production
sizes.  Here the entire search runs in one Pallas program per buffer:
subset and candidate state live in VMEM, the nattempt iterations are a
fori_loop inside the kernel, and the pair math is a fully vectorized
[K, B] block per iteration (candidates on sublanes, subset atoms on
lanes).

Semantics are identical to obmd.subset.usher_search_subset (ref
fix_obmd_merged.cpp:1518-1616): E < etarget + eps accepts; E > uovlp uses
the overlap step; stepping outside the insertion region rejects; a
degenerate force rejects; a post-loop energy check accepts candidates
that ran out of iterations below target.

Covers every pair law whose candidate-vs-subset conservative energy is a
per-lane-coefficient radial form: DPD / dpd/ext (any ntypes — the trial
type is the fix's single insertion type, so a0/cut collapse to per-LANE
rows a0[ct, type_j] precomputed outside the kernel), lj/cut, and
lj/cut/rf with NEUTRAL trial particles (ATOM-mode insertion inserts
q = 0, so the reaction-field term vanishes identically and the law
reduces to the per-lane LJ rows; fix_obmd_merged.cpp:1244-1344's charged
weights only matter for MOLECULE-mode template charges, which use the
XLA search).  The thermostat-only laws (dpd/tstat, dpd/ext/tstat) have
zero conservative energy; they stay on the trivially-accepting XLA path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1.0e8
EPSILON = 1.0e-6
N_ROWS = 8   # xyz + up to 4 per-lane coefficient rows, padded to 8


def usher_law(pair):
    """("dpd" | "lj", per-lane coefficient-row builder) for a pair style,
    or None when the conservative energy is not kernel-representable.
    The builder maps (type_row [B], q_row [B]) -> list of [B] f32 rows."""
    from ..config import (DPDExtParams, DPDParams, LJCutParams,
                          LJCutRFParams)
    if isinstance(pair, DPDExtParams) and pair.tstat_only:
        return None
    if isinstance(pair, (DPDParams, DPDExtParams)):
        a0 = np.asarray(pair.a0, np.float32)
        cut = np.asarray(pair.cut, np.float32)

        def rows(ct, tj, qj):
            return [jnp.asarray(a0)[ct, tj], jnp.asarray(cut)[ct, tj]]
        return "dpd", rows
    if isinstance(pair, (LJCutParams, LJCutRFParams)):
        eps = np.asarray(pair.epsilon, np.float64)
        sig = np.asarray(pair.sigma, np.float64)
        cut = np.asarray(pair.cut, np.float64)
        s6 = sig ** 6
        lj3 = 4.0 * eps * s6 * s6
        lj4 = 4.0 * eps * s6
        if isinstance(pair, LJCutParams) and pair.shift:
            rc6 = (1.0 / cut ** 2) ** 3
            eshift = rc6 * (lj3 * rc6 - lj4)
        else:
            eshift = np.zeros_like(lj3)

        def rows(ct, tj, qj):
            return [jnp.asarray(lj3, jnp.float32)[ct, tj],
                    jnp.asarray(lj4, jnp.float32)[ct, tj],
                    jnp.asarray(cut, jnp.float32)[ct, tj],
                    jnp.asarray(eshift, jnp.float32)[ct, tj]]
        return "lj", rows
    return None


def make_usher_kernel(cfg, B: int, K: int):
    """Build fn(sub_rows [2,N_ROWS,Bp], cand [2,Kp,128], bounds
    [2,1,128]) -> out [2,Kp,128] with lanes 0-2 = final pos,
    3 = accepted, 4 = iters.

    B is the per-side subset capacity (padded rows carry BIG positions);
    sub_rows = x,y,z + the law's per-lane coefficient rows (usher_law);
    bounds lanes 0-2 = region lo, 3-5 = region hi (per side)."""
    pair = cfg.pair
    law_rows = usher_law(pair)
    if law_rows is None:
        raise NotImplementedError(
            "pallas USHER: no kernel law for this pair style")
    law, _ = law_rows
    u = cfg.obmd.usher
    etarget = float(u.etarget)
    ds0 = float(u.ds0)
    uovlp = float(u.uovlp)
    dsovlp = float(u.dsovlp)
    ueps = float(u.eps)
    nattempt = int(u.nattempt)
    eps = EPSILON

    Bp = ((B + 127) // 128) * 128
    Kp = max(8, ((K + 7) // 8) * 8)

    # y/z periodic min-image: the subset spans the full cross-section, so
    # candidates near a periodic face need the wrapped image
    ly = float(cfg.box.lengths[1]) if cfg.box.periodic[1] else 0.0
    lz = float(cfg.box.lengths[2]) if cfg.box.periodic[2] else 0.0

    def kernel(sub_ref, cand_ref, bounds_ref, out_ref, pos_s, st_s):
        # pos_s: [Kp, 128] scratch — lanes 0-2 hold candidate positions
        # st_s:  [Kp, 128] scratch — lane 0 active, 1 accepted, 2 iters
        sub_x = sub_ref[0, 0, :][None, :]          # [1, Bp]
        sub_y = sub_ref[0, 1, :][None, :]
        sub_z = sub_ref[0, 2, :][None, :]
        if law == "dpd":
            a0_row = sub_ref[0, 3, :][None, :]
            cut_row = sub_ref[0, 4, :][None, :]
        else:
            lj3_row = sub_ref[0, 3, :][None, :]
            lj4_row = sub_ref[0, 4, :][None, :]
            cut_row = sub_ref[0, 5, :][None, :]
            esh_row = sub_ref[0, 6, :][None, :]
        pos_s[...] = cand_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (Kp, 128), 1)
        st_s[...] = jnp.where(lane == 0, 1.0, 0.0)  # all active

        # keep the bounds as [1,1] vectors: Mosaic vector->scalar
        # extraction of a VMEM row mis-lowered here (region exits went
        # undetected), static 1-lane slices broadcast correctly
        row = bounds_ref[0]                        # [1, 128]
        lo_x, lo_y, lo_z = row[:, 0:1], row[:, 1:2], row[:, 2:3]
        hi_x, hi_y, hi_z = row[:, 3:4], row[:, 4:5], row[:, 5:6]

        def energy_force(px, py, pz):
            """px/py/pz: [Kp,1].  Returns E [Kp,1], F components [Kp,1].
            Per-lane coefficient rows make this law/type-generic: each
            subset lane j carries its own a0/cut (or lj3/lj4/cut/eshift)
            against the fix's single trial type."""
            dx = px - sub_x
            dy = py - sub_y
            dz = pz - sub_z
            if ly > 0.0:
                dy = dy - ly * jnp.round(dy * (1.0 / ly))
            if lz > 0.0:
                dz = dz - lz * jnp.round(dz * (1.0 / lz))
            rsq = dx * dx + dy * dy + dz * dz
            if law == "dpd":
                rinv = jax.lax.rsqrt(jnp.maximum(rsq, eps * eps))
                r = rsq * rinv
                wd = 1.0 - r * (1.0 / cut_row)
                inr = (rsq < cut_row * cut_row) & (rsq > eps * eps)
                e = jnp.where(inr, 0.5 * a0_row * cut_row * wd * wd, 0.0)
                fp = jnp.where(inr, a0_row * wd * rinv, 0.0)
            else:
                inr = (rsq < cut_row * cut_row) & (rsq > eps * eps)
                r2inv = jnp.where(inr,
                                  1.0 / jnp.maximum(rsq, eps * eps), 0.0)
                r6inv = r2inv * r2inv * r2inv
                e = jnp.where(
                    inr,
                    r6inv * (lj3_row * r6inv - lj4_row) - esh_row, 0.0)
                fp = jnp.where(
                    inr,
                    r6inv * (12.0 * lj3_row * r6inv - 6.0 * lj4_row)
                    * r2inv, 0.0)
            E = jnp.sum(e, axis=1, keepdims=True)
            Fx = jnp.sum(fp * dx, axis=1, keepdims=True)
            Fy = jnp.sum(fp * dy, axis=1, keepdims=True)
            Fz = jnp.sum(fp * dz, axis=1, keepdims=True)
            return E, Fx, Fy, Fz

        def body(_, carry):
            px = pos_s[:, 0:1]
            py = pos_s[:, 1:2]
            pz = pos_s[:, 2:3]
            active = st_s[:, 0:1] > 0.5
            accepted = st_s[:, 1:2] > 0.5
            iters = st_s[:, 2:3]

            E, Fx, Fy, Fz = energy_force(px, py, pz)
            ok = E < etarget + eps
            newly = active & ok
            fabs = jnp.sqrt(Fx * Fx + Fy * Fy + Fz * Fz)
            degen = fabs < eps
            ds_ovlp = dsovlp - (4.0 * ueps
                                / jnp.maximum(E, eps)) ** (1.0 / 12.0)
            ds_norm = jnp.minimum((E - etarget) / jnp.maximum(fabs, eps),
                                  ds0)
            ds = jnp.where(E > uovlp, ds_ovlp, ds_norm)
            finv = ds / jnp.maximum(fabs, eps)
            mx = px + Fx * finv
            my = py + Fy * finv
            mz = pz + Fz * finv
            inside = ((mx >= lo_x) & (mx <= hi_x)
                      & (my >= lo_y) & (my <= hi_y)
                      & (mz >= lo_z) & (mz <= hi_z))
            move_now = active & ~ok & ~degen
            px = jnp.where(move_now, mx, px)
            py = jnp.where(move_now, my, py)
            pz = jnp.where(move_now, mz, pz)
            stopped = newly | (active & degen) | (move_now & ~inside)
            active = active & ~stopped
            accepted = accepted | newly
            iters = iters + jnp.where(active, 1.0, 0.0)

            pos_s[:, 0:1] = px
            pos_s[:, 1:2] = py
            pos_s[:, 2:3] = pz
            st_s[:, 0:1] = jnp.where(active, 1.0, 0.0)
            st_s[:, 1:2] = jnp.where(accepted, 1.0, 0.0)
            st_s[:, 2:3] = iters
            return carry

        jax.lax.fori_loop(0, nattempt, body, 0)

        # post-loop acceptance check for still-active candidates
        px = pos_s[:, 0:1]
        py = pos_s[:, 1:2]
        pz = pos_s[:, 2:3]
        E, _, _, _ = energy_force(px, py, pz)
        active = st_s[:, 0:1] > 0.5
        accepted = (st_s[:, 1:2] > 0.5) | (active & (E < etarget + eps))

        out = pos_s[...]
        accf = jnp.where(accepted, 1.0, 0.0)       # [Kp,1] -> lane bcast
        out = jnp.where(lane == 3, accf, out)
        out = jnp.where(lane == 4, st_s[:, 2:3], out)
        out_ref[0] = out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((1, N_ROWS, Bp), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, Kp, 128), lambda s: (s, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda s: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Kp, 128), lambda s: (s, 0, 0)),
        scratch_shapes=[pltpu.VMEM((Kp, 128), jnp.float32),
                        pltpu.VMEM((Kp, 128), jnp.float32)],
    )

    interpret = jax.default_backend() not in ("tpu", "axon")

    def run(sub_xyz, cand, bounds):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, Kp, 128), jnp.float32),
            interpret=interpret,
        )(sub_xyz, cand, bounds)

    return run, Bp, Kp


def usher_search_pallas(cfg, sub_l, sub_r, cand_l, cand_r,
                        region_l, region_r):
    """Drop-in for obmd.subset.usher_search_subset_batch on any
    kernel-representable pair law (usher_law): returns
    (pos [2,K,3], accepted [2,K], iters [2,K])."""
    K = cand_l.shape[0]
    B = max(sub_l.x.shape[0], sub_r.x.shape[0])
    run, Bp, Kp = make_usher_kernel(cfg, B, K)
    _, row_builder = usher_law(cfg.pair)
    ct = int(cfg.obmd.ntype)

    def side_fields(sub):
        b = sub.x.shape[0]
        x = jnp.where(sub.valid[:, None], sub.x, BIG).astype(jnp.float32)
        pad = jnp.full((Bp - b, 3), BIG, jnp.float32)
        xyz = jnp.concatenate([x, pad], axis=0).T        # [3, Bp]
        # per-lane coefficient rows against the trial type; padded /
        # invalid lanes get cut = 1 (their BIG positions are already out
        # of range — a zero cut would make 1/cut a NaN source)
        tj = jnp.clip(sub.type, 0, cfg.ntypes - 1)
        coef = row_builder(ct, tj, sub.q)
        rows = [xyz]
        cut_idx = len(coef) - 1 if len(coef) == 2 else 2
        for i, c in enumerate(coef):
            fill = 1.0 if i == cut_idx else 0.0
            c = jnp.where(sub.valid, c.astype(jnp.float32),
                          jnp.float32(fill))
            rows.append(jnp.concatenate(
                [c, jnp.full((Bp - b,), fill, jnp.float32)])[None, :])
        out = jnp.concatenate(rows, axis=0)
        return jnp.concatenate(
            [out, jnp.zeros((N_ROWS - out.shape[0], Bp), jnp.float32)])

    sub_xyz = jnp.stack([side_fields(sub_l), side_fields(sub_r)])

    def side_cand(c):
        out = jnp.zeros((Kp, 128), jnp.float32)
        return out.at[:K, 0:3].set(c.astype(jnp.float32))

    cand = jnp.stack([side_cand(cand_l), side_cand(cand_r)])

    def side_bounds(region):
        row = jnp.zeros((1, 128), jnp.float32)
        row = row.at[0, 0:3].set(jnp.asarray(region.lo, jnp.float32))
        row = row.at[0, 3:6].set(jnp.asarray(region.hi, jnp.float32))
        return row

    bounds = jnp.stack([side_bounds(region_l), side_bounds(region_r)])

    out = run(sub_xyz, cand, bounds)                     # [2, Kp, 128]
    dtype = cand_l.dtype
    pos = out[:, :K, 0:3].astype(dtype)
    accepted = out[:, :K, 3] > 0.5
    iters = out[:, :K, 4].astype(jnp.int32)
    return pos, accepted, iters
