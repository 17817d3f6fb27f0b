"""Buffer-subset insertion machinery — the fast path for USHER/near.

The reference's USHER energy scan walks every local atom with pair->single
(fix_obmd_merged.cpp:1774-1812).  Candidates only ever sit inside an
insertion region, so the only atoms that can contribute are those within the
pair cutoff of that region.  We extract that subset once per stage call
(one masked compaction) and run the entire steered search brute-force
against it — [K, B] vector math with zero gathers per iteration.  This is
both *more* exact than a stale-table walk and 1-2 orders of magnitude fewer
ops than per-iteration cell gathers.

Note: the region-expansion test uses raw (wrapped) coordinates; an insertion
sub-region that does not span a periodic axis entirely would miss neighbors
across that axis's boundary.  The OBMD decks' insertion regions span the
full y/z cross-section (examples/OBMD_DPD/input.py:92-93), where the
expanded test is exact.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cells import BIG
from ..config import DPDParams, LJCutRFParams, SceneConfig
from ..geometry import RegionBlock
from ..state import State

EPSILON = 1.0e-6


class Subset(NamedTuple):
    idx: jnp.ndarray      # [B] slot ids (n = padding)
    x: jnp.ndarray        # [B,3] (BIG for padding)
    type: jnp.ndarray     # [B]
    q: jnp.ndarray        # [B]
    valid: jnp.ndarray    # [B] bool
    overflow: jnp.ndarray  # bool: more region atoms than B


def expand_region(region: RegionBlock, pad: float) -> RegionBlock:
    return RegionBlock(tuple(l - pad for l in region.lo),
                       tuple(h + pad for h in region.hi))


def region_subset(cfg: SceneConfig, state: State, region: RegionBlock,
                  pad: float, b_max: int) -> Subset:
    n = state.capacity
    exp = expand_region(region, pad)
    mask = state.alive & exp.match(state.x)
    idx = jnp.nonzero(mask, size=b_max, fill_value=n)[0]
    valid = idx < n
    from ..cells import gather_padded
    return Subset(
        idx=idx.astype(jnp.int32),
        x=gather_padded(state.x, idx, BIG),
        type=gather_padded(state.type, idx, 0),
        q=gather_padded(state.q, idx, 0.0),
        valid=valid,
        overflow=jnp.sum(mask.astype(jnp.int32)) > b_max)


def conservative_energy_force(pair, sub: Subset, box, cand_x, cand_type,
                              cand_q=None):
    """Brute-force conservative energy/force of K trial particles vs the
    subset — matches pair->single semantics (pair_dpd.cpp:401,
    pair_lj_cut_rf.cpp:492/533)."""
    dtype = cand_x.dtype
    d = box.min_image(cand_x[:, None, :] - sub.x[None, :, :])   # [K,B,3]
    rsq = jnp.sum(d * d, axis=-1)
    ok = sub.valid[None, :]

    from ..config import DPDExtParams, DPDTstatParams
    if isinstance(pair, DPDTstatParams) or (
            isinstance(pair, DPDExtParams) and pair.tstat_only):
        # no conservative term (pair->single analogue is zero)
        return jnp.zeros((cand_x.shape[0],), dtype), jnp.zeros_like(cand_x)
    if isinstance(pair, (DPDParams, DPDExtParams)):
        a0 = jnp.asarray(np.asarray(pair.a0), dtype)
        cut = jnp.asarray(np.asarray(pair.cut), dtype)
        if a0.shape == (1, 1):
            a0v, cutv = a0[0, 0], cut[0, 0]
        else:
            a0v = a0[cand_type[:, None], sub.type[None, :]]
            cutv = cut[cand_type[:, None], sub.type[None, :]]
        r = jnp.sqrt(rsq)
        rinv = jnp.where(r > 1e-10, 1.0 / jnp.maximum(r, 1e-10), 0.0)
        wd = 1.0 - r / cutv
        inr = ok & (rsq < cutv * cutv) & (r > 1e-10)
        e = jnp.where(inr, 0.5 * a0v * cutv * wd * wd, 0.0)
        fp = jnp.where(inr, a0v * wd * rinv, 0.0)
    else:
        from ..forces.pairs import make_pair_law
        pair_fn = make_pair_law(pair, 1.0, dtype)
        kwargs = {}
        if isinstance(pair, LJCutRFParams):
            cq = cand_q if cand_q is not None else jnp.zeros(
                (cand_x.shape[0],), dtype)
            kwargs = dict(qi=cq[:, None], qj=sub.q[None, :])
        zero = jnp.zeros((), jnp.int32)
        fp, e = pair_fn(rsq, d, jnp.zeros_like(d),
                        cand_type[:, None], sub.type[None, :],
                        zero, zero, jnp.zeros((), jnp.uint32), **kwargs)
        fp = jnp.where(ok, fp, 0.0)
        e = jnp.where(ok, e, 0.0)

    E = jnp.sum(e, axis=-1)
    F = jnp.sum(fp[..., None] * d, axis=1)
    return E, F


def usher_search_subset(cfg: SceneConfig, sub: Subset, cand_x, cand_type,
                        region: RegionBlock):
    """Vectorized USHER against a buffer subset (semantics identical to
    obmd.stage._usher_search / ref fix_obmd_merged.cpp:1518-1616)."""
    u = cfg.obmd.usher
    box = cfg.box

    def body(carry, _):
        pos, active, accepted, iters = carry
        E, F = conservative_energy_force(cfg.pair, sub, box, pos, cand_type)
        ok = E < u.etarget + EPSILON
        newly = active & ok
        fabs = jnp.sqrt(jnp.sum(F * F, axis=-1))
        degen = fabs < EPSILON
        ds_ovlp = u.dsovlp - (4.0 * u.eps / jnp.maximum(E, EPSILON)) ** (1.0 / 12.0)
        ds_norm = jnp.minimum((E - u.etarget) / jnp.maximum(fabs, EPSILON),
                              u.ds0)
        ds = jnp.where(E > u.uovlp, ds_ovlp, ds_norm)
        unit = F / jnp.maximum(fabs, EPSILON)[:, None]
        moved = pos + unit * ds[:, None]
        inside = region.match(moved)
        move_now = active & ~ok & ~degen
        pos = jnp.where(move_now[:, None], moved, pos)
        stopped = newly | (active & degen) | (move_now & ~inside)
        active = active & ~stopped
        accepted = accepted | newly
        iters = iters + active.astype(jnp.int32)
        return (pos, active, accepted, iters), None

    k = cand_x.shape[0]
    init = (cand_x, jnp.ones((k,), bool), jnp.zeros((k,), bool),
            jnp.zeros((k,), jnp.int32))
    # fixed-length scan: a while_loop early-out measured ~40% SLOWER on
    # TPU and full unrolling did not help — the ~17us/iteration cost is
    # the body's kernel launches, amortized instead by batching both
    # buffers into one search (usher_search_subset_batch)
    (pos, active, accepted, iters), _ = jax.lax.scan(
        body, init, None, length=u.nattempt)
    E, _ = conservative_energy_force(cfg.pair, sub, box, pos, cand_type)
    accepted = accepted | (active & (E < u.etarget + EPSILON))
    return pos, accepted, iters


def near_check_subset(cfg: SceneConfig, sub: Subset, cand_x):
    d = cfg.box.min_image(cand_x[:, None, :] - sub.x[None, :, :])
    rsq = jnp.sum(d * d, axis=-1)
    min_rsq = jnp.min(jnp.where(sub.valid[None, :], rsq, jnp.inf), axis=-1)
    return min_rsq >= cfg.obmd.near ** 2


def subset_rows(p, box, sub: Subset, pos, new_slots, act):
    """Neighbor rows (within cutoff+skin) for M new atoms, drawn from the
    pre-insertion subset plus the other new atoms themselves (so mutual
    new-new pairs appear in both fresh rows, mirroring the table path).
    Returns (row [M,K] slot ids, row_ok [M,K], overflow)."""
    k = p.k_max
    m = pos.shape[0]
    cand_idx = jnp.concatenate([sub.idx, new_slots.astype(jnp.int32)])
    cand_x = jnp.concatenate([sub.x, jnp.where(act[:, None], pos, BIG)])
    cand_valid = jnp.concatenate([sub.valid, act])

    d = box.min_image(pos[:, None, :] - cand_x[None, :, :])
    rsq = jnp.sum(d * d, axis=-1)
    rl2 = (p.cutoff + p.skin) ** 2
    ok = (rsq < rl2) & cand_valid[None, :] & act[:, None]
    # self-exclusion in the appended block
    b = sub.x.shape[0]
    eye = jnp.eye(m, dtype=bool)
    ok = ok.at[:, b:].set(ok[:, b:] & ~eye)
    key = jnp.where(ok, 1.0e9 - rsq, -1.0)
    _, cols = jax.lax.top_k(key, k)
    row = cand_idx[cols]
    row_ok = jnp.take_along_axis(ok, cols, axis=1)
    over = jnp.sum(jnp.maximum(jnp.sum(ok, axis=1) - k, 0)).astype(jnp.int32)
    return row, row_ok, over


# --------------------------------------------------------------------------
# molecule-mode insertion (ref try_inserting MOLECULE branch :989-1026 and
# usher molecule handling :1536-1605)
# --------------------------------------------------------------------------

def random_rotations(key, k: int, dtype, axis=None):
    """K rotation matrices from the reference's scheme (ref :1001-1024):
    random axis = uniform cube draw normalized (or the fixed `orient`
    axis, :1001-1004), angle uniform in [0, 2pi), axis-angle -> matrix."""
    import jax
    ka, kt = jax.random.split(key)
    if axis is not None:
        axis = jnp.broadcast_to(jnp.asarray(axis, dtype), (k, 3))
    else:
        axis = jax.random.uniform(ka, (k, 3), dtype=dtype) - 0.5
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    theta = jax.random.uniform(kt, (k,), dtype=dtype) * (2.0 * np.pi)
    c = jnp.cos(theta)[:, None, None]
    s = jnp.sin(theta)[:, None, None]
    ax = axis[:, :, None] * axis[:, None, :]
    eye = jnp.eye(3, dtype=dtype)[None]
    sk = jnp.zeros((k, 3, 3), dtype)
    sk = sk.at[:, 0, 1].set(-axis[:, 2]).at[:, 0, 2].set(axis[:, 1])
    sk = sk.at[:, 1, 0].set(axis[:, 2]).at[:, 1, 2].set(-axis[:, 0])
    sk = sk.at[:, 2, 0].set(-axis[:, 1]).at[:, 2, 1].set(axis[:, 0])
    return c * eye + s * sk + (1.0 - c[:, 0, 0])[:, None, None] * ax


def mol_candidates(template, centers, rots):
    """[K, m, 3] trial coordinates: center + R @ dx."""
    dx = jnp.asarray(np.asarray(template.dx), centers.dtype)   # [m,3]
    # HIGHEST: the TPU default matmul precision rounds f32 operands to
    # bfloat16 on the MXU — rotations must not distort template geometry
    rotated = jnp.einsum("kab,mb->kma", rots, dx,
                         precision=jax.lax.Precision.HIGHEST)
    return centers[:, None, :] + rotated


def mol_candidates_sel(dx_sel, amask, centers, rots):
    """Per-candidate-template trial coordinates (molfrac multi-template):
    dx_sel [K, m, 3] (the selected template's displacements, padded),
    amask [K, m] (real-atom mask) -> [K, m, 3]; pad rows land at BIG so
    every downstream energy/distance check ignores them."""
    from ..cells import BIG as _BIG
    rotated = jnp.einsum("kab,kmb->kma", rots, dx_sel,
                         precision=jax.lax.Precision.HIGHEST)
    pos = centers[:, None, :] + rotated
    return jnp.where(amask[:, :, None], pos, _BIG)


def mol_energy_force(cfg, sub: Subset, coords, mol_types,
                     per_atom: bool = False, mol_q=None):
    """Total conservative energy, net force, and (optionally) per-atom
    forces of each K-molecule trial.

    With `mol_q` (the template charges, `charged 1`), trial energies are
    evaluated with the not-yet-inserted atoms' charges against the subset's
    charges — the single_atomistic_obmd capability (reference
    fix_obmd_merged.cpp:1545-1551 chargeflag branch,
    pair_lj_cut_rf.cpp:533-616)."""
    k, m, _ = coords.shape
    flat = coords.reshape(k * m, 3)
    types = (jnp.tile(mol_types, (k,)) if mol_types.ndim == 1
             else mol_types.reshape(k * m))
    cq = (None if mol_q is None else
          (jnp.tile(mol_q, (k,)) if mol_q.ndim == 1
           else mol_q.reshape(k * m)))
    E, F = conservative_energy_force(cfg.pair, sub, cfg.box, flat, types,
                                     cand_q=cq)
    Fa = F.reshape(k, m, 3)
    E = E.reshape(k, m).sum(axis=1)
    Fnet = Fa.sum(axis=1)
    if per_atom:
        return E, Fnet, Fa
    return E, Fnet


def _axis_angle_rotate(coords, com, axis, angle):
    """Rotate [K,m,3] coords about per-candidate COM by per-candidate
    axis/angle (Rodrigues)."""
    rel = coords - com[:, None, :]
    c = jnp.cos(angle)[:, None, None]
    s = jnp.sin(angle)[:, None, None]
    ax = axis[:, None, :]
    cross = jnp.cross(jnp.broadcast_to(ax, rel.shape), rel)
    dot = jnp.sum(ax * rel, axis=-1, keepdims=True)
    rot = rel * c + cross * s + ax * dot * (1.0 - c)
    return com[:, None, :] + rot


def usher_search_subset_mol(cfg, sub: Subset, coords, mol_types, region,
                            mol_q=None, amask=None, energy_fn=None):
    """Molecule USHER: translation along the net force plus rotation about
    the COM along the torque, dtheta = min((E-etarget)/|tau|, dtheta0)
    (ref fix_obmd_merged.cpp:1586-1605).  The torque here is the physical
    all-atom sum tau = sum_a (x_a - com) x F_a — the reference's
    calc_torque keeps only the last atom and force-resets dtheta0
    (:1756-1770), a known bug we deliberately do not reproduce.
    Acceptance rule identical: E < etarget + eps; leaving the region
    rejects."""
    import jax
    u = cfg.obmd.usher
    dtheta0 = float(getattr(u, "dtheta0", 0.0) or 0.0)
    kk, mm = coords.shape[0], coords.shape[1]
    mt2 = (mol_types if mol_types.ndim == 2
           else jnp.broadcast_to(mol_types[None, :], (kk, mm)))
    am = (jnp.ones((kk, mm), bool) if amask is None
          else jnp.broadcast_to(amask, (kk, mm)))
    masses = jnp.where(am, jnp.asarray(cfg.masses, coords.dtype)[mt2],
                       0.0)                                     # [K, m]
    wsum = jnp.sum(masses, axis=1)                              # [K]

    if energy_fn is None:
        def energy_fn(pos):
            return mol_energy_force(cfg, sub, pos, mol_types,
                                    per_atom=True, mol_q=mol_q)

    def body(carry, _):
        pos, active, accepted, iters = carry
        E, F, Fa = energy_fn(pos)
        ok = E < u.etarget + EPSILON
        newly = active & ok
        fabs = jnp.sqrt(jnp.sum(F * F, axis=-1))
        degen = fabs < EPSILON
        ds_ovlp = u.dsovlp - (4.0 * u.eps / jnp.maximum(E, EPSILON)) ** (1.0 / 12.0)
        ds_norm = jnp.minimum((E - u.etarget) / jnp.maximum(fabs, EPSILON),
                              u.ds0)
        ds = jnp.where(E > u.uovlp, ds_ovlp, ds_norm)
        unit = F / jnp.maximum(fabs, EPSILON)[:, None]
        moved = pos + (unit * ds[:, None])[:, None, :]

        if dtheta0 > 0.0:
            com = (jnp.sum(masses[:, :, None] * moved, axis=1)
                   / wsum[:, None])
            tau = jnp.sum(jnp.cross(moved - com[:, None, :], Fa), axis=1)
            tabs = jnp.sqrt(jnp.sum(tau * tau, axis=-1))
            dth = jnp.minimum((E - u.etarget) / jnp.maximum(tabs, EPSILON),
                              dtheta0)
            axis = tau / jnp.maximum(tabs, EPSILON)[:, None]
            rotated = _axis_angle_rotate(moved, com, axis, dth)
            moved = jnp.where((tabs > EPSILON)[:, None, None], rotated,
                              moved)

        inside = jnp.all(region.match(moved) | ~am, axis=1)
        move_now = active & ~ok & ~degen
        pos = jnp.where(move_now[:, None, None], moved, pos)
        stopped = newly | (active & degen) | (move_now & ~inside)
        active = active & ~stopped
        accepted = accepted | newly
        iters = iters + active.astype(jnp.int32)
        return (pos, active, accepted, iters), None

    k = coords.shape[0]
    init = (coords, jnp.ones((k,), bool), jnp.zeros((k,), bool),
            jnp.zeros((k,), jnp.int32))
    (pos, active, accepted, iters), _ = jax.lax.scan(
        body, init, None, length=u.nattempt)
    E, _f, _fa = energy_fn(pos)
    accepted = accepted | (active & (E < u.etarget + EPSILON))
    return pos, accepted, iters


def near_check_subset_mol(cfg, sub: Subset, coords):
    """near-mode molecule check: every atom farther than `near` from every
    existing atom (ref :1036-1049 loops all template atoms)."""
    k, m, _ = coords.shape
    d = cfg.box.min_image(coords.reshape(k * m, 1, 3) - sub.x[None, :, :])
    rsq = jnp.sum(d * d, axis=-1)
    min_rsq = jnp.min(jnp.where(sub.valid[None, :], rsq, jnp.inf), axis=-1)
    return jnp.all(min_rsq.reshape(k, m) >= cfg.obmd.near ** 2, axis=1)


def mol_sequential_accept(cfg, coords, mol_types, ok, budget):
    """Greedy in-order acceptance with exact molecule-molecule energy
    visibility (the batched analogue of the reference's sequential
    insertion)."""
    import jax
    from ..config import DPDParams
    obmd = cfg.obmd
    k, m, _ = coords.shape
    # pairwise inter-candidate energies [K, K]
    d = cfg.box.min_image(coords[:, None, :, None, :] -
                          coords[None, :, None, :, :])   # [K,K,m,m,3]
    rsq = jnp.sum(d * d, axis=-1)
    p = cfg.pair
    if isinstance(p, DPDParams):
        a0 = float(np.asarray(p.a0)[0][0])
        cut = float(np.asarray(p.cut)[0][0])
        r = jnp.sqrt(rsq)
        wd = jnp.maximum(1.0 - r / cut, 0.0)
        epair = jnp.sum(0.5 * a0 * cut * wd * wd, axis=(2, 3))
    else:
        epair = jnp.where(jnp.any(rsq < cfg.pair.max_cut ** 2, axis=(2, 3)),
                          jnp.inf, 0.0)
    thresh = (obmd.usher.etarget if obmd.usher is not None
              else 0.0) + EPSILON

    def body(carry, kk):
        accepted, count = carry
        if obmd.near is not None:
            clash = jnp.any((epair[kk] > 0.0) & accepted)
        else:
            clash = jnp.sum(jnp.where(accepted, epair[kk], 0.0)) > thresh
        take = ok[kk] & ~clash & (count < budget)
        accepted = accepted.at[kk].set(take)
        return (accepted, count + take.astype(jnp.int32)), None

    (accepted, count), _ = jax.lax.scan(
        body, (jnp.zeros((k,), bool), jnp.zeros((), jnp.int32)),
        jnp.arange(k))
    return accepted, count


# --------------------------------------------------------------------------
# side-batched USHER: both buffers in one scan (halves the per-iteration
# launch overhead, which dominates at production sizes)
# --------------------------------------------------------------------------

def _batched_energy_force(pair, sub_x, sub_type, sub_valid, pos, cand_type,
                          sub_q=None, box=None):
    """conservative_energy_force over a leading side axis:
    sub_* [S,B,...], pos [S,K,3], cand_type [S,K] -> E [S,K], F [S,K,3]."""
    from ..config import DPDExtParams, DPDTstatParams
    dtype = pos.dtype
    d = pos[:, :, None, :] - sub_x[:, None, :, :]          # [S,K,B,3]
    if box is not None:
        d = box.min_image(d)
    rsq = jnp.sum(d * d, axis=-1)
    ok = sub_valid[:, None, :]

    if isinstance(pair, DPDTstatParams) or (
            isinstance(pair, DPDExtParams) and pair.tstat_only):
        return (jnp.zeros(pos.shape[:2], dtype),
                jnp.zeros_like(pos))
    if isinstance(pair, (DPDParams, DPDExtParams)):
        a0 = jnp.asarray(np.asarray(pair.a0), dtype)
        cut = jnp.asarray(np.asarray(pair.cut), dtype)
        if a0.shape == (1, 1):
            a0v, cutv = a0[0, 0], cut[0, 0]
        else:
            a0v = a0[cand_type[:, :, None], sub_type[:, None, :]]
            cutv = cut[cand_type[:, :, None], sub_type[:, None, :]]
        r = jnp.sqrt(rsq)
        rinv = jnp.where(r > 1e-10, 1.0 / jnp.maximum(r, 1e-10), 0.0)
        wd = 1.0 - r / cutv
        inr = ok & (rsq < cutv * cutv) & (r > 1e-10)
        e = jnp.where(inr, 0.5 * a0v * cutv * wd * wd, 0.0)
        fp = jnp.where(inr, a0v * wd * rinv, 0.0)
    else:
        from ..forces.pairs import make_pair_law
        pair_fn = make_pair_law(pair, 1.0, dtype)
        zero = jnp.zeros((), jnp.int32)
        kwargs = {}
        if isinstance(pair, LJCutRFParams):
            # ATOM-mode trial particles carry zero charge (inserted q=0)
            zq = (sub_q if sub_q is not None
                  else jnp.zeros(sub_x.shape[:2], dtype))
            kwargs = dict(qi=jnp.zeros(pos.shape[:2] + (1,), dtype),
                          qj=zq[:, None, :])
        fp, e = pair_fn(rsq, d, jnp.zeros_like(d),
                        cand_type[:, :, None], sub_type[:, None, :],
                        zero, zero, jnp.zeros((), jnp.uint32), **kwargs)
        fp = jnp.where(ok, fp, 0.0)
        e = jnp.where(ok, e, 0.0)
    E = jnp.sum(e, axis=-1)
    F = jnp.sum(fp[..., None] * d, axis=2)
    return E, F


def usher_search_subset_batch(cfg: SceneConfig, sub_l: Subset,
                              sub_r: Subset, cand_l, cand_r, cand_type,
                              region_l: RegionBlock, region_r: RegionBlock):
    """USHER over BOTH buffers in one scan: subsets stacked on a leading
    side axis, per-side region bounds as arrays.  Iteration math is
    identical to usher_search_subset run per side (masks broadcast), but
    the fixed per-iteration launch cost is paid once instead of twice.
    Returns (pos [2,K,3], accepted [2,K], iters [2,K])."""
    u = cfg.obmd.usher
    dtype = cand_l.dtype
    # slice-derived subsets can differ by a block: pad to a common B
    B = max(sub_l.x.shape[0], sub_r.x.shape[0])

    def padto(sub):
        b = sub.x.shape[0]
        if b == B:
            return sub
        pad = B - b
        return Subset(
            idx=jnp.concatenate([sub.idx,
                                 jnp.full((pad,), -1, jnp.int32)]),
            x=jnp.concatenate([sub.x, jnp.full((pad, 3), BIG, sub.x.dtype)]),
            type=jnp.concatenate([sub.type, jnp.zeros((pad,), jnp.int32)]),
            q=jnp.concatenate([sub.q, jnp.zeros((pad,), sub.q.dtype)]),
            valid=jnp.concatenate([sub.valid, jnp.zeros((pad,), bool)]),
            overflow=sub.overflow)

    sub_l, sub_r = padto(sub_l), padto(sub_r)
    sub_x = jnp.stack([sub_l.x, sub_r.x])                  # [2,B,3]
    sub_t = jnp.stack([sub_l.type, sub_r.type])
    sub_v = jnp.stack([sub_l.valid, sub_r.valid])
    sub_q = jnp.stack([sub_l.q, sub_r.q])
    pos0 = jnp.stack([cand_l, cand_r])                     # [2,K,3]
    ct = jnp.stack([cand_type, cand_type])                 # [2,K]
    lo = jnp.asarray([region_l.lo, region_r.lo], dtype)    # [2,3]
    hi = jnp.asarray([region_l.hi, region_r.hi], dtype)

    def inside(p):
        return jnp.all((p >= lo[:, None, :]) & (p <= hi[:, None, :]),
                       axis=-1)

    def body(carry, _):
        pos, active, accepted, iters = carry
        E, F = _batched_energy_force(cfg.pair, sub_x, sub_t, sub_v, pos,
                                     ct, sub_q, box=cfg.box)
        ok = E < u.etarget + EPSILON
        newly = active & ok
        fabs = jnp.sqrt(jnp.sum(F * F, axis=-1))
        degen = fabs < EPSILON
        ds_ovlp = u.dsovlp - (4.0 * u.eps
                              / jnp.maximum(E, EPSILON)) ** (1.0 / 12.0)
        ds_norm = jnp.minimum((E - u.etarget) / jnp.maximum(fabs, EPSILON),
                              u.ds0)
        ds = jnp.where(E > u.uovlp, ds_ovlp, ds_norm)
        unit = F / jnp.maximum(fabs, EPSILON)[..., None]
        moved = pos + unit * ds[..., None]
        ins = inside(moved)
        move_now = active & ~ok & ~degen
        pos = jnp.where(move_now[..., None], moved, pos)
        stopped = newly | (active & degen) | (move_now & ~ins)
        active = active & ~stopped
        accepted = accepted | newly
        iters = iters + active.astype(jnp.int32)
        return (pos, active, accepted, iters), None

    k = cand_l.shape[0]
    init = (pos0, jnp.ones((2, k), bool), jnp.zeros((2, k), bool),
            jnp.zeros((2, k), jnp.int32))
    (pos, active, accepted, iters), _ = jax.lax.scan(
        body, init, None, length=u.nattempt)
    E, _ = _batched_energy_force(cfg.pair, sub_x, sub_t, sub_v, pos, ct,
                                 sub_q, box=cfg.box)
    accepted = accepted | (active & (E < u.etarget + EPSILON))
    return pos, accepted, iters
