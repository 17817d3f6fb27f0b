"""The OBMD open-boundary stage: deletion, feedback insertion (near/USHER),
momentum accounting, and external boundary-force distribution.

TPU-native rebuild of FixObmdMerged (reference:
code/src/OBMD/fix_obmd_merged.cpp).  The stage splits exactly like the
reference's fix hooks:

  * `pre_exchange`  (ref :550-633)  — delete escapees + tally momentum,
    census the buffers, feedback law, batched insertion, boundary-force
    setpoints for this step.
  * `apply_boundary_force` (ref :1229-1240 post_force) — distribute the
    setpoint forces over buffer atoms with smooth (normal) / Heaviside
    (shear) weights.

Deviations from the reference (deliberate; see SURVEY.md §2.1 quirks):
  * USHER runs batched over K candidates with masked convergence instead of
    sequentially with 3 MPI_Allreduce per iteration (ref :1531-1563); the
    acceptance rule (E < etarget + eps, reject on leaving the region) is
    preserved, including visibility of earlier accepted candidates through a
    sequential post-acceptance energy correction.
  * The pressure-wave phase uses an explicitly checkpointed sim_time.
  * `center_of_mass` y/z swap and `calc_torque` last-atom bug (ref
    :1716-1770) are NOT reproduced.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import rng
from ..cells import BIG, GridSpec
from ..config import SceneConfig, eval_param
from ..forces.pairs import trial_energy_force
from ..state import State, per_atom_mass

EPSILON = 1.0e-6  # reference EPSILON (fix_obmd_merged.cpp:62)


# --------------------------------------------------------------------------
# deletion (ref try_deleting :639-865)
# --------------------------------------------------------------------------

def delete_outside(cfg: SceneConfig, state: State):
    """Delete every atom beyond the open x faces; tally sum(m v) by side.

    The reference deletes candidates in random global order but always
    deletes *all* of them (the while loop drains nall, :688-701), so the
    random order is irrelevant to the result: a masked sweep is exact.
    Side attribution follows ref :827-833: left if x < (boxlo+boxhi)/2.
    """
    box = cfg.box
    x0 = state.x[:, 0]
    doomed = state.alive & ((x0 < box.lo[0]) | (x0 > box.hi[0]))
    if cfg.obmd is not None and cfg.obmd.mol is not None:
        # MOLECULE mode deletes the whole molecule when any atom escapes
        # (ref :709-821).  Propagate doom along bond-partner SLOTS —
        # natoms-1 rounds covers any chain topology exactly (round-1
        # Weak #6: a fixed 3-round cap under-deleted longer chains).
        n = state.capacity
        rounds = max(cfg.obmd.mol_natoms_max - 1, 1)
        for _ in range(rounds):
            for partner in state.bond_partners:
                ps = jnp.clip(partner, 0, n - 1)
                pd = (partner >= 0) & doomed[ps]
                doomed = doomed | (state.alive & pd)
    mid = 0.5 * (box.lo[0] + box.hi[0])
    left = doomed & (x0 < mid)
    right = doomed & ~left

    m = per_atom_mass(cfg, state)
    mv = m[:, None] * state.v
    vnewl = jnp.sum(jnp.where(left[:, None], mv, 0.0), axis=0)
    vnewr = jnp.sum(jnp.where(right[:, None], mv, 0.0), axis=0)
    ndel = jnp.sum(doomed.astype(jnp.int32))

    state = state.replace(
        alive=state.alive & ~doomed,
        tag=jnp.where(doomed, -1, state.tag),
        # dead slots keep v == 0 as an invariant (layout_build/relayout
        # fill freed slots with 0 too), so at-rest insertion can reuse a
        # slot without a velocity scatter (engine_cellpad._insert)
        v=jnp.where(doomed[:, None], 0.0, state.v),
        obmd=state.obmd.replace(ndeleted=state.obmd.ndeleted + ndel),
    )
    return state, vnewl, vnewr


# --------------------------------------------------------------------------
# buffer census + feedback law (ref :582-589; group.cpp:793 count)
# --------------------------------------------------------------------------

def region_count(state: State, region, group_types=None) -> jnp.ndarray:
    m = state.alive & region.match(state.x)
    if group_types is not None:
        gm = jnp.zeros_like(m)
        for t in group_types:
            gm = gm | (state.type == int(t))
        m = m & gm
    return jnp.sum(m.astype(jnp.int32))


def feedback_count(cnt, mol_len, alpha, nbuf, dt, tau):
    """ninsert = -(int)((cnt/mol_len - alpha*nbuf) * dt/tau), C truncation
    toward zero (ref :586-589).  The reference computes in f64; in f32 a
    result that lands exactly on an integer can come out a hair below it, so
    nudge by 5 ulp-relative before truncating."""
    val = (cnt.astype(jnp.float32) / mol_len - alpha * nbuf) * dt / tau
    raw = -val
    adj = raw * (1.0 + 5.0e-6)
    return jnp.trunc(adj).astype(jnp.int32)


# --------------------------------------------------------------------------
# insertion (ref try_inserting :869-1225; usher :1518-1616)
# --------------------------------------------------------------------------

def _usher_search(cfg: SceneConfig, spec: GridSpec, ctab, state: State,
                  cand_x: jnp.ndarray, cand_type: jnp.ndarray, region):
    """Vectorized USHER: iterate all K candidates together with masked
    convergence.  Per-candidate semantics match ref :1531-1611 for ATOM mode:

      E < etarget + eps            -> accept, stop
      E > uovlp                    -> ds = dsovlp - (4 eps / E)^(1/12)
      else                         -> ds = min((E - etarget)/|F|, ds0)
      move along F/|F| by ds; leaving the insertion region -> reject, stop
      |F| < eps                    -> reject, stop (the reference spins
                                      forever on this degenerate case)

    Returns (final positions [K,3], accepted [K], iters_used [K]).
    """
    u = cfg.obmd.usher
    dtype = state.dtype

    def body(carry, _):
        pos, active, accepted, iters = carry
        E, F = trial_energy_force(cfg.pair, cfg.box, spec, ctab,
                                  state.x, state.type, state.q,
                                  pos, cand_type)
        ok = E < u.etarget + EPSILON
        newly_accepted = active & ok
        fabs = jnp.sqrt(jnp.sum(F * F, axis=-1))
        degenerate = fabs < EPSILON

        ds_ovlp = u.dsovlp - (4.0 * u.eps / jnp.maximum(E, EPSILON)) ** (1.0 / 12.0)
        ds_norm = jnp.minimum((E - u.etarget) / jnp.maximum(fabs, EPSILON), u.ds0)
        ds = jnp.where(E > u.uovlp, ds_ovlp, ds_norm)
        unit = F / jnp.maximum(fabs, EPSILON)[:, None]
        moved = pos + unit * ds[:, None]

        inside = region.match(moved)
        move_now = active & ~ok & ~degenerate
        pos = jnp.where(move_now[:, None], moved, pos)
        # stop when: accepted, degenerate force, or stepped out of region
        stopped = newly_accepted | (active & degenerate) | (move_now & ~inside)
        active = active & ~stopped
        accepted = accepted | newly_accepted
        iters = iters + active.astype(jnp.int32)
        return (pos, active, accepted, iters), None

    k = cand_x.shape[0]
    init = (cand_x, jnp.ones((k,), bool), jnp.zeros((k,), bool),
            jnp.zeros((k,), jnp.int32))
    (pos, active, accepted, iters), _ = jax.lax.scan(body, init, None,
                                                     length=u.nattempt)
    # Post-loop check (ref :1057: accept iff final E < etarget + eps) for
    # candidates that used up all iterations.
    E, _ = trial_energy_force(cfg.pair, cfg.box, spec, ctab,
                              state.x, state.type, state.q, pos, cand_type)
    accepted = accepted | (active & (E < u.etarget + EPSILON))
    return pos, accepted, iters, E


def _near_check(cfg: SceneConfig, spec: GridSpec, ctab, state: State,
                cand_x: jnp.ndarray, cand_type: jnp.ndarray):
    """`near` insertion test (ref :1036-1049): reject a candidate if any
    existing atom lies within `near` distance."""
    E, F = trial_energy_force(cfg.pair, cfg.box, spec, ctab,
                              state.x, state.type, state.q, cand_x, cand_type)
    # distance check via a dedicated sweep: reuse energy machinery by
    # computing min distance. Cheaper: direct gather here.
    from ..cells import BIG, gather_padded
    dtype = state.dtype
    dims = spec.dims
    n_cells = spec.n_cells
    lo = jnp.asarray(spec.lo, dtype=dtype)
    cs = jnp.asarray(spec.cell_size, dtype=dtype)
    nd = jnp.asarray(dims, dtype=jnp.int32)
    cc = jnp.clip(jnp.floor((cand_x - lo) / cs).astype(jnp.int32), 0, nd - 1)
    offs = jnp.asarray([(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1)
                        for c in (-1, 0, 1)], dtype=jnp.int32)
    nb = cc[:, None, :] + offs[None, :, :]
    per = jnp.asarray(spec.periodic)
    nb_ok = jnp.all(jnp.where(per, True, (nb >= 0) & (nb < nd)), axis=-1)
    nb = jnp.where(per, jnp.mod(nb, nd), nb)
    lin = (nb[..., 0] * dims[1] + nb[..., 1]) * dims[2] + nb[..., 2]
    lin = jnp.where(nb_ok, lin, n_cells)
    jdx = ctab.table[lin].reshape(cand_x.shape[0], -1)
    xj = gather_padded(state.x, jdx, BIG)
    d = cfg.box.min_image(cand_x[:, None, :] - xj)
    rsq = jnp.sum(d * d, axis=-1)
    min_rsq = jnp.min(jnp.where(xj[..., 0] < BIG * 0.5, rsq, jnp.inf), axis=-1)
    ok = min_rsq >= cfg.obmd.near ** 2
    return ok, E


def _sequential_accept(cfg: SceneConfig, cand_x, cand_type, cand_ok, budget):
    """Greedy in-order acceptance with candidate-candidate visibility.

    The reference inserts sequentially, so candidate k's energy scan sees
    candidates 0..k-1 already inserted (ref :914 loop).  Batched USHER loses
    that; we restore the acceptance criterion exactly by re-checking, in
    candidate order, that the extra energy from previously-accepted
    candidates keeps E below etarget (USHER) / distance above `near`.
    """
    from ..config import DPDParams
    obmd = cfg.obmd
    k = cand_x.shape[0]
    d = cfg.box.min_image(cand_x[:, None, :] - cand_x[None, :, :])
    rsq = jnp.sum(d * d, axis=-1)

    if obmd.near is not None:
        conflict = rsq < obmd.near ** 2          # [K,K]
    else:
        # pair energy between candidates vs the etarget slack: conservative
        # criterion — candidate k conflicts with j if their pair energy alone
        # exceeds the etarget margin.  For DPD the conservative pair energy
        # is 0.5 a0 rc wd^2.
        p = cfg.pair
        from ..config import DPDExtParams
        if isinstance(p, DPDExtParams) and p.tstat_only:
            # no conservative energy: candidates never conflict
            epair = jnp.zeros_like(rsq)
        elif isinstance(p, (DPDParams, DPDExtParams)):
            import numpy as np
            a0 = jnp.asarray(np.asarray(p.a0))[cand_type[:, None], cand_type[None, :]]
            cut = jnp.asarray(np.asarray(p.cut))[cand_type[:, None], cand_type[None, :]]
            r = jnp.sqrt(rsq)
            wd = jnp.maximum(1.0 - r / cut, 0.0)
            epair = 0.5 * a0 * cut * wd * wd
        else:
            # LJ-family: use distance where U(r) = etarget as the conflict
            # radius — conservative fallback.
            epair = jnp.where(rsq < cfg.pair.max_cut ** 2, jnp.inf, 0.0)
        conflict = epair > obmd.usher.etarget + EPSILON

    eye = jnp.eye(k, dtype=bool)
    conflict = conflict & ~eye

    # trace-time unrolled greedy loop: K is small and static, and an
    # unrolled chain of [K]-vector ops fuses into a handful of kernels,
    # where a lax.scan pays ~17us launch overhead per element
    accepted = jnp.zeros((k,), bool)
    count = jnp.zeros((), jnp.int32)
    for kk in range(k):
        clash = jnp.any(conflict[kk] & accepted)
        take = cand_ok[kk] & ~clash & (count < budget)
        accepted = accepted.at[kk].set(take)
        count = count + take.astype(jnp.int32)
    return accepted, count


def draw_candidates(cfg: SceneConfig, k_key, region, K: int, dtype,
                    state: State = None, axis_name: str = None):
    """Candidate positions + initial validity: uniform in the insertion
    region (ref :921-927) or, with the `gaussian` keyword, normal draws
    around a point (ref :930-932) — gaussian draws landing outside the
    insertion region are invalid.  The fix-deposit `rate` / `global` /
    `local` keywords then adjust the z coordinate (ref :880, :947-985).
    Under the slab decomposition `axis_name` completes the z-max scan with
    a pmax so every device draws identical candidates."""
    obmd = cfg.obmd
    if obmd.gaussian is not None:
        xm, ym, zm, sg = (float(v) for v in obmd.gaussian)
        g = jax.random.normal(k_key, (K, 3), dtype=dtype)
        mid = jnp.asarray([xm, ym, zm], dtype=dtype)
        cand = mid + jnp.asarray(sg, dtype) * g
        ok = region.match(cand)
    else:
        u = jax.random.uniform(k_key, (K, 3), dtype=dtype)
        cand = region.sample_uniform(u)
        ok = jnp.ones((K,), bool)
    if (obmd.rate is not None or obmd.deposit_global is not None
            or obmd.deposit_local is not None):
        if state is None:
            raise ValueError("deposit z keywords need the state at the "
                             "candidate draw site")
        sdt = jnp.dtype(dtype).type    # scalar ctor (dtype may be either)
        z = cand[:, 2]
        if obmd.rate is not None:
            # ref :880: offset = elapsed time * rate (fix start = t 0)
            z = z + sdt(obmd.rate) * state.sim_time
        dep = obmd.deposit_global or obmd.deposit_local
        if dep is not None:
            lo, hi = float(dep[0]), float(dep[1])
            zs = state.x[:, 2]
            sel = state.alive
            if obmd.deposit_local is not None:
                delta = float(obmd.deposit_local[2])
                d = cfg.box.min_image(cand[:, None, :] - state.x[None, :, :])
                lat2 = d[..., 0] ** 2 + d[..., 1] ** 2
                sel = sel[None, :] & (lat2 <= sdt(delta * delta))
                zmax = jnp.max(jnp.where(sel, zs[None, :],
                                         sdt(cfg.box.lo[2])), axis=1)
            else:
                zmax = jnp.max(jnp.where(sel, zs, sdt(cfg.box.lo[2])))
            if axis_name is not None:
                zmax = jax.lax.pmax(zmax, axis_name)
            uz = jax.random.uniform(jax.random.fold_in(k_key, 0x5a), (K,),
                                    dtype=dtype)
            z = zmax + sdt(lo) + uz * sdt(hi - lo)
        cand = jnp.concatenate([cand[:, :2], z[:, None]], axis=1)
    return cand, ok


def draw_inserted_velocities(cfg: SceneConfig, key, pos, dtype):
    """Inserted-particle velocities for K candidates at positions `pos`:
    uniform per-component draws from the `vx/vy/vz lo hi` keywords
    (fix-deposit semantics, ref parsing :2118-2130), then the optional
    `target tx ty tz` redirection that points each velocity at the target
    preserving its magnitude (ref :1081-1093).  With no keywords set this
    returns None (= insert at rest, the reference's hardcoded behavior at
    :1076-1078)."""
    obmd = cfg.obmd
    if obmd.vx is None and obmd.vy is None and obmd.vz is None:
        return None
    dtype = np.dtype(dtype).type          # accept dtype objects and scalar types
    k = pos.shape[0]
    cols = []
    for rng_key, rng_range in zip(jax.random.split(key, 3),
                                  (obmd.vx, obmd.vy, obmd.vz)):
        if rng_range is None:
            cols.append(jnp.zeros((k,), dtype))
        else:
            lo, hi = (dtype(rng_range[0]), dtype(rng_range[1]))
            cols.append(jax.random.uniform(rng_key, (k,), dtype=dtype,
                                           minval=lo, maxval=hi))
    v = jnp.stack(cols, axis=1)                       # [K,3]
    if obmd.target is not None:
        tgt = jnp.asarray(obmd.target, dtype)
        vel = jnp.sqrt(jnp.sum(v * v, axis=1))
        d = tgt[None, :] - pos
        rsq = jnp.sum(d * d, axis=1)
        rinv = jnp.where(rsq > 0.0, 1.0 / jnp.sqrt(jnp.maximum(rsq, 1e-30)),
                         0.0)
        v = jnp.where((rsq > 0.0)[:, None], d * (rinv * vel)[:, None], v)
    return v


def insertion_tag_base(cfg: SceneConfig, state: State):
    """`id next` counts up from the running maximum (never reuses ids);
    `id max` recomputes the max over alive atoms each stage call (ref
    find_maxid :1860-1868), reusing ids freed by deletion."""
    if cfg.obmd.id_policy == "max":
        return jnp.max(jnp.where(state.alive, state.tag, 0))
    return state.maxtag


def rounds_of(cfg: SceneConfig) -> int:
    """Candidate rounds per stage call: the reference wraps each needed
    insertion in up to `maxattempt` fresh-draw attempts
    (fix_obmd_merged.cpp:913-935); here each round is a fresh batch of K
    candidates, taken while the budget lasts."""
    return max(1, int(cfg.obmd.maxattempt))


def _append_subset(sub, pos, acc, ctype, q, n):
    """Make this round's accepted candidates visible to later rounds'
    energy/distance checks (the reference inserts sequentially, so attempt
    m sees insertions 0..m-1)."""
    from .subset import Subset
    K = pos.shape[0]
    return Subset(
        idx=jnp.concatenate([sub.idx,
                             jnp.full((K,), n, jnp.int32)]),
        x=jnp.concatenate([sub.x, jnp.where(acc[:, None], pos, BIG)]),
        type=jnp.concatenate([sub.type, ctype]),
        q=jnp.concatenate([sub.q, q]),
        valid=jnp.concatenate([sub.valid, acc]),
        overflow=sub.overflow)


def insert_particles_subset(cfg: SceneConfig, state: State,
                            ninsert_left, ninsert_right, sub_l, sub_r):
    """Batched replacement for try_inserting on both buffers (ATOM mode).

    Per round (`maxattempt` rounds, ref :913-935): draw K candidates
    uniformly in each insertion region (ref :921-927), steer/test them
    brute-force against the per-buffer subset (USHER :1052 / near :1036 —
    zero gathers per iteration), accept greedily within the remaining
    feedback budget.  Earlier rounds' acceptances are appended to the
    subset so later rounds see them.  Accepted candidates land in free
    slots with v = 0 (ref :1076-1078) and fresh tags (ref :1119).

    Returns (state, new_slots [2*rounds*K]: left block then right block,
    capacity n marking unused rows)."""
    from .subset import near_check_subset, usher_search_subset

    obmd = cfg.obmd
    dtype = state.dtype
    K = obmd.insert_kmax
    n = state.capacity
    rounds = rounds_of(cfg)
    M = rounds * K

    key = rng.fold_key(state.key, state.step)
    keys = jax.random.split(key, 2 * rounds + 1)
    knext = keys[-1]

    def one_side(side_keys, region, budget, sub):
        ctype = jnp.full((K,), obmd.ntype, jnp.int32)
        zq = jnp.zeros((K,), dtype)
        rem = jnp.clip(budget, 0, M)
        poss, accs = [], []
        iters_sum = jnp.zeros((), jnp.int32)
        for r in range(rounds):
            cand, ok0 = draw_candidates(cfg, side_keys[r], region, K,
                                        dtype, state=state)
            if obmd.usher is not None:
                pos, ok, iters = usher_search_subset(cfg, sub, cand, ctype,
                                                     region)
            else:
                ok = near_check_subset(cfg, sub, cand)
                pos, iters = cand, jnp.zeros((K,), jnp.int32)
            accepted, count = _sequential_accept(cfg, pos, ctype, ok & ok0,
                                                 jnp.minimum(rem, K))
            rem = rem - count
            if rounds > 1:
                sub = _append_subset(sub, pos, accepted, ctype, zq, n)
            poss.append(pos)
            accs.append(accepted)
            iters_sum = iters_sum + jnp.sum(iters)
        return (jnp.concatenate(poss), jnp.concatenate(accs), iters_sum)

    pos_l, acc_l, it_l = one_side(keys[:rounds], obmd.region5,
                                  ninsert_left, sub_l)
    pos_r, acc_r, it_r = one_side(keys[rounds:2 * rounds], obmd.region6,
                                  ninsert_right, sub_r)

    pos = jnp.concatenate([pos_l, pos_r], axis=0)        # [2M,3]
    accepted = jnp.concatenate([acc_l, acc_r], axis=0)   # [2M]

    # Free-slot allocation: the j-th accepted candidate takes the j-th free
    # slot.  nonzero(size=) keeps shapes static.
    free = jnp.nonzero(~state.alive, size=2 * M, fill_value=n)[0]
    order = jnp.cumsum(accepted.astype(jnp.int32)) - 1   # rank among accepted
    slot = jnp.where(accepted, free[jnp.clip(order, 0, 2 * M - 1)], n)
    landed = accepted & (slot < n)                       # capacity overflow
    base = insertion_tag_base(cfg, state)
    new_tag = base + 1 + order.astype(jnp.int32)

    kv = jax.random.fold_in(key, 7)
    vnew = draw_inserted_velocities(cfg, kv, pos, dtype)
    if vnew is None:
        vnew = jnp.zeros((2 * M, 3), dtype)
        pins_l = pins_r = jnp.zeros((3,), dtype)
    else:
        mass_ins = jnp.asarray(cfg.masses, dtype)[obmd.ntype]
        mv = mass_ins * jnp.where(landed[:, None], vnew, 0.0)
        pins_l = jnp.sum(mv[:M], axis=0)
        pins_r = jnp.sum(mv[M:], axis=0)
    x = state.x.at[slot].set(pos, mode="drop")
    v = state.v.at[slot].set(vnew, mode="drop")
    f = state.f.at[slot].set(jnp.zeros((2 * M, 3), dtype), mode="drop")
    typ = state.type.at[slot].set(jnp.full((2 * M,), obmd.ntype, jnp.int32),
                                  mode="drop")
    tag = state.tag.at[slot].set(new_tag, mode="drop")
    qn = state.q.at[slot].set(jnp.zeros((2 * M,), dtype), mode="drop")
    moln = state.mol.at[slot].set(jnp.zeros((2 * M,), jnp.int32), mode="drop")
    lam = state.lambdaF.at[slot].set(jnp.zeros((2 * M,), dtype), mode="drop")
    cms = state.cms_mol.at[slot].set(jnp.zeros((2 * M, 3), dtype),
                                     mode="drop")
    vcms = state.vcms_mol.at[slot].set(jnp.zeros((2 * M, 3), dtype),
                                       mode="drop")
    rep = state.rep_atom.at[slot].set(jnp.zeros((2 * M,), jnp.int32),
                                      mode="drop")
    nb1 = state.bond1.at[slot].set(jnp.full((2 * M,), -1, jnp.int32),
                                   mode="drop")
    nb2 = state.bond2.at[slot].set(jnp.full((2 * M,), -1, jnp.int32),
                                   mode="drop")
    alive = state.alive.at[slot].set(True, mode="drop")

    n_landed = jnp.sum(landed.astype(jnp.int32))
    want = jnp.clip(ninsert_left, 0) + jnp.clip(ninsert_right, 0)
    fails = jnp.maximum(want - n_landed, 0)

    state = state.replace(
        x=x, v=v, f=f, type=typ, tag=tag, q=qn, mol=moln, alive=alive,
        lambdaF=lam, cms_mol=cms, vcms_mol=vcms, rep_atom=rep,
        bond1=nb1, bond2=nb2,
        maxtag=base + n_landed, key=knext,
        obmd=state.obmd.replace(
            ninserted=state.obmd.ninserted + n_landed,
            insert_fail=state.obmd.insert_fail + fails,
            usher_iters=state.obmd.usher_iters + it_l + it_r))
    # Inserted momentum by side (zero unless vx/vy/vz keywords are set —
    # the reference adds a literal zero at :1183-1197).
    new_slots = jnp.where(landed, slot, n)
    return state, new_slots, pins_l, pins_r


# --------------------------------------------------------------------------
# the full pre-exchange stage (ref :550-633)
# --------------------------------------------------------------------------

def pre_exchange(cfg: SceneConfig, spec: GridSpec, state: State,
                 return_new_slots: bool = False):
    obmd = cfg.obmd
    box = cfg.box
    dtype = state.dtype.type
    dt = dtype(cfg.dt)
    t = state.sim_time

    # equal-style-variable analogues, re-evaluated now (ref :563-572)
    pxx = eval_param(obmd.pxx, t)
    pxy = eval_param(obmd.pxy, t)
    pxz = eval_param(obmd.pxz, t)
    dpxx = eval_param(obmd.dpxx, t)
    freq = eval_param(obmd.freq, t)
    alpha = eval_param(obmd.alpha, t)
    tau = eval_param(obmd.tau, t)
    nbuf = eval_param(obmd.nbuf, t)

    state, vnewl, vnewr = delete_outside(cfg, state)

    cnt_left = region_count(state, obmd.region1, obmd.group_types)
    cnt_right = region_count(state, obmd.region2, obmd.group_types)
    nins_l = feedback_count(cnt_left, obmd.mol_len, alpha, nbuf, dt, tau)
    nins_r = feedback_count(cnt_right, obmd.mol_len, alpha, nbuf, dt, tau)

    from .subset import region_subset
    b_max = cfg.capacity.insert_region_max or (cfg.capacity.n_max // 2)
    pad = cfg.pair.max_cut + cfg.skin
    sub_l = region_subset(cfg, state, obmd.region5, pad, b_max)
    sub_r = region_subset(cfg, state, obmd.region6, pad, b_max)
    state, new_slots, pins_l, pins_r = insert_particles_subset(
        cfg, state, nins_l, nins_r, sub_l, sub_r)

    # second deletion pass (ref :596-597) — relevant once molecules can
    # straddle the boundary; harmless for atoms.
    state, vnewl2, vnewr2 = delete_outside(cfg, state)
    vnewl = vnewl + vnewl2 - pins_l
    vnewr = vnewr + vnewr2 - pins_r

    area = dtype(box.cross_area)
    sim_time = t + dt                              # ref :612 (per stage call)
    factor = pxx + dpxx * jnp.sin(2.0 * jnp.pi * freq * sim_time)

    mfl = jnp.stack([vnewl[0] / dt + factor * area, vnewl[1] / dt, vnewl[2] / dt])
    mfr = jnp.stack([vnewr[0] / dt - pxx * area, vnewr[1] / dt, vnewr[2] / dt])
    sfl = jnp.stack([dtype(0.0) * area, pxy * area, pxz * area])
    sfr = -sfl

    arr_dtype = state.x.dtype
    state = state.replace(
        sim_time=sim_time,
        obmd=state.obmd.replace(
            momentum_force_left=mfl.astype(arr_dtype),
            momentum_force_right=mfr.astype(arr_dtype),
            shear_force_left=sfl.astype(arr_dtype),
            shear_force_right=sfr.astype(arr_dtype),
        ),
    )
    if return_new_slots:
        return state, new_slots
    return state


# --------------------------------------------------------------------------
# boundary-force distribution (ref post_force :1229-1240, weights :1244-1380,
# application :1385-1516)
# --------------------------------------------------------------------------

def smooth_weight(cfg: SceneConfig, x0: jnp.ndarray, mass: jnp.ndarray):
    """g_par weight (ref g_par_local_charged :1312-1340): plateau `m` deep in
    the buffer, half-cosine rolloff of width g_fac*buffer near the inner
    edge; zero in the ROI."""
    obmd = cfg.obmd
    box = cfg.box
    lower, upper = box.lo[0], box.hi[0]
    b = obmd.buffer_size
    gf = obmd.g_fac
    pi = jnp.pi

    in_left = x0 < lower + b
    left_plateau = x0 < lower + (1.0 - gf) * b
    carg_l = (1.0 / gf) * pi * (x0 - b - lower) / (-b) - pi
    g_left = jnp.where(left_plateau, mass, 0.5 * (1.0 + jnp.cos(carg_l)) * mass)

    in_right = x0 > upper - b
    right_plateau = x0 > upper - (1.0 - gf) * b
    carg_r = (1.0 / gf) * pi * (x0 - upper + b) / b - pi
    g_right = jnp.where(right_plateau, mass, 0.5 * (1.0 + jnp.cos(carg_r)) * mass)

    return jnp.where(in_left, g_left, jnp.where(in_right, g_right, 0.0))


def apply_boundary_force(cfg: SceneConfig, state: State,
                         f: jnp.ndarray) -> jnp.ndarray:
    """Distribute the stage's setpoint forces over buffer atoms:
    f_i += F * g_i / sum(g)  (ref :1414-1428), Heaviside mass weights for the
    shear sub-regions (ref :1452-1516).  The smooth weight profile is one
    piecewise function of x covering BOTH buffers — computed once and
    masked per region, and the four scaled adds are accumulated into one
    [N,3] update (fewer full-array passes)."""
    obmd = cfg.obmd
    m = per_atom_mass(cfg, state)
    x0 = state.x[:, 0]
    sc = state.obmd
    g_smooth = smooth_weight(cfg, x0, m)

    scale_rows = []
    force_rows = []
    for region, F, smooth in (
            (obmd.region1, sc.momentum_force_left, True),
            (obmd.region2, sc.momentum_force_right, True),
            (obmd.region3, sc.shear_force_left, False),
            (obmd.region4, sc.shear_force_right, False)):
        if region is None:
            # missing shear sub-region = the zero-extent case (config
            # guarantees pxy = pxz = 0, so the shear force is zero too)
            continue
        member = state.alive & region.match(state.x)
        g = jnp.where(member, g_smooth if smooth else m, 0.0)
        gsum = jnp.sum(g)
        scale_rows.append(jnp.where(gsum > 0.0,
                                    g / jnp.maximum(gsum, 1e-30), 0.0))
        force_rows.append(F)
    # NOTE: accumulate elementwise on purpose.  `scales @ forces` lowers to
    # the MXU whose default f32 matmul rounds inputs to bfloat16 (~4e-3
    # relative); with |F| ~ pxx*A ~ 2.4e4 that applied each side's total as
    # F*(1 +- 1e-3) — a persistent O(30) phantom net force that drove the
    # round-2 long-horizon leftward wind / density drift (the momentum law
    # must conserve sum(f) = sum(mf) exactly; see tests/test_conservation.py).
    df = jnp.zeros_like(f)
    for scale, F in zip(scale_rows, force_rows):
        df = df + scale[:, None] * F
    return f + df
