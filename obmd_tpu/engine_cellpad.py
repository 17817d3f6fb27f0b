"""The cellpad engine: fused step over the padded cell-major layout with the
Pallas DPD force kernel.  Fast path for the flagship OBMD_DPD workload
(single-type DPD, open x).  Step order mirrors Verlet::run exactly like
integrate.make_step (SURVEY.md §3.2)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import rng
from .cellpad import (PadAux, layout_build, maybe_rebuild, note_skin_check,
                      place_insertions, relayout_incremental, scatter_rows,
                      slab_slice_bounds)
from .cells import BIG
from .config import DPDParams, LJCutParams, SceneConfig, eval_param
from .forces.pallas_dpd import PadGeometry, make_pair_kernel
from .obmd.stage import (_sequential_accept, apply_boundary_force,
                         delete_outside, feedback_count, region_count)
from .obmd.subset import (Subset, expand_region, near_check_subset,
                          usher_search_subset)
from .state import State, per_atom_mass

PURPOSE_PAIR_NOISE = 1


def supports(cfg: SceneConfig) -> bool:
    """DPD / LJ / LJ+reaction-field, up to 4 atom types (per-pair
    coefficients blend in-kernel with T^2 one-hot selects; beyond that the
    XLA paths win).  Periodic x is supported only without the OBMD stage
    (open boundaries require open x by definition)."""
    from .config import LJCutRFParams
    if cfg.ntypes > 4:
        return False
    if not isinstance(cfg.pair, (DPDParams, LJCutParams, LJCutRFParams)):
        return False
    if cfg.box.periodic[0] and cfg.obmd is not None:
        return False
    try:
        PadGeometry.create(cfg.box, cfg.pair.max_cut + cfg.skin,
                           cfg.capacity.cell_capacity)
    except (ValueError, NotImplementedError):
        return False
    return True


def make_geometry(cfg: SceneConfig) -> PadGeometry:
    return PadGeometry.create(cfg.box, cfg.pair.max_cut + cfg.skin,
                              cfg.capacity.cell_capacity)


def relayout_flags(cfg: SceneConfig) -> dict:
    """Which optional per-atom fields must follow relayout row-moves.
    A field whose value is globally constant for the scene (single type,
    no charges, no molecules, no bonds) can skip its move ops entirely —
    each scatter/gather has a large fixed per-op cost on TPU.  The deck
    front end overrides via SceneConfig.per_atom_charge / per_atom_mol
    (atom_style can introduce per-atom values the physics config alone
    cannot see, e.g. charges in a data file under a neutral pair style)."""
    from .config import LJCutRFParams
    mol_mode = cfg.obmd is not None and cfg.obmd.mol is not None
    has_bonds = (cfg.bond is not None or mol_mode
                 or cfg.shake is not None or cfg.rigid)
    has_mol = (has_bonds or cfg.angle is not None
               or cfg.dihedral is not None)
    if cfg.per_atom_mol is not None:
        has_mol = has_mol or cfg.per_atom_mol
    has_charge = isinstance(cfg.pair, LJCutRFParams) or mol_mode
    if cfg.per_atom_charge is not None:
        has_charge = has_charge or cfg.per_atom_charge
    return dict(has_bonds=has_bonds, has_mol=has_mol,
                has_charge=has_charge, has_types=cfg.ntypes > 1)


def _make_kernel(cfg: SceneConfig, geom: PadGeometry):
    return make_pair_kernel(geom, params=cfg.pair, dt=cfg.dt,
                            exclude_bonded=cfg.bond is not None,
                            n_excl=4 if cfg.branched_topology else 2)


def _n_channels(cfg: SceneConfig) -> int:
    from .config import LJCutRFParams
    return 6 + (1 if isinstance(cfg.pair, LJCutRFParams) else 0) \
        + (1 if cfg.ntypes > 1 else 0)


def _forces(cfg, geom, kern, state: State):
    """Pair + boundary forces.  jax.named_scope phases mirror the reference
    Timer categories (verlet.cpp:257-350: PAIR / MODIFY) for profiler
    traces."""
    from .config import LJCutRFParams
    nb, cap, lanes = geom.n_blocks, geom.cap, geom.lanes
    a3 = state.alive[:, None]
    xm = jnp.where(a3, state.x, BIG).astype(jnp.float32)
    chans = [xm, state.v.astype(jnp.float32)]
    if isinstance(cfg.pair, LJCutRFParams):
        chans.append(state.q.astype(jnp.float32)[:, None])
    if cfg.ntypes > 1:
        chans.append(state.type.astype(jnp.float32)[:, None])
    nf = _n_channels(cfg)
    fld = jnp.concatenate(chans, axis=1)                     # [N, NF]
    fld = fld.reshape(nb, cap, lanes, nf).transpose(0, 3, 1, 2)
    salt = rng.step_salt(getattr(cfg.pair, "seed", 0), state.step, PURPOSE_PAIR_NOISE)
    aux = state.nbrs
    if isinstance(aux, PadAux) and aux.tag3d is not None:
        # epoch caches: the per-step [N] -> (nb, cap, lanes) retile is a
        # pathological minor-dim shuffle (~0.5 ms EACH at 94k atoms);
        # relayout rebuilds these, insertions patch them in place
        tag = aux.tag3d
        occ = aux.occ
    else:
        tag = state.tag.reshape(nb, cap, lanes)
        # per-block highest occupied rank + 1 (i-side kernel loop bound)
        rank = jnp.arange(cap, dtype=jnp.int32)[None, :, None]
        occ = jnp.max(jnp.where(state.alive.reshape(nb, cap, lanes),
                                rank, -1), axis=(1, 2)) + 1
    pbond = None
    if cfg.bond is not None:
        # the kernel excludes 1-2 pairs by comparing j TAGS; partner slots
        # resolve to tags with one gather each (2 channels for chains, 4
        # for branched topologies — matches _make_kernel's n_excl)
        n = state.capacity
        def ptag(bond):
            t = state.tag[jnp.clip(bond, 0, n - 1)]
            return jnp.where(bond >= 0, t, -2)
        pbond = jnp.stack([ptag(b).reshape(nb, cap, lanes)
                           for b in state.bond_partners], axis=1)
    with jax.named_scope("pair"):
        fpad = kern(fld, tag, salt, occ, pbond)      # [nb, 3, cap, lanes]
    f = fpad.transpose(0, 2, 3, 1).reshape(-1, 3).astype(state.x.dtype)
    if cfg.obmd is not None:
        with jax.named_scope("obmd_post_force"):
            f = _boundary_force_sliced(cfg, geom, state, f)
    more = state.bond_partners[2:]
    if cfg.bond is not None:
        from .forces.bonded import bond_forces
        with jax.named_scope("bond"):
            fb, _ = bond_forces(cfg.bond, cfg.box, state.x, state.bond1,
                                state.bond2, state.alive,
                                more_partners=more)
            f = f + fb
    if cfg.angle is not None:
        from .forces.bonded import angle_forces
        with jax.named_scope("angle"):
            fa, _ = angle_forces(cfg.angle, cfg.box, state.x, state.bond1,
                                 state.bond2, state.type, state.alive,
                                 more_partners=more)
            f = f + fa
    if cfg.dihedral is not None:
        from .forces.bonded import dihedral_forces
        if more:
            raise NotImplementedError(
                "dihedrals on branched topologies (>2 bonds/atom) are not "
                "supported by the center-bond dihedral storage")
        with jax.named_scope("dihedral"):
            fd, _ = dihedral_forces(cfg.dihedral, cfg.box, state.x,
                                    state.bond1, state.bond2, state.alive)
            f = f + fd
    if cfg.improper is not None and state.impr is not None:
        from .forces.bonded import improper_forces
        with jax.named_scope("improper"):
            fi, _ = improper_forces(cfg.improper, cfg.box, state.x,
                                    state.bond_partners, state.impr,
                                    state.type, state.alive)
            f = f + fi
    if cfg.langevin is not None:
        from .forces.bonded import langevin_force
        f = f + langevin_force(cfg.langevin, cfg, state)
    return jnp.where(a3, f, 0.0)


def _boundary_force_sliced(cfg, geom, state: State, f):
    """apply_boundary_force restricted to each region's slab slice.  On the
    cellpad layout every block region's members live in a contiguous slot
    range (slab_slice_bounds), so the weight/scale math and the force add
    touch ~30% of the store instead of all of it (stage.apply_boundary_force
    semantics, ref :1414-1516; in-graph 0.37 -> ~0.1 ms/step at 94k).
    Keeps the round-3 conservation rule: elementwise scale*F adds only,
    never a `scales @ forces` matmul (MXU bf16 rounding broke sum(f) ==
    sum(mf); tests/test_conservation.py)."""
    from .obmd.stage import smooth_weight
    obmd = cfg.obmd
    sc = state.obmd
    masses = jnp.asarray(cfg.masses, f.dtype)

    for region, F, smooth in (
            (obmd.region1, sc.momentum_force_left, True),
            (obmd.region2, sc.momentum_force_right, True),
            (obmd.region3, sc.shear_force_left, False),
            (obmd.region4, sc.shear_force_right, False)):
        if region is None or region.hi[0] <= region.lo[0]:
            # zero-extent shear sub-region: config guarantees the shear
            # force is zero too (stage.apply_boundary_force note)
            continue
        a, b = slab_slice_bounds(geom, cfg.box, region.lo[0], region.hi[0])
        xs = jax.lax.slice_in_dim(state.x, a, b, axis=0)
        al = jax.lax.slice_in_dim(state.alive, a, b, axis=0)
        ty = jax.lax.slice_in_dim(state.type, a, b, axis=0)
        m = masses[ty] if cfg.ntypes > 1 else jnp.full(
            (b - a,), float(cfg.masses[0]), f.dtype)
        member = al & region.match(xs)
        g = jnp.where(member,
                      smooth_weight(cfg, xs[:, 0], m) if smooth else m, 0.0)
        gsum = jnp.sum(g)
        scale = jnp.where(gsum > 0.0, g / jnp.maximum(gsum, 1e-30), 0.0)
        fs = jax.lax.slice_in_dim(f, a, b, axis=0)
        f = jax.lax.dynamic_update_slice_in_dim(
            f, fs + scale[:, None] * F, a, axis=0)
    return f


def _region_count_sliced(cfg, geom, state: State, region) -> jnp.ndarray:
    """stage.region_count over the region's contiguous slab slice (the
    census reduction touches the buffer band, not the whole store)."""
    a, b = slab_slice_bounds(geom, cfg.box, region.lo[0], region.hi[0])
    xs = jax.lax.slice_in_dim(state.x, a, b, axis=0)
    m = jax.lax.slice_in_dim(state.alive, a, b, axis=0) & region.match(xs)
    gt = cfg.obmd.group_types
    if gt is not None:
        ty = jax.lax.slice_in_dim(state.type, a, b, axis=0)
        gm = jnp.zeros_like(m)
        for t in gt:
            gm = gm | (ty == int(t))
        m = m & gm
    return jnp.sum(m.astype(jnp.int32))


def _subset_slice(cfg, geom, state, region, pad):
    """Buffer subset: a contiguous slot slice COMPACTED to its live rows.
    The slice itself needs no gather, but the cellpad layout is only
    ~occ/cap * s/lanes occupied (~1/3), and the USHER search re-reads the
    subset up to nattempt times — one small compaction gather up front
    shrinks all of that math 3x."""
    a, b = slab_slice_bounds(geom, cfg.box, region.lo[0] - pad,
                             region.hi[0] + pad)
    exp = expand_region(region, pad)
    xs = jax.lax.slice_in_dim(state.x, a, b, axis=0)
    al = jax.lax.slice_in_dim(state.alive, a, b, axis=0)
    valid = al & exp.match(xs)
    n = b - a
    # live-row bound: the layout is at most ~40% occupied in production
    # (occ/cap * real-lane fraction); overflow is counted loudly below
    b_max = min(n, int(0.45 * n) + 256)
    # cumsum-rank compaction: jnp.nonzero(size=) lowers through a SORT
    # (~1 ms/step both buffers at 100k atoms, profiled round 3)
    from .cellpad import compact_indices
    sel = compact_indices(valid, b_max, n)
    ok = sel < n
    safe = jnp.clip(sel, 0, n - 1)
    flags = relayout_flags(cfg)
    if flags["has_types"]:
        ty = jnp.where(ok, jax.lax.slice_in_dim(state.type, a, b,
                                                axis=0)[safe], 0)
    else:
        ty = jnp.zeros((b_max,), jnp.int32)      # single type: no gather
    if flags["has_charge"]:
        q = jnp.where(ok, jax.lax.slice_in_dim(state.q, a, b,
                                               axis=0)[safe], 0.0)
    else:
        q = jnp.zeros((b_max,), state.x.dtype)   # neutral scene: no gather
    return Subset(
        idx=sel + jnp.int32(a),
        x=jnp.where(ok[:, None], xs[safe], BIG),
        type=ty,
        q=q,
        valid=ok,
        overflow=jnp.sum(valid.astype(jnp.int32)) > b_max)


def _empty_subset_slice(cfg, geom, state, region, pad):
    """Shape-matched empty Subset for the demand-gated skip branch of
    _obmd_stage: valid=False, positions parked at BIG (the padding
    convention every subset consumer already masks on)."""
    a, b = slab_slice_bounds(geom, cfg.box, region.lo[0] - pad,
                             region.hi[0] + pad)
    n = b - a
    b_max = min(n, int(0.45 * n) + 256)
    dtype = state.x.dtype
    return Subset(
        idx=jnp.full((b_max,), n + a, jnp.int32),
        x=jnp.full((b_max, 3), BIG, dtype),
        type=jnp.zeros((b_max,), jnp.int32),
        q=jnp.zeros((b_max,), dtype),
        valid=jnp.zeros((b_max,), bool),
        overflow=jnp.zeros((), bool))


def _insert_mol(cfg, geom, state: State, nins_l, nins_r, sub_l, sub_r):
    """Molecule-mode insertion (ref try_inserting MOLECULE branch): K
    template candidates per buffer with random rotations (ref :1012-1024),
    translation-USHER or near check over all template atoms, all-or-nothing
    placement (check_mol_proc analogue, ref :1098-1107), intra-molecule
    bonds wired into the per-slot partner tags.

    Multi-template `molfrac` (ref onemols/molfrac, :2039-2054): each
    candidate draws its template from the molfrac distribution; templates
    are padded to the largest natoms and pad rows sit at BIG, so every
    energy/distance/acceptance path ignores them."""
    import numpy as np
    from .obmd.subset import (mol_candidates_sel, mol_sequential_accept,
                              near_check_subset_mol, random_rotations,
                              usher_search_subset_mol)
    obmd = cfg.obmd
    tpls = obmd.templates
    T = len(tpls)
    m = obmd.mol_natoms_max
    dtype = state.dtype
    K = obmd.insert_kmax
    n_slots = geom.n_slots

    # ---- static per-template stacks, padded to m rows ----
    from .config import template_stacks
    ts = template_stacks(obmd)
    frac = ts.frac
    dx_s = jnp.asarray(ts.dx, dtype)
    am_s = jnp.asarray(ts.amask)
    ty_s = jnp.asarray(ts.types, jnp.int32)
    q_s = jnp.asarray(ts.q, dtype)
    rep_s = jnp.asarray(ts.rep, jnp.int32)
    nat_s = jnp.asarray(ts.natoms, jnp.int32)
    pidx_s = jnp.asarray(ts.pidx, jnp.int32)
    iidx_s = jnp.asarray(ts.iidx, jnp.int32)

    key = rng.fold_key(state.key, state.step)
    kl, kr_, knext = jax.random.split(key, 3)
    # `charged 1` (ref fix_obmd_merged.cpp:2108, chargeflag branch :1545):
    # trial energies see the template atoms' charges via
    # single_atomistic_obmd; with charged 0 trials are neutral even though
    # the inserted atoms still carry the template q.
    charged = bool(getattr(obmd, "charged", False))

    from .obmd.stage import rounds_of
    rounds = rounds_of(cfg)
    M = rounds * K

    def append_mol(sub, pos, acc, types_k, q_k, am_k):
        """Make this round's accepted molecules visible to later rounds
        (the ATOM-mode _append_subset analogue; ref :913-935 sequential
        attempts see earlier insertions)."""
        from .obmd.subset import Subset
        kk = pos.shape[0]
        accr = jnp.repeat(acc, m) & am_k.reshape(kk * m)
        from .cells import BIG as _BIG
        return Subset(
            idx=jnp.concatenate([sub.idx,
                                 jnp.full((kk * m,), geom.n_slots,
                                          jnp.int32)]),
            x=jnp.concatenate([sub.x,
                               jnp.where(accr[:, None],
                                         pos.reshape(kk * m, 3), _BIG)]),
            type=jnp.concatenate([sub.type, types_k.reshape(kk * m)]),
            q=jnp.concatenate([sub.q, q_k.reshape(kk * m)]),
            valid=jnp.concatenate([sub.valid, accr]),
            overflow=sub.overflow)

    def one_side(side_key, region, budget, sub):
        """`maxattempt` rounds of K fresh template draws per stage call
        (ref rounds loop :913-935), greedy acceptance within the remaining
        feedback budget — the ATOM-mode rounds_of() treatment applied to
        MOLECULE mode (round-2 VERDICT weak #4)."""
        from .obmd.stage import draw_candidates
        rem = jnp.clip(budget, 0, M)
        poss, accs, tsels = [], [], []
        it_sum = jnp.zeros((), jnp.int32)
        for r in range(rounds):
            if T > 1:
                kc, kr, kt = jax.random.split(
                    jax.random.fold_in(side_key, r), 3)
                tsel = jax.random.choice(kt, T, (K,), p=jnp.asarray(frac))
            else:
                # single template: keep the historical two-way split so
                # trajectories are draw-identical with older runs
                kc, kr = jax.random.split(jax.random.fold_in(side_key, r))
                tsel = jnp.zeros((K,), jnp.int32)
            centers, ok0 = draw_candidates(cfg, kc, region, K, dtype, state=state)
            rots = random_rotations(kr, K, dtype, axis=obmd.orient)
            am_k = am_s[tsel]                              # [K, m]
            types_k = ty_s[tsel]
            q_k = q_s[tsel]
            coords = mol_candidates_sel(dx_s[tsel], am_k, centers, rots)
            mol_q = q_k if charged else None
            if obmd.usher is not None:
                pos, ok, iters = usher_search_subset_mol(
                    cfg, sub, coords, types_k, region, mol_q=mol_q,
                    amask=am_k)
            else:
                ok = near_check_subset_mol(cfg, sub, coords)
                pos, iters = coords, jnp.zeros((K,), jnp.int32)
            # all REAL atoms must sit inside the region (check_mol_region)
            ok = ok & ok0 & jnp.all(region.match(pos) | ~am_k, axis=1)
            accepted, cnt = mol_sequential_accept(cfg, pos, types_k, ok,
                                                  jnp.minimum(rem, K))
            rem = rem - cnt
            if rounds > 1:
                sub = append_mol(sub, pos, accepted, types_k, q_k, am_k)
            poss.append(pos)
            accs.append(accepted)
            tsels.append(tsel)
            it_sum = it_sum + jnp.sum(iters)
        return (jnp.concatenate(poss), jnp.concatenate(accs),
                jnp.concatenate(tsels), it_sum)

    pos_l, acc_l, ts_l, it_l = one_side(kl, obmd.region5, nins_l, sub_l)
    pos_r, acc_r, ts_r, it_r = one_side(kr_, obmd.region6, nins_r, sub_r)
    pos = jnp.concatenate([pos_l, pos_r])                 # [2M, m, 3]
    accepted = jnp.concatenate([acc_l, acc_r])            # [2M]
    tsel = jnp.concatenate([ts_l, ts_r])                  # [2M]

    km = 2 * M
    am_k = am_s[tsel]                                     # [2M, m]
    am_flat = am_k.reshape(km * m)
    apos = pos.reshape(km * m, 3)
    a_acc = jnp.repeat(accepted, m) & am_flat
    slot, landed = place_insertions(geom, state, apos, a_acc)
    landed_mol = jnp.all(landed.reshape(km, m) | ~am_k, axis=1) & accepted
    act = jnp.repeat(landed_mol, m) & am_flat
    slot = jnp.where(act, slot, n_slots)                  # atomic commit

    from .obmd.stage import insertion_tag_base
    base = insertion_tag_base(cfg, state)
    nat_k = nat_s[tsel]                                   # [2M]
    placed = jnp.where(landed_mol, nat_k, 0)
    tag_base = base + jnp.cumsum(placed) - placed         # [2M] exclusive
    atom_idx = jnp.tile(jnp.arange(m, dtype=jnp.int32), (km,))
    new_tag = jnp.repeat(tag_base, m) + atom_idx + 1
    mol_id = jnp.repeat(tag_base + 1, m)                  # first atom's tag

    # intra-molecule bond partners from the selected template's static
    # graph, resolved to the partner atoms' landed SLOTS
    p1_idx = pidx_s[tsel][:, :, 0].reshape(km * m)
    p2_idx = pidx_s[tsel][:, :, 1].reshape(km * m)
    base_flat = (jnp.arange(km * m, dtype=jnp.int32) // m) * m

    def pslot(p_idx):
        pf = jnp.clip(base_flat + p_idx, 0, km * m - 1)
        return jnp.where((p_idx >= 0) & act, slot[pf], -1)

    p1_slot = pslot(p1_idx)
    p2_slot = pslot(p2_idx)
    if state.bond3 is not None:
        p3_slot = pslot(pidx_s[tsel][:, :, 2].reshape(km * m))
        p4_slot = pslot(pidx_s[tsel][:, :, 3].reshape(km * m))
    if state.impr is not None:
        impr_slots = jnp.stack(
            [pslot(iidx_s[tsel][:, :, c].reshape(km * m))
             for c in range(3)], axis=1)                    # [km*m, 3]

    types_flat = ty_s[tsel].reshape(km * m)
    q_flat = q_s[tsel].reshape(km * m)

    from .obmd.stage import draw_inserted_velocities
    kv = jax.random.fold_in(knext, 7)
    com_k = (jnp.sum(jnp.where(am_k[:, :, None], pos, 0.0), axis=1)
             / jnp.maximum(jnp.sum(am_k, axis=1), 1)[:, None])
    vnew = draw_inserted_velocities(cfg, kv, com_k, dtype)
    if vnew is None:
        av = jnp.zeros((km * m, 3), dtype)
        pins_l = pins_r = jnp.zeros((3,), dtype)
    else:
        av = jnp.repeat(vnew, m, axis=0)              # same v for all atoms
        mass_tab = jnp.asarray(cfg.masses, dtype)
        mol_mass = jnp.sum(jnp.where(am_k, mass_tab[ty_s[tsel]], 0.0),
                           axis=1)                    # [2M]
        mv = mol_mass[:, None] * jnp.where(landed_mol[:, None], vnew, 0.0)
        pins_l = jnp.sum(mv[:M], axis=0)
        pins_r = jnp.sum(mv[M:], axis=0)
    x = scatter_rows(state.x, slot, apos)
    v = scatter_rows(state.v, slot, av)
    f = scatter_rows(state.f, slot, jnp.zeros((km * m, 3), dtype))
    typ = state.type.at[slot].set(types_flat, mode="drop")
    tag = state.tag.at[slot].set(new_tag, mode="drop")
    qn = state.q.at[slot].set(q_flat, mode="drop")
    moln = state.mol.at[slot].set(mol_id, mode="drop")
    # representative-atom flag from the template (atom.cpp:2143-2148 copies
    # rep_atom into each created molecule atom)
    rep = state.rep_atom.at[slot].set(
        rep_s[tsel].reshape(km * m), mode="drop")
    lam = state.lambdaF.at[slot].set(jnp.zeros((km * m,), dtype),
                                     mode="drop")
    cms0 = scatter_rows(state.cms_mol, slot, jnp.zeros((km * m, 3), dtype))
    vcm0 = scatter_rows(state.vcms_mol, slot, jnp.zeros((km * m, 3), dtype))
    nb1 = state.bond1.at[slot].set(p1_slot, mode="drop")
    nb2 = state.bond2.at[slot].set(p2_slot, mode="drop")
    extra_cols = {}
    if state.bond3 is not None:
        extra_cols["bond3"] = state.bond3.at[slot].set(p3_slot, mode="drop")
        extra_cols["bond4"] = state.bond4.at[slot].set(p4_slot, mode="drop")
    if state.impr is not None:
        extra_cols["impr"] = scatter_rows(state.impr, slot, impr_slots)
    aliv = state.alive.at[slot].set(True, mode="drop")

    aux: PadAux = state.nbrs
    aux = aux.replace(xref=scatter_rows(aux.xref, slot, apos))
    from .cellpad import patch_kernel_caches
    aux = patch_kernel_caches(geom, aux, slot, new_tag, n_slots)

    n_mols = jnp.sum(landed_mol.astype(jnp.int32))
    n_atoms_placed = jnp.sum(placed)
    want = jnp.clip(nins_l, 0) + jnp.clip(nins_r, 0)
    return state.replace(
        x=x, v=v, f=f, type=typ, tag=tag, q=qn, mol=moln, alive=aliv,
        lambdaF=lam, cms_mol=cms0, vcms_mol=vcm0, rep_atom=rep,
        bond1=nb1, bond2=nb2, **extra_cols, nbrs=aux,
        maxtag=base + n_atoms_placed, key=knext,
        obmd=state.obmd.replace(
            ninserted=state.obmd.ninserted + n_atoms_placed,
            insert_fail=state.obmd.insert_fail +
            jnp.maximum(want - n_mols, 0),
            usher_iters=state.obmd.usher_iters + jnp.sum(it_l) + jnp.sum(it_r))), \
        pins_l, pins_r


def _insert(cfg, geom, state: State, nins_l, nins_r, sub_l, sub_r):
    if cfg.obmd.mol is not None:
        return _insert_mol(cfg, geom, state, nins_l, nins_r, sub_l, sub_r)
    from .obmd.stage import (_append_subset, draw_candidates,
                             insertion_tag_base, rounds_of)
    obmd = cfg.obmd
    dtype = state.dtype
    K = obmd.insert_kmax
    n_slots = geom.n_slots
    rounds = rounds_of(cfg)
    M = rounds * K

    key = rng.fold_key(state.key, state.step)
    keys = jax.random.split(key, 2 * rounds + 1)
    knext = keys[-1]
    keys_l, keys_r = keys[:rounds], keys[rounds:2 * rounds]

    ctype = jnp.full((K,), obmd.ntype, jnp.int32)
    zq = jnp.zeros((K,), dtype)
    m = 2 * M
    from .obmd.stage import draw_inserted_velocities
    # the velocity-keyword surface is a STATIC property of the config
    has_vkw = draw_inserted_velocities(
        cfg, jax.random.PRNGKey(0), jnp.zeros((1, 3), dtype),
        dtype) is not None

    def _rounds_body(ops):
        """Candidate draws + steered search + sequential acceptance +
        slot placement + inserted-velocity draws — everything whose
        output is candidate-sized, so the whole block rides the demand
        gate below (at steady state the feedback budget is zero on
        almost every step; round 4 gated only the USHER search and the
        draws/accept/cumfree placement still cost ~0.1 ms/step)."""
        sub_l, sub_r = ops
        rem_l = jnp.clip(nins_l, 0, M)
        rem_r = jnp.clip(nins_r, 0, M)
        poss_l, accs_l, poss_r, accs_r = [], [], [], []
        it_l = it_r = jnp.zeros((), jnp.int32)
        for r in range(rounds):
            cand_l, ok0_l = draw_candidates(cfg, keys_l[r], obmd.region5,
                                            K, dtype, state=state)
            cand_r, ok0_r = draw_candidates(cfg, keys_r[r], obmd.region6,
                                            K, dtype, state=state)
            if obmd.usher is not None:
                # both buffers in ONE search: the per-iteration launch
                # overhead dominates the [K,B] math at production sizes.
                # Kernel-representable pair laws run the whole loop
                # inside one Pallas kernel (VMEM-resident, zero
                # per-iteration launches); on non-TPU backends the XLA
                # path is used (interpreted Pallas is orders of
                # magnitude slower than XLA on CPU).
                import os
                from .forces.pallas_usher import usher_law
                if (usher_law(cfg.pair) is not None
                        and jax.default_backend() in ("tpu", "axon")
                        and not os.environ.get("OBMD_TPU_XLA_USHER")):
                    from .forces.pallas_usher import usher_search_pallas
                    search = lambda sl, sr, cl, cr: usher_search_pallas(
                        cfg, sl, sr, cl, cr, obmd.region5, obmd.region6)
                else:
                    from .obmd.subset import usher_search_subset_batch
                    search = (lambda sl, sr, cl, cr:
                              usher_search_subset_batch(
                                  cfg, sl, sr, cl, cr, ctype,
                                  obmd.region5, obmd.region6))
                pos2, ok2, iters2 = search(sub_l, sub_r, cand_l, cand_r)
                pos_l_r, pos_r_r = pos2[0], pos2[1]
                ok_l, ok_r = ok2[0], ok2[1]
                it_l = it_l + jnp.sum(iters2[0])
                it_r = it_r + jnp.sum(iters2[1])
            else:
                ok_l = near_check_subset(cfg, sub_l, cand_l)
                ok_r = near_check_subset(cfg, sub_r, cand_r)
                pos_l_r, pos_r_r = cand_l, cand_r
            acc_l_r, cnt_l = _sequential_accept(cfg, pos_l_r, ctype,
                                                ok_l & ok0_l,
                                                jnp.minimum(rem_l, K))
            acc_r_r, cnt_r = _sequential_accept(cfg, pos_r_r, ctype,
                                                ok_r & ok0_r,
                                                jnp.minimum(rem_r, K))
            rem_l = rem_l - cnt_l
            rem_r = rem_r - cnt_r
            if rounds > 1:
                sub_l = _append_subset(sub_l, pos_l_r, acc_l_r, ctype, zq,
                                       n_slots)
                sub_r = _append_subset(sub_r, pos_r_r, acc_r_r, ctype, zq,
                                       n_slots)
            poss_l.append(pos_l_r)
            accs_l.append(acc_l_r)
            poss_r.append(pos_r_r)
            accs_r.append(acc_r_r)
        pos = jnp.concatenate([jnp.concatenate(poss_l),
                               jnp.concatenate(poss_r)])
        accepted = jnp.concatenate([jnp.concatenate(accs_l),
                                    jnp.concatenate(accs_r)])
        slot, landed = place_insertions(geom, state, pos, accepted)
        if has_vkw:
            kv = jax.random.fold_in(key, 7)
            vnew = draw_inserted_velocities(cfg, kv, pos, dtype)
        else:
            vnew = jnp.zeros((m, 3), dtype)
        return pos, accepted, slot, landed, vnew, it_l, it_r

    def _skip_rounds(ops):
        return (jnp.zeros((m, 3), dtype), jnp.zeros((m,), bool),
                jnp.full((m,), n_slots, jnp.int32), jnp.zeros((m,), bool),
                jnp.zeros((m, 3), dtype),
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

    pos, accepted, slot, landed, vnew_arr, it_l, it_r = jax.lax.cond(
        (nins_l > 0) | (nins_r > 0), _rounds_body, _skip_rounds,
        (sub_l, sub_r))
    order = jnp.cumsum(landed.astype(jnp.int32)) - 1
    base = insertion_tag_base(cfg, state)
    new_tag = base + 1 + order

    if has_vkw:
        vnew = vnew_arr
        mass_ins = jnp.asarray(cfg.masses, dtype)[obmd.ntype]
        mv = mass_ins * jnp.where(landed[:, None], vnew, 0.0)
        pins_l = jnp.sum(mv[:M], axis=0)
        pins_r = jnp.sum(mv[M:], axis=0)
    else:
        vnew = None
        pins_l = pins_r = jnp.zeros((3,), dtype)

    # Per-field scatters have a large fixed per-op cost; fields whose value
    # at a REUSED slot is already what the inserted atom needs skip their
    # write entirely:  f is dead at stage time (consumed by the half-kick,
    # fully recomputed before its next read); v == 0 at every dead slot
    # (delete_outside/relayout/layout_build maintain the invariant), so
    # at-rest insertion skips it; q/mol/lambdaF/cms/rep/bonds/type are
    # globally constant unless the scene says otherwise (relayout_flags).
    flags = relayout_flags(cfg)
    upd = {}
    upd["x"] = scatter_rows(state.x, slot, pos)
    if vnew is not None:
        upd["v"] = scatter_rows(state.v, slot, vnew)
    if flags["has_types"] or obmd.ntype != 0:
        upd["type"] = state.type.at[slot].set(
            jnp.full((m,), obmd.ntype, jnp.int32), mode="drop")
    upd["tag"] = state.tag.at[slot].set(new_tag, mode="drop")
    if flags["has_charge"]:
        upd["q"] = state.q.at[slot].set(jnp.zeros((m,), dtype), mode="drop")
    if flags["has_mol"]:
        upd["lambdaF"] = state.lambdaF.at[slot].set(
            jnp.zeros((m,), dtype), mode="drop")
        upd["cms_mol"] = scatter_rows(state.cms_mol, slot,
                                      jnp.zeros((m, 3), dtype))
        upd["vcms_mol"] = scatter_rows(state.vcms_mol, slot,
                                       jnp.zeros((m, 3), dtype))
        upd["rep_atom"] = state.rep_atom.at[slot].set(
            jnp.zeros((m,), jnp.int32), mode="drop")
        upd["mol"] = state.mol.at[slot].set(
            jnp.zeros((m,), jnp.int32), mode="drop")
    if flags["has_bonds"]:
        upd["bond1"] = state.bond1.at[slot].set(
            jnp.full((m,), -1, jnp.int32), mode="drop")
        upd["bond2"] = state.bond2.at[slot].set(
            jnp.full((m,), -1, jnp.int32), mode="drop")
        if state.bond3 is not None:
            upd["bond3"] = state.bond3.at[slot].set(
                jnp.full((m,), -1, jnp.int32), mode="drop")
            upd["bond4"] = state.bond4.at[slot].set(
                jnp.full((m,), -1, jnp.int32), mode="drop")
        if state.impr is not None:
            upd["impr"] = state.impr.at[slot].set(
                jnp.full((m, 3), -1, jnp.int32), mode="drop")
    upd["alive"] = state.alive.at[slot].set(True, mode="drop")

    aux: PadAux = state.nbrs
    aux = aux.replace(xref=scatter_rows(aux.xref, slot, pos))
    from .cellpad import patch_kernel_caches
    upd["nbrs"] = patch_kernel_caches(geom, aux, slot, new_tag, n_slots)

    n_landed = jnp.sum(landed.astype(jnp.int32))
    want = jnp.clip(nins_l, 0) + jnp.clip(nins_r, 0)
    return state.replace(
        maxtag=base + n_landed, key=knext, **upd,
        obmd=state.obmd.replace(
            ninserted=state.obmd.ninserted + n_landed,
            insert_fail=state.obmd.insert_fail +
            jnp.maximum(want - n_landed, 0),
            usher_iters=state.obmd.usher_iters + jnp.sum(it_l) + jnp.sum(it_r))), \
        pins_l, pins_r


def _delete_outside_sliced(cfg, geom, state: State):
    """stage.delete_outside restricted to the two box-face cell bands
    (ATOM mode).  An atom can only be beyond an open x face if it was
    filed into that face's own cell column (cell_of clips to the box and
    epoch drift is bounded by the half-skin budget << cell width — a
    violated budget is counted in skin_trips and voids the run), so the
    doom test, momentum tallies, and the alive/tag/v clears touch the
    first and last block instead of the whole store (the full-store pass
    was ~0.15 ms of the 0.22 ms stage at 97k).  Molecule scenes keep the
    full-store path: doom propagates along bonds beyond the face band."""
    box = cfg.box
    csx = geom.cell_size[0]
    masses = jnp.asarray(cfg.masses, state.x.dtype)
    alive, tag, v = state.alive, state.tag, state.v
    vnew = []
    ndel = jnp.zeros((), jnp.int32)
    for lo_face in (True, False):
        if lo_face:
            a, b = slab_slice_bounds(geom, box, box.lo[0] - 1.0,
                                     box.lo[0] + csx)
        else:
            a, b = slab_slice_bounds(geom, box, box.hi[0] - csx,
                                     box.hi[0] + 1.0)
        xs = jax.lax.slice_in_dim(state.x, a, b, axis=0)
        al = jax.lax.slice_in_dim(alive, a, b, axis=0)
        x0 = xs[:, 0]
        doomed = al & ((x0 < box.lo[0]) if lo_face else (x0 > box.hi[0]))
        vs = jax.lax.slice_in_dim(v, a, b, axis=0)
        if cfg.ntypes == 1:
            m = jnp.full((b - a,), float(cfg.masses[0]), state.x.dtype)
        else:
            m = masses[jax.lax.slice_in_dim(state.type, a, b, axis=0)]
        mv = m[:, None] * vs
        vnew.append(jnp.sum(jnp.where(doomed[:, None], mv, 0.0), axis=0))
        ndel = ndel + jnp.sum(doomed.astype(jnp.int32))
        alive = jax.lax.dynamic_update_slice_in_dim(alive, al & ~doomed,
                                                    a, axis=0)
        ts = jax.lax.slice_in_dim(tag, a, b, axis=0)
        tag = jax.lax.dynamic_update_slice_in_dim(
            tag, jnp.where(doomed, -1, ts), a, axis=0)
        # dead slots keep v == 0 (the at-rest reuse invariant,
        # stage.delete_outside)
        v = jax.lax.dynamic_update_slice_in_dim(
            v, jnp.where(doomed[:, None], 0.0, vs), a, axis=0)
    state = state.replace(
        alive=alive, tag=tag, v=v,
        obmd=state.obmd.replace(ndeleted=state.obmd.ndeleted + ndel))
    return state, vnew[0], vnew[1]


def _obmd_stage(cfg, geom, state: State, with_rebuild: bool = True) -> State:
    obmd = cfg.obmd
    box = cfg.box
    dtype = state.x.dtype.type
    dt = dtype(cfg.dt)
    t = state.sim_time

    pxx = eval_param(obmd.pxx, t)
    pxy = eval_param(obmd.pxy, t)
    pxz = eval_param(obmd.pxz, t)
    dpxx = eval_param(obmd.dpxx, t)
    freq = eval_param(obmd.freq, t)
    alpha = eval_param(obmd.alpha, t)
    tau = eval_param(obmd.tau, t)
    nbuf = eval_param(obmd.nbuf, t)

    with jax.named_scope("obmd_delete"):
        if obmd.mol is None:
            state, vnewl, vnewr = _delete_outside_sliced(cfg, geom, state)
        else:
            state, vnewl, vnewr = delete_outside(cfg, state)
    if with_rebuild:
        with jax.named_scope("neigh_decide"):
            state = maybe_rebuild(geom, box, cfg.skin, state,
                                  **relayout_flags(cfg))

    nins_l = feedback_count(_region_count_sliced(cfg, geom, state,
                                                 obmd.region1),
                            obmd.mol_len, alpha, nbuf, dt, tau)
    nins_r = feedback_count(_region_count_sliced(cfg, geom, state,
                                                 obmd.region2),
                            obmd.mol_len, alpha, nbuf, dt, tau)

    pad = cfg.pair.max_cut + cfg.skin
    with jax.named_scope("obmd_insert"):
        # Demand gate on the subset compactions too (the USHER search is
        # already gated inside _insert): at this workload's steady state
        # the feedback budget is zero on almost every step, and the two
        # cumsum-rank compactions cost ~0.3 ms/step at 94k atoms.  Subset
        # shapes are static per region, so the skip branch returns empty
        # subsets (valid=False, x=BIG) of identical shape — any masked
        # consumer math sees "no atoms", and acceptance is budget-clipped
        # to zero anyway.
        need = (nins_l > 0) | (nins_r > 0)

        def _build_subs(st):
            return (_subset_slice(cfg, geom, st, obmd.region5, pad),
                    _subset_slice(cfg, geom, st, obmd.region6, pad))

        def _skip_subs(st):
            return (_empty_subset_slice(cfg, geom, st, obmd.region5, pad),
                    _empty_subset_slice(cfg, geom, st, obmd.region6, pad))

        sub_l, sub_r = jax.lax.cond(need, _build_subs, _skip_subs, state)
        state = state.replace(
            cell_overflow=state.cell_overflow
            + sub_l.overflow.astype(jnp.int32)
            + sub_r.overflow.astype(jnp.int32))
        state, pins_l, pins_r = _insert(cfg, geom, state, nins_l, nins_r,
                                        sub_l, sub_r)

    area = dtype(box.cross_area)
    sim_time = t + dt
    factor = pxx + dpxx * jnp.sin(2.0 * jnp.pi * freq * sim_time)
    # inserted momentum enters the tally with opposite sign to deletions
    # (deleted atoms remove p, inserted add p; the reference adds a literal
    # zero at :1183-1197 because it always inserts at rest)
    vnewl = vnewl - pins_l
    vnewr = vnewr - pins_r
    mfl = jnp.stack([vnewl[0] / dt + factor * area, vnewl[1] / dt,
                     vnewl[2] / dt])
    mfr = jnp.stack([vnewr[0] / dt - pxx * area, vnewr[1] / dt,
                     vnewr[2] / dt])
    sfl = jnp.stack([dtype(0.0), pxy * area, pxz * area])
    arr = state.x.dtype
    return state.replace(
        sim_time=sim_time,
        obmd=state.obmd.replace(
            momentum_force_left=mfl.astype(arr),
            momentum_force_right=mfr.astype(arr),
            shear_force_left=sfl.astype(arr),
            shear_force_right=(-sfl).astype(arr)))


def setup_cellpad(cfg: SceneConfig, state: State) -> State:
    """Pack into cellpad layout + initial force evaluation.

    Raises if the initial filing drops atoms (cell occupancy above
    Capacity.cell_capacity): silently losing atoms at t=0 corrupts every
    later observable, so it must be a loud config error, not a counter."""
    cfg = cfg.finalize()
    geom = make_geometry(cfg)
    kern = _make_kernel(cfg, geom)
    n_before = int(jnp.sum(state.alive))

    @jax.jit
    def _go(state):
        state = state.replace(x=cfg.box.wrap(state.x))
        state = layout_build(geom, cfg.box, state)
        if cfg.obmd is not None:
            state = _obmd_stage(cfg, geom, state)
        f = _forces(cfg, geom, kern, state)
        return state.replace(f=f)

    out = _go(state)
    lost = n_before - int(jnp.sum(out.alive)) + int(out.obmd.ninserted
                                                    if cfg.obmd else 0) \
        - (int(out.obmd.ndeleted) if cfg.obmd else 0)
    if lost > 0:
        raise ValueError(
            f"cellpad initial filing dropped {lost} atoms: cell occupancy "
            f"exceeds Capacity.cell_capacity={geom.cap} "
            f"(grid {geom.dims}, {int(n_before)} atoms). Raise "
            f"cell_capacity or enlarge the box.")
    return out


def make_step_cellpad(cfg: SceneConfig):
    cfg = cfg.finalize()
    if not supports(cfg):
        raise ValueError(
            "cellpad path: DPD/LJ/LJ-RF up to 4 types; open x required with OBMD")
    geom = make_geometry(cfg)
    kern = _make_kernel(cfg, geom)
    dt = float(cfg.dt)

    def step(state: State) -> State:
        dtype = state.x.dtype.type
        m = per_atom_mass(cfg, state)[:, None]
        a3 = state.alive[:, None]
        dtf = dtype(0.5 * dt)

        v = jnp.where(a3, state.v + dtf * state.f / m, state.v)
        if cfg.rigid:
            from .rigid import rigid_drift
            x, v = rigid_drift(cfg, state, v)
        else:
            x = cfg.box.wrap(jnp.where(a3, state.x + dtype(dt) * v, state.x))
        if cfg.shake is not None:
            from .shake import shake_positions
            x, v = shake_positions(cfg, state.x, x, v, state.type,
                                   state.bond1, state.bond2, state.alive,
                                   1.0 / m[:, 0],
                                   more_partners=state.bond_partners[2:])
        state = state.replace(x=x, v=v)

        if cfg.obmd is not None:
            nfreq = cfg.obmd.nfreq
            if nfreq <= 1:
                state = _obmd_stage(cfg, geom, state)
            else:
                state = jax.lax.cond(state.step % nfreq == 0,
                                     lambda s: _obmd_stage(cfg, geom, s),
                                     lambda s: s, state)
        else:
            state = maybe_rebuild(geom, cfg.box, cfg.skin, state,
                                  **relayout_flags(cfg))

        f = _forces(cfg, geom, kern, state)

        m = per_atom_mass(cfg, state)[:, None]
        v = jnp.where(state.alive[:, None], state.v + dtf * f / m, state.v)
        if cfg.rigid:
            from .rigid import rigid_project
            v = rigid_project(cfg, state, v)
        if cfg.shake is not None:
            from .shake import rattle_velocities
            v = rattle_velocities(cfg, state.x, v, state.type, state.bond1,
                                  state.bond2, state.alive, 1.0 / m[:, 0],
                                  more_partners=state.bond_partners[2:])
        state = state.replace(v=v, f=f, step=state.step + 1)
        if cfg.obmd is not None and cfg.obmd.mol is not None:
            from .adress import update_mol_com
            state = update_mol_com(cfg, state)
        return state

    return step


def _plain_step(cfg, geom, kern, state: State, with_stage: bool = True,
                relayout: bool = False) -> State:
    """One step with NO data-dependent rebuild logic (the runner owns the
    half-skin budget via its static relayout schedule).  relayout=True runs
    the epoch relayout HERE, between the drift and the force pass: at that
    point the force array is dead (consumed by the first half-kick, fully
    recomputed below before its next read), so its rows skip the move —
    and the epoch reference positions align exactly with the layout the
    force kernel reads."""
    dt = float(cfg.dt)
    dtype = state.x.dtype.type
    m = per_atom_mass(cfg, state)[:, None]
    a3 = state.alive[:, None]
    dtf = dtype(0.5 * dt)

    v = jnp.where(a3, state.v + dtf * state.f / m, state.v)
    if cfg.rigid:
        from .rigid import rigid_drift
        x, v = rigid_drift(cfg, state, v)
    else:
        x = cfg.box.wrap(jnp.where(a3, state.x + dtype(dt) * v, state.x))
    if cfg.shake is not None:
        from .shake import shake_positions
        x, v = shake_positions(cfg, state.x, x, v, state.type, state.bond1,
                               state.bond2, state.alive, 1.0 / m[:, 0],
                               more_partners=state.bond_partners[2:])
    state = state.replace(x=x, v=v)
    if relayout:
        skin = float(cfg.skin)
        if skin > 0:
            state = note_skin_check(cfg.box, skin, state)
        state = relayout_incremental(geom, cfg.box, state, move_f=False,
                                     **relayout_flags(cfg))
    if cfg.obmd is not None and with_stage:
        state = _obmd_stage(cfg, geom, state, with_rebuild=False)
    f = _forces(cfg, geom, kern, state)
    m = per_atom_mass(cfg, state)[:, None]
    v = jnp.where(state.alive[:, None], state.v + dtf * f / m, state.v)
    if cfg.rigid:
        from .rigid import rigid_project
        v = rigid_project(cfg, state, v)
    if cfg.shake is not None:
        from .shake import rattle_velocities
        v = rattle_velocities(cfg, state.x, v, state.type, state.bond1,
                              state.bond2, state.alive, 1.0 / m[:, 0],
                              more_partners=state.bond_partners[2:])
    state = state.replace(v=v, f=f, step=state.step + 1)
    if cfg.obmd is not None and cfg.obmd.mol is not None:
        from .adress import update_mol_com
        state = update_mol_com(cfg, state)
    return state


def auto_rebuild_every(cfg: SceneConfig) -> int:
    """Static relayout period from the half-skin budget: assume a generous
    max particle speed (LJ units) and leave 10% margin.  Violations are
    counted in PadAux.skin_trips, so a too-optimistic period is loud."""
    if cfg.rebuild_every > 0:
        return cfg.rebuild_every
    if cfg.skin <= 0.0:
        return 1
    # Fastest-atom speed scales as sqrt(kT/m): calibrated on the 100k
    # OBMD_DPD bench at T=1, m=1, the fastest of 100k atoms drifts ~6.8
    # length/time over a 15-step epoch; 9.0 leaves ~25% margin (skin_trips
    # stays 0).  Scale that anchor by sqrt(T_max/m_min) so hotter or
    # lighter scenes shorten the epoch instead of silently losing pairs
    # (round-2 ADVICE: hard-coded v_fast).  check_invariants() still
    # audits skin_trips post-run as the backstop.
    t_max = 1.0
    for src in (cfg.pair, cfg.langevin):
        t = getattr(src, "temp", None)
        if t is not None:
            t_max = max(t_max, float(t))
    m_min = min(cfg.masses)
    v_fast = 9.0 * float(np.sqrt(t_max / m_min))
    r = int(0.45 * cfg.skin / (v_fast * cfg.dt))
    return max(1, min(r, 40))


def make_run_cellpad(cfg: SceneConfig, nsteps: int):
    """Fused multi-step runner on a STATIC rebuild schedule.

    Round-1 finding: the half-skin rebuild as a data-dependent `lax.cond`
    inside a scanned step costs ~10.7 ms/step at 100k atoms *even when the
    branch is not taken* (XLA cannot alias the large carry across the
    branch; measured 19.7 -> 9.0 ms by deleting the cond).  Host-chunked
    (2x worse: transport syncs) and while-loop-segmented (+30%: while
    carries copy) variants also lost.  The fix is to make the schedule
    static: relayout every R steps unconditionally (R from the half-skin
    drift budget), with the displacement criterion demoted to a telemetry
    assertion (PadAux.skin_trips).  No branch, no cond carry, one dispatch
    for the whole run.  The reference analogue is `neigh_modify delay N
    every N check no` (neighbor.cpp decide() :2312 without check_distance),
    a standard LAMMPS production setting."""
    cfg = cfg.finalize()
    if not supports(cfg):
        raise ValueError(
            "cellpad path: DPD/LJ/LJ-RF up to 4 types; open x required with OBMD")
    geom = make_geometry(cfg)
    kern = _make_kernel(cfg, geom)
    r_every = auto_rebuild_every(cfg)
    if cfg.obmd is not None and cfg.obmd.nfreq > 1:
        # keep OBMD cadence and rebuild cadence aligned (the OBMD stage
        # must see a current layout for its slab subsets)
        r_every = max(1, (r_every // cfg.obmd.nfreq)) * cfg.obmd.nfreq

    nfreq = cfg.obmd.nfreq if cfg.obmd is not None else 1

    def plain(s, _):
        return _plain_step(cfg, geom, kern, s), None

    def nostage(s, _):
        return _plain_step(cfg, geom, kern, s, with_stage=False), None

    def steps(state: State, length: int) -> State:
        """`length` steps; the FIRST runs the epoch relayout mid-step
        (between drift and force pass — f is dead there and skips the
        move, and the epoch reference aligns with what the kernel reads)."""
        if nfreq <= 1:
            state = _plain_step(cfg, geom, kern, state, relayout=True)
            if length > 1:
                state, _ = jax.lax.scan(plain, state, None,
                                        length=length - 1)
            return state
        # OBMD cadence nfreq > 1: stage on the first step of each group
        # (chunk lengths are nfreq-aligned by construction except a final
        # remainder, which keeps the same group phase)
        groups, rem = divmod(length, nfreq)

        def group(s, _):
            s = _plain_step(cfg, geom, kern, s)
            s, _ = jax.lax.scan(nostage, s, None, length=nfreq - 1)
            return s, None
        first = True
        if groups:
            state = _plain_step(cfg, geom, kern, state, relayout=True)
            state, _ = jax.lax.scan(nostage, state, None, length=nfreq - 1)
            first = False
            if groups > 1:
                state, _ = jax.lax.scan(group, state, None,
                                        length=groups - 1)
        if rem:
            state = _plain_step(cfg, geom, kern, state, relayout=first)
            state, _ = jax.lax.scan(nostage, state, None, length=rem - 1)
        return state

    def chunk(state: State, length: int) -> State:
        return steps(state, length)

    n_chunks, rem = divmod(nsteps, r_every)

    @jax.jit
    def run(state: State) -> State:
        if n_chunks:
            def body(s, _):
                return chunk(s, r_every), None
            state, _ = jax.lax.scan(body, state, None, length=n_chunks)
        if rem:
            state = chunk(state, rem)
        return state

    return run
