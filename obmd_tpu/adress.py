"""AdResS per-atom field maintenance: molecule center-of-mass pos/vel.

The reference registers `cms_mol[3]` / `vcms_mol[3]` per atom
(atom.cpp:550-557) and forwards them in every halo exchange
(atom_vec_adress.cpp:36-61); the OBMD fork computes molecule COMs with an
O(natoms) scan + MPI reduce (`mol_center_of_mass`,
fix_obmd_merged.cpp:1734-1754).

Here the COM is computed by directed message passing over the bond-partner
chain graph (State.bond1/bond2 hold partner SLOTS, exact under relayout):
msg(i->p) carries the mass-weighted sums of the subtree reached from i away
from p.  For tree/chain topologies this is exact after `rounds` >= graph
diameter iterations — pure gathers, no segment reductions over unbounded
molecule ids.
"""
from __future__ import annotations

import jax.numpy as jnp

from .config import SceneConfig
from .state import State, per_atom_mass


def mol_com_rounds(cfg: SceneConfig) -> int:
    """Graph diameter bound: template molecules know their size; otherwise
    fall back to a small constant (dimers/trimers)."""
    if cfg.obmd is not None and cfg.obmd.mol is not None:
        return max(1, cfg.obmd.mol_natoms_max - 1)
    return 2


def update_mol_com(cfg: SceneConfig, state: State,
                   rounds: int = 0) -> State:
    """Refresh cms_mol / vcms_mol for every alive atom with mol != 0."""
    if rounds <= 0:
        rounds = mol_com_rounds(cfg)
    n = state.capacity
    dtype = state.x.dtype
    m = per_atom_mass(cfg, state)
    member = state.alive & (state.mol != 0)
    w = jnp.where(member, m, jnp.zeros((), dtype))
    # payload per atom: [m*x (3), m*v (3), m (1)]
    A = jnp.concatenate([w[:, None] * state.x, w[:, None] * state.v,
                         w[:, None]], axis=1)                    # [N,7]

    cols = state.bond_partners
    K = len(cols)
    ps_all = tuple(jnp.where(member, c, -1) for c in cols)
    me = jnp.arange(n, dtype=jnp.int32)

    def incoming(msgs, p):
        """The partner's message directed at me: partner p stores its
        message toward its k-th partner column in msgs[k] — pick by which
        of p's partner slots points back to me (exactly one on a simple
        bond graph)."""
        ps = jnp.clip(p, 0, n - 1)
        from_p = jnp.zeros_like(A)
        for k in range(K):
            toward_me = (cols[k][ps] == me)[:, None]
            from_p = jnp.where(toward_me, msgs[k][ps], from_p)
        return jnp.where((p >= 0)[:, None], from_p, 0.0)

    msgs = [jnp.zeros_like(A) for _ in range(K)]
    for _ in range(rounds):
        ins = [incoming(msgs, p) for p in ps_all]
        # toward p_k: me + everything behind every OTHER partner
        msgs = [A + sum(ins[j] for j in range(K) if j != k)
                if K > 1 else A
                for k in range(K)]
    total = A + sum(incoming(msgs, p) for p in ps_all)

    W = jnp.maximum(total[:, 6:7], 1e-30)
    cms = jnp.where(member[:, None], total[:, 0:3] / W, 0.0)
    vcms = jnp.where(member[:, None], total[:, 3:6] / W, 0.0)
    return state.replace(cms_mol=cms.astype(dtype),
                         vcms_mol=vcms.astype(dtype))
