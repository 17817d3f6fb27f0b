"""Harmonic dihedral forces with center-bond storage
(dihedral_harmonic.cpp: E = K [1 + d cos(n phi)])."""
import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu.config import (BondHarmonicParams, Capacity,
                             DihedralHarmonicParams, DPDParams, SceneConfig)
from obmd_tpu.forces.bonded import dihedral_forces
from obmd_tpu.geometry import Box

BOX = Box((0.0, 0.0, 0.0), (12.0, 12.0, 12.0), (True, True, True))


def _chain_arrays(x4):
    """State columns for one 4-atom chain 0-1-2-3, padded to 8 slots."""
    n = 8
    x = jnp.zeros((n, 3)).at[:4].set(jnp.asarray(x4))
    alive = jnp.zeros((n,), bool).at[:4].set(True)
    bond1 = jnp.full((n,), -1, jnp.int32).at[:4].set(
        jnp.asarray([1, 0, 1, 2]))
    bond2 = jnp.full((n,), -1, jnp.int32).at[1].set(2).at[2].set(3)
    return x, alive, bond1, bond2


def _phi(x4):
    b1 = x4[1] - x4[0]
    b2 = x4[2] - x4[1]
    b3 = x4[3] - x4[2]
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    s = np.dot(np.cross(n1, n2), b2) / np.linalg.norm(b2)
    c = np.dot(n1, n2)
    return np.arctan2(s, c)


def _ref_energy(x4, K, d, nn):
    return K * (1.0 + d * np.cos(nn * _phi(x4)))


def test_dihedral_force_matches_autodiff():
    K, d, nn = 3.5, 1, 2
    dih = DihedralHarmonicParams(k=K, d=d, n=nn)
    x4 = np.array([[3.0, 3.0, 3.0],
                   [3.9, 3.2, 3.1],
                   [4.5, 4.0, 3.4],
                   [5.3, 4.1, 4.2]])

    def energy(xs):
        b1 = xs[1] - xs[0]
        b2 = xs[2] - xs[1]
        b3 = xs[3] - xs[2]
        n1 = jnp.cross(b1, b2)
        n2 = jnp.cross(b2, b3)
        s = jnp.dot(jnp.cross(n1, n2), b2) / jnp.linalg.norm(b2)
        c = jnp.dot(n1, n2)
        phi = jnp.arctan2(s, c)
        return K * (1.0 + d * jnp.cos(nn * phi))

    fref = -jax.grad(energy)(jnp.asarray(x4, jnp.float32))
    x, alive, b1c, b2c = _chain_arrays(x4)
    f, e = dihedral_forces(dih, BOX, x, b1c, b2c, alive,
                           compute_energy=True)
    np.testing.assert_allclose(np.asarray(f[:4]), np.asarray(fref),
                               rtol=2e-4, atol=5e-6)
    np.testing.assert_allclose(float(jnp.sum(e)),
                               _ref_energy(x4, K, d, nn), rtol=1e-5)
    # zero net force and finite pad rows
    np.testing.assert_allclose(np.asarray(jnp.sum(f, axis=0)),
                               np.zeros(3), atol=1e-5)
    assert np.isfinite(np.asarray(f)).all()


def test_chain_relaxes_to_trans():
    """d=+1, n=1: the minimum is phi=pi (trans); a gauche-started chain
    with damped dynamics relaxes there."""
    from obmd_tpu.config import AngleHarmonicParams, LangevinParams
    from obmd_tpu.integrate import make_run, setup
    from obmd_tpu.state import init_state

    r0 = 0.8
    th = np.deg2rad(70.0)
    # chain with ~110-degree bends and a gauche (~80 deg) dihedral
    x4 = np.array([
        [5.0 + r0 * np.cos(th), 5.0 + r0 * np.sin(th), 5.0],
        [5.0, 5.0, 5.0],
        [5.0 + r0, 5.0, 5.0],
        [5.0 + r0 + r0 * np.cos(th),
         5.0 + r0 * np.sin(th) * np.cos(np.deg2rad(80.0)),
         5.0 + r0 * np.sin(th) * np.sin(np.deg2rad(80.0))]])
    assert abs(np.degrees(abs(_phi(x4)))) < 120
    cfg = SceneConfig(
        box=BOX, masses=(1.0,), dt=0.004,
        pair=DPDParams.create(temp=0.0, cutoff=1.0, seed=5, a0=0.0,
                              gamma=0.0),
        bond=BondHarmonicParams(k=60.0, r0=r0),
        angle=AngleHarmonicParams(k=(30.0,), theta0=(110.0,)),
        dihedral=DihedralHarmonicParams(k=4.0, d=1, n=1),
        langevin=LangevinParams(temp=0.0, damp=0.4, seed=3),
        capacity=Capacity(n_max=8, cell_capacity=8),
        force_path="nlist")
    st = init_state(cfg, x4, bonds=np.array([[1, 2], [2, 3], [3, 4]]))
    from obmd_tpu.integrate import setup as _setup
    st = _setup(cfg, st)
    st = make_run(cfg, 1500)(st)
    xs = np.asarray(st.x)[:4]
    phi = np.degrees(abs(_phi(xs)))
    assert phi > 165.0, phi     # relaxed to trans


def test_deck_dihedral_commands(tmp_path):
    from obmd_tpu.io.script import run_script

    data = tmp_path / "chain.data"
    data.write_text("""4-chain (obmd_tpu test)

4 atoms
1 atom types
3 bonds
1 bond types
1 dihedrals
1 dihedral types

0.0 12.0 xlo xhi
0.0 12.0 ylo yhi
0.0 12.0 zlo zhi

Masses

1 1.0

Atoms

1 1 1 3.0 3.0 3.0
2 1 1 3.9 3.2 3.1
3 1 1 4.5 4.0 3.4
4 1 1 5.3 4.1 4.2

Bonds

1 1 1 2
2 1 2 3
3 1 3 4

Dihedrals

1 1 1 2 3 4
""")
    deck = tmp_path / "in.d"
    deck.write_text(f"""
units lj
boundary p p p
atom_style molecular
read_data {data}
pair_style dpd 0.1 1.0 42
pair_coeff 1 1 2.0 1.0
bond_style harmonic
bond_coeff 1 60.0 0.9
dihedral_style harmonic
dihedral_coeff 1 3.0 1 2
timestep 0.002
thermo 10
run 20
""")
    lines = []
    it = run_script(str(deck), log_fn=lines.append)
    assert it.cfg.dihedral is not None
    assert it.cfg.dihedral.k == 3.0 and it.cfg.dihedral.n == 2
    alive = np.asarray(it.state.alive)
    assert np.isfinite(np.asarray(it.state.x)[alive]).all()


def test_deck_dihedral_validation(tmp_path):
    """Non-chain dihedral declarations refuse loudly."""
    import pytest
    from obmd_tpu.io.script import Interpreter, ScriptError

    data = tmp_path / "bad.data"
    data.write_text("""bad

4 atoms
1 atom types
2 bonds
1 bond types
1 dihedrals
1 dihedral types

0.0 12.0 xlo xhi
0.0 12.0 ylo yhi
0.0 12.0 zlo zhi

Masses

1 1.0

Atoms

1 1 1 3.0 3.0 3.0
2 1 1 3.9 3.2 3.1
3 1 1 4.5 4.0 3.4
4 1 1 5.3 4.1 4.2

Bonds

1 1 1 2
2 1 3 4

Dihedrals

1 1 1 2 3 4
""")
    it = Interpreter(log_fn=lambda *a: None)
    with pytest.raises(ScriptError, match="chain"):
        it.run_lines(f"""
units lj
boundary p p p
atom_style molecular
read_data {data}
pair_style dpd 0.1 1.0 42
pair_coeff 1 1 2.0 1.0
bond_style harmonic
bond_coeff 1 60.0 0.9
dihedral_style harmonic
dihedral_coeff 1 3.0 1 2
timestep 0.002
run 0
""".splitlines())
