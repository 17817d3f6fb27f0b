import jax.numpy as jnp
import numpy as np

from obmd_tpu.geometry import Box, RegionBlock


def test_wrap_periodic_axes_only():
    box = Box((0.0, 0.0, 0.0), (10.0, 4.0, 4.0), (False, True, True))
    x = jnp.asarray([[-1.0, 4.5, -0.5], [11.0, 0.0, 3.9]])
    w = np.asarray(box.wrap(x))
    # x untouched (free boundary), y,z wrapped
    np.testing.assert_allclose(w[:, 0], [-1.0, 11.0])
    np.testing.assert_allclose(w[0, 1:], [0.5, 3.5], atol=1e-6)
    np.testing.assert_allclose(w[1, 1:], [0.0, 3.9], atol=1e-6)


def test_min_image():
    box = Box((0.0, 0.0, 0.0), (10.0, 4.0, 4.0), (False, True, True))
    d = jnp.asarray([[9.0, 3.5, -3.5]])
    m = np.asarray(box.min_image(d))
    np.testing.assert_allclose(m[0], [9.0, -0.5, 0.5], atol=1e-6)


def test_region_match_inclusive():
    r = RegionBlock((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.5, 0.5],
                       [1.0001, 0.5, 0.5], [-0.0001, 0.5, 0.5]])
    m = np.asarray(r.match(pts))
    assert m.tolist() == [True, True, True, False, False]


def test_degenerate_region_matches_nothing_physical():
    # the example's zero-extent shear regions (input.py:90-91)
    r = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    pts = jnp.asarray([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0]])
    m = np.asarray(r.match(pts))
    assert m.tolist() == [False, True]


def test_region_sphere_match():
    import jax.numpy as jnp
    from obmd_tpu.geometry import RegionSphere
    r = RegionSphere(center=(2.0, 2.0, 2.0), radius=1.0)
    pts = jnp.asarray([[2.0, 2.0, 2.0],   # center
                       [3.0, 2.0, 2.0],   # on the surface (inclusive)
                       [3.01, 2.0, 2.0],  # just outside
                       [2.5, 2.5, 2.5]])  # inside
    m = r.match(pts)
    assert m.tolist() == [True, True, False, True]
    assert r.lo == (1.0, 1.0, 1.0) and r.hi == (3.0, 3.0, 3.0)


def test_region_cylinder_match():
    import jax.numpy as jnp
    import pytest
    from obmd_tpu.geometry import RegionCylinder
    # axis y: (c1, c2) = (x, z) centers per the LAMMPS argument order
    r = RegionCylinder(axis="y", c1=1.0, c2=2.0, radius=0.5,
                       lo_axis=0.0, hi_axis=4.0)
    pts = jnp.asarray([[1.0, 2.0, 2.0],    # on axis, inside span
                       [1.5, 2.0, 2.0],    # on the surface
                       [1.6, 2.0, 2.0],    # outside radially
                       [1.0, 4.01, 2.0],   # outside axially
                       [1.0, 0.0, 2.0]])   # inclusive axial face
    assert r.match(pts).tolist() == [True, True, False, False, True]
    with pytest.raises(ValueError):
        RegionCylinder(axis="w", c1=0, c2=0, radius=1, lo_axis=0, hi_axis=1)


def test_sphere_region_deck(tmp_path):
    """create_atoms into a sphere region + fix obmd refusing curved buffer
    regions loudly (region_sphere.cpp / fix obmd's block-only geometry)."""
    import numpy as np
    from obmd_tpu.io.script import Interpreter, ScriptError
    deck = """
units       lj
boundary    p p p
atom_style  atomic
lattice     fcc 0.8442
region      boxr block 0 6 0 6 0 6
create_box  1 boxr
region      ball sphere 3 3 3 2
create_atoms 1 region ball
mass        1 1.0
pair_style  dpd 1.0 1.0 77
pair_coeff  * * 25.0 4.5 1.0
run         0
"""
    it = Interpreter()
    it.run_lines(deck.splitlines())
    x = np.asarray(it.state.x)[np.asarray(it.state.alive)]
    a = it.lattice[1]
    c = 3.0 * a
    d = np.linalg.norm(x - c, axis=1)
    assert len(x) > 50
    assert d.max() <= 2.0 * a + 1e-6     # every atom inside the sphere
