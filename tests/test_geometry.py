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
