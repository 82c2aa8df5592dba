"""Gather-free patch sampling vs direct grid sampling."""
import numpy as np
import jax
import jax.numpy as jnp

from agility_tpu.physics import heightfield as hf
from agility_tpu.physics import patch as pt


def make_grid(rng):
    h = rng.normal(size=(64, 64)).astype(np.float32) * 0.1
    return hf.from_numpy(h, 0.1, origin_xy=(-3.2, -3.2))


def test_patch_height_matches_grid(rng):
    grid = make_grid(rng)
    center = jnp.asarray([0.3, -0.4])
    p = pt.extract(grid, center, 24)
    x = jnp.asarray(rng.uniform(-0.6, 0.6, 30) + 0.3)
    y = jnp.asarray(rng.uniform(-0.6, 0.6, 30) - 0.4)
    h_patch = pt.sample_height(p, x, y)
    h_grid = hf.sample_height(grid, x, y)
    np.testing.assert_allclose(np.asarray(h_patch), np.asarray(h_grid),
                               rtol=1e-4, atol=1e-5)


def test_patch_normal_matches_grid(rng):
    grid = make_grid(rng)
    p = pt.extract(grid, jnp.asarray([0.0, 0.0]), 24)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, 20))
    y = jnp.asarray(rng.uniform(-0.5, 0.5, 20))
    h, n = pt.sample_height_and_normal(p, x, y)
    np.testing.assert_allclose(np.asarray(h), np.asarray(hf.sample_height(grid, x, y)),
                               atol=1e-4)
    # normals: the grid version uses central differences at +-hscale; the
    # patch version is the exact bilinear gradient — compare loosely and
    # check unit norm + upward orientation
    nn = np.asarray(n)
    np.testing.assert_allclose(np.linalg.norm(nn, axis=-1), 1.0, atol=1e-5)
    assert (nn[:, 2] > 0).all()


def test_patch_min3_matches_grid(rng):
    grid = make_grid(rng)
    p = pt.extract(grid, jnp.asarray([0.0, 0.0]), 24)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, 25))
    y = jnp.asarray(rng.uniform(-0.5, 0.5, 25))
    got = pt.sample_height_min3(p, x, y)
    want = hf.sample_height_min3(grid, x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_patch_layers(rng):
    h = np.zeros((40, 40), np.float32)
    lid = np.zeros((40, 40), np.int8)
    lid[18:22, 18:22] = 1
    grid = hf.from_numpy(h, 0.1, origin_xy=(-2.0, -2.0), layer_id=lid)
    w = jnp.asarray([0.25, 0.0])
    p = pt.extract(grid, jnp.asarray([0.0, 0.0]), 24, weights=w)
    hq = pt.sample_height(p, jnp.asarray([0.0]), jnp.asarray([0.0]))
    np.testing.assert_allclose(float(hq[0]), 0.25, atol=1e-5)
    hq2 = pt.sample_height(p, jnp.asarray([-1.0]), jnp.asarray([-1.0]))
    np.testing.assert_allclose(float(hq2[0]), 0.0, atol=1e-5)


def test_patch_clamps_at_border(rng):
    grid = make_grid(rng)
    # center near the grid corner: patch start clamps, queries still match
    p = pt.extract(grid, jnp.asarray([-3.0, -3.0]), 24)
    x = jnp.asarray([-3.1, -2.8])
    y = jnp.asarray([-3.1, -2.9])
    np.testing.assert_allclose(
        np.asarray(pt.sample_height(p, x, y)),
        np.asarray(hf.sample_height(grid, x, y)), atol=1e-5)
