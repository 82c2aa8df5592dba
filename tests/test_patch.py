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


def test_extract_batch_matches_vmapped_extract(rng):
    """extract_batch (row-gather + exact one-hot MXU contraction) must be
    numerically identical to vmap(extract) — including movable layers,
    seesaw lever folding, and the ceiling surface."""
    N = 16
    h = rng.normal(size=(64, 64)).astype(np.float32) * 0.1
    lid = np.zeros((64, 64), np.int8)
    lid[20:30, 20:30] = 1
    lid[40:50, 10:20] = 2
    lever = np.zeros((64, 64), np.float32)
    lever[10:16, 40:50] = np.linspace(-1, 1, 6)[:, None]
    ceil = np.full((64, 64), 100.0, np.float32)
    ceil[25:35, 25:35] = 0.5
    cl = np.zeros((64, 64), np.int8)
    cl[30:35, 25:35] = 2
    grid = hf.from_numpy(h, 0.1, origin_xy=(-3.2, -3.2), layer_id=lid,
                         lever=lever, ceiling=ceil, ceiling_layer=cl)
    centers = jnp.asarray(rng.uniform(-3.0, 3.0, (N, 2)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32))

    ref = jax.vmap(lambda c, wi: pt.extract(grid, c, 24, wi))(centers, w)
    got = pt.extract_batch(grid, centers, 24, w)
    np.testing.assert_array_equal(np.asarray(got.x0), np.asarray(ref.x0))
    np.testing.assert_array_equal(np.asarray(got.y0), np.asarray(ref.y0))
    np.testing.assert_allclose(np.asarray(got.values), np.asarray(ref.values),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.min3), np.asarray(ref.min3),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.ceil), np.asarray(ref.ceil),
                               atol=1e-6)

    # plain grid (no layers), no weights
    grid2 = make_grid(rng)
    ref2 = jax.vmap(lambda c: pt.extract(grid2, c, 24))(centers)
    got2 = pt.extract_batch(grid2, centers, 24)
    np.testing.assert_allclose(np.asarray(got2.values), np.asarray(ref2.values),
                               atol=1e-6)

    # batched min3 sampler parity
    x = jnp.asarray(rng.uniform(-3.0, 3.0, (N, 7)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-3.0, 3.0, (N, 7)).astype(np.float32))
    want = jax.vmap(lambda p_, xi, yi: pt.sample_height_min3(p_, xi, yi),
                    in_axes=(pt.Patch(values=0, min3=0, x0=0, y0=0,
                                      hscale=0, origin=0, ceil=0), 0, 0)
                    )(ref, x, y)
    have = pt.sample_height_min3_batch(got, x, y)
    np.testing.assert_allclose(np.asarray(have), np.asarray(want), atol=1e-5)


def _wide_grid(rng, H=96, W=220):
    """A grid wide enough (W > 64) to exercise the stride-banded gather."""
    h = rng.normal(size=(H, W)).astype(np.float32) * 0.1
    lid = np.zeros((H, W), np.int8)
    lid[20:30, 60:120] = 1
    lid[40:60, 130:180] = 2
    lever = np.zeros((H, W), np.float32)
    lever[10:16, 150:190] = np.linspace(-1, 1, 6)[:, None]
    return hf.from_numpy(h, 0.1, origin_xy=(-4.8, -11.0), layer_id=lid,
                         lever=lever)


def test_extract_batch_stride_band_matches_vmapped_extract(rng):
    """Wide grids take the overlapping 64-lane stride-block band — must
    remain numerically identical to vmap(extract) for several window
    sizes (engine 24/32 use stride 32, scandot 56 uses stride 8)."""
    grid = _wide_grid(rng)
    N = 24
    centers = jnp.asarray(
        np.stack([rng.uniform(-4.8, 4.6, N),
                  rng.uniform(-11.0, 10.8, N)], -1).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32))
    for size in (24, 32, 56):
        ref = jax.vmap(lambda c, wi: pt.extract(grid, c, size, wi))(centers, w)
        got = pt.extract_batch(grid, centers, size, w)
        np.testing.assert_array_equal(np.asarray(got.x0), np.asarray(ref.x0))
        np.testing.assert_array_equal(np.asarray(got.y0), np.asarray(ref.y0))
        np.testing.assert_allclose(np.asarray(got.values),
                                   np.asarray(ref.values), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.min3),
                                   np.asarray(ref.min3), atol=1e-6)


def test_measure_scandots_matches_patch_sampling(rng):
    """Direct band-sampled scandot measure == extract_batch + min3 sampling
    up to bf16 rounding of the gathered floor stack (<~1 cm at course
    heights)."""
    grid = _wide_grid(rng)
    N, K = 24, 13
    centers = jnp.asarray(
        np.stack([rng.uniform(-4.8, 4.6, N),
                  rng.uniform(-11.0, 10.8, N)], -1).astype(np.float32))
    w = jnp.asarray(rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32))
    px = centers[:, :1] + jnp.asarray(rng.uniform(-1.3, 1.3, (N, K)).astype(np.float32))
    py = centers[:, 1:] + jnp.asarray(rng.uniform(-1.3, 1.3, (N, K)).astype(np.float32))
    for size in (56, 32):
        p = pt.extract_batch(grid, centers, size, w)
        want = pt.sample_height_min3_batch(p, px, py)
        got = pt.measure_scandots_batch(grid, centers, size, w, px, py)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1.5e-2)
