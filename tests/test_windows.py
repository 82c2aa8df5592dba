"""Parity tests for the Pallas band-DMA window extraction (physics/windows.py).

The band path must reproduce the gather path (physics/patch.py) exactly:
same window origins, same folded values on every window cell, same scandot
heights.  The kernels run in Pallas interpret mode on the CPU backend
(AGILITY_WINDOWS=interpret per-test); the TPU-compiled path shares all of
the index math and fold arithmetic with interpret mode.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agility_tpu.physics import heightfield as hf
from agility_tpu.physics import patch as pt
from agility_tpu.physics import windows as win

N = 16
H, W = 96, 128


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("AGILITY_WINDOWS", "interpret")


def _layered_world(rng, with_ceiling=True):
    """Random rough world with movable layers, a seesaw lever field, and
    (optionally) a ceiling with its own movable layer."""
    height = (0.2 * rng.normal(size=(H, W))).astype(np.float32)
    layer_id = np.zeros((H, W), np.int8)
    layer_id[20:30, 40:60] = 1
    layer_id[50:60, 70:90] = 2
    lever = np.zeros((H, W), np.float32)
    lever[70:80, 30:50] = np.linspace(-0.5, 0.5, 20)[None, :]
    ceil = ceil_l = None
    if with_ceiling:
        ceil = np.full((H, W), hf.NO_CEILING, np.float32)
        ceil[30:40, 20:40] = 0.45
        ceil_l = np.zeros((H, W), np.int8)
        ceil_l[30:40, 30:40] = 1
    return hf.from_numpy(height, 0.05, origin_xy=(-1.0, -1.0),
                         layer_id=layer_id, lever=lever,
                         ceiling=ceil, ceiling_layer=ceil_l)


def _centers(rng):
    # world x in [-1, -1 + H*0.05), y in [-1, -1 + W*0.05); keep margin
    cx = rng.uniform(-0.4, 2.9, N).astype(np.float32)
    cy = rng.uniform(-0.4, 4.5, N).astype(np.float32)
    return jnp.asarray(np.stack([cx, cy], -1))


def test_contact_band_matches_gather(rng):
    """extract_band_batch folded values == extract_batch on every window
    cell (floor and ceiling), with per-env layer weights + lever tilt."""
    size = 24
    grid = win.attach_bands(_layered_world(rng), contact_size=size)
    assert grid.band_contact is not None
    centers = _centers(rng)
    weights = jnp.asarray(
        rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32))  # 2 layers + lever

    ref = pt.extract_batch(grid, centers, size, weights)
    bp = win.extract_band_batch(grid, centers, size, weights)

    np.testing.assert_array_equal(np.asarray(bp.x0), np.asarray(ref.x0))
    np.testing.assert_array_equal(np.asarray(bp.y0), np.asarray(ref.y0))
    roff = np.asarray(bp.roff)
    coff = np.asarray(bp.coff)
    vals = np.asarray(bp.values)
    ceil = np.asarray(bp.ceil)
    rv = np.asarray(ref.values)
    rc = np.asarray(ref.ceil)
    for i in range(N):
        got = vals[i, roff[i]:roff[i] + size, coff[i]:coff[i] + size]
        np.testing.assert_allclose(got, rv[i], atol=1e-6)
        gotc = ceil[i, roff[i]:roff[i] + size, coff[i]:coff[i] + size]
        np.testing.assert_allclose(gotc, rc[i], atol=1e-6)


def test_contact_band_no_layers(rng):
    """Plain-height K=1 stack, no weights — kernel mechanism check only
    (attach_bands deliberately skips K=1 worlds in production, where the
    gather path measures faster; build the stack directly)."""
    size = 24
    height = (0.15 * rng.normal(size=(H, W))).astype(np.float32)
    grid = hf.from_numpy(height, 0.05, (-1.0, -1.0))
    grid = grid._replace(
        band_contact=win.build_bands(grid, size, jnp.float32, True))
    centers = _centers(rng)
    ref = pt.extract_batch(grid, centers, size, None)
    bp = win.extract_band_batch(grid, centers, size, None)
    assert bp.ceil is None
    roff = np.asarray(bp.roff)
    coff = np.asarray(bp.coff)
    vals = np.asarray(bp.values)
    rv = np.asarray(ref.values)
    for i in range(N):
        got = vals[i, roff[i]:roff[i] + size, coff[i]:coff[i] + size]
        np.testing.assert_allclose(got, rv[i], atol=1e-6)


def test_band_sample_hn_matches_patch_sampler(rng):
    """band_sample_hn (offset-shifted, rectangular) == soa.patch_sample_hn
    on the gather patch for random in-window query points."""
    from agility_tpu.physics import soa

    size = 24
    grid = win.attach_bands(_layered_world(rng, with_ceiling=False),
                            contact_size=size)
    centers = _centers(rng)
    weights = jnp.asarray(
        rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32))
    ref = pt.extract_batch(grid, centers, size, weights)
    bp = win.extract_band_batch(grid, centers, size, weights)

    S = 7
    qx = centers[:, 0][None] + jnp.asarray(
        rng.uniform(-0.5, 0.5, (S, N)).astype(np.float32))
    qy = centers[:, 1][None] + jnp.asarray(
        rng.uniform(-0.5, 0.5, (S, N)).astype(np.float32))

    vals_T = jnp.transpose(ref.values, (1, 2, 0))
    h_ref, n_ref = soa.patch_sample_hn(
        vals_T, ref.x0, ref.y0, grid.origin, grid.hscale, qx, qy)
    band_T = jnp.transpose(bp.values, (1, 2, 0))
    h_got, n_got = win.band_sample_hn(
        band_T, bp.x0, bp.y0, bp.roff, bp.coff, grid.origin, grid.hscale,
        size, qx, qy)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref),
                               atol=1e-5)
    for a, b in zip(n_got, n_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_scandots_band_matches_gather(rng):
    """measure_scandots_band == measure_scandots_batch (same bf16
    arithmetic) over a 56-cell window on a layered world."""
    size = 56
    grid = win.attach_bands(_layered_world(rng, with_ceiling=False),
                            scan_size=size)
    assert grid.band_scan is not None
    centers = _centers(rng)
    weights = jnp.asarray(
        rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32))
    K = 17
    px = centers[:, 0:1] + jnp.asarray(
        rng.uniform(-1.3, 1.3, (N, K)).astype(np.float32))
    py = centers[:, 1:2] + jnp.asarray(
        rng.uniform(-1.3, 1.3, (N, K)).astype(np.float32))

    # gather reference: mask the band off the grid so the dispatch in
    # measure_scandots_batch takes the gather body
    ref = pt.measure_scandots_batch(
        grid._replace(band_scan=None), centers, size, weights, px, py)
    got = win.measure_scandots_band(grid, centers, size, weights, px, py)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_enabled_guards_size_mismatch(rng):
    """A band stack built for one window size must not be used for
    another (stride mismatch) — enabled() falls back to gather."""
    grid = win.attach_bands(_layered_world(rng), contact_size=24)
    assert win.enabled(grid, size=24)
    assert not win.enabled(grid, size=56)     # stride 8 vs built stride 32
    assert not win.enabled(hf.flat_grid(), size=24)


def test_attach_bands_skips_tiny_worlds():
    g = win.attach_bands(hf.flat_grid(), contact_size=24, scan_size=56)
    assert g.band_contact is None and g.band_scan is None


def test_attach_bands_skips_single_surface_worlds(rng):
    """attach_bands must leave K=1 (plain-height) worlds on the gather
    path: measured slower banded (495k vs 661k env-steps/s BBC @4096)."""
    height = (0.15 * rng.normal(size=(H, W))).astype(np.float32)
    g = win.attach_bands(hf.from_numpy(height, 0.05, (-1.0, -1.0)),
                         contact_size=24, scan_size=56)
    assert g.band_contact is None and g.band_scan is None


def test_contact_band_bf16_matches_f32_within_rounding(rng):
    """bf16 contact band stack (SimCfg.contact_band_bf16): folded window
    values and bilinear height samples within bf16 rounding of the f32
    band path (<= 1 cm on course-scale heights)."""
    world = _layered_world(rng)
    g32 = win.attach_bands(world, contact_size=24)
    g16 = win.attach_bands(world, contact_size=24, contact_dtype=jnp.bfloat16)
    assert g16.band_contact.dtype == jnp.bfloat16
    centers = _centers(rng)
    weights = jnp.asarray(rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32))
    bp32 = win.extract_band_batch(g32, centers, 24, weights)
    bp16 = win.extract_band_batch(g16, centers, 24, weights)
    np.testing.assert_array_equal(np.asarray(bp16.x0), np.asarray(bp32.x0))

    S = 9
    qx = centers[:, 0][None] + jnp.asarray(
        rng.uniform(-0.5, 0.5, (S, N)).astype(np.float32))
    qy = centers[:, 1][None] + jnp.asarray(
        rng.uniform(-0.5, 0.5, (S, N)).astype(np.float32))
    h32, _ = win.band_sample_hn(
        jnp.transpose(bp32.values, (1, 2, 0)), bp32.x0, bp32.y0, bp32.roff,
        bp32.coff, world.origin, world.hscale, 24, qx, qy)
    h16, _ = win.band_sample_hn(
        jnp.transpose(bp16.values, (1, 2, 0)), bp16.x0, bp16.y0, bp16.roff,
        bp16.coff, world.origin, world.hscale, 24, qx, qy)
    np.testing.assert_allclose(np.asarray(h16), np.asarray(h32), atol=0.01)
    c32 = win.band_sample_ceiling(
        jnp.transpose(bp32.ceil, (1, 2, 0)), bp32.x0, bp32.y0, bp32.roff,
        bp32.coff, world.origin, world.hscale, 24, qx, qy)[0]
    c16 = win.band_sample_ceiling(
        jnp.transpose(bp16.ceil, (1, 2, 0)), bp16.x0, bp16.y0, bp16.roff,
        bp16.coff, world.origin, world.hscale, 24, qx, qy)[0]
    np.testing.assert_allclose(np.asarray(c16), np.asarray(c32), atol=0.5)


@pytest.mark.slow
def test_contact_band_bf16_solver_precision(rng):
    """Solver-precision gate for the bf16 contact band (PERF_NOTES r3:
    'bf16 the 5-surface contact band needs a solver-precision check'):
    stepping the full agility env (SoA engine + Pallas windows, interpret
    mode) with bf16 vs f32 contact bands must produce near-identical
    robot states over multiple control steps."""
    import dataclasses

    import jax

    from agility_tpu.envs.go2_agility import Go2AgilityEnv
    from agility_tpu.envs.tsc_config import tsc_smoke_cfg

    cfg16 = tsc_smoke_cfg(num_envs=4, courses=2)
    assert cfg16.sim.contact_band_bf16     # shipped default
    cfg32 = dataclasses.replace(
        cfg16, sim=dataclasses.replace(cfg16.sim, contact_band_bf16=False))
    env16, env32 = Go2AgilityEnv(cfg16), Go2AgilityEnv(cfg32)
    assert env16.grid.band_contact.dtype == jnp.bfloat16
    assert env32.grid.band_contact.dtype == jnp.float32

    s16 = env16.init_state(jax.random.PRNGKey(0))
    s32 = env32.init_state(jax.random.PRNGKey(0))
    acts = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (4, 12))
    step16 = jax.jit(env16.step)
    step32 = jax.jit(env32.step)
    for _ in range(5):
        s16, o16 = step16(s16, acts)
        s32, o32 = step32(s32, acts)
    np.testing.assert_allclose(np.asarray(s16.sim.base_pos),
                               np.asarray(s32.sim.base_pos), atol=5e-3)
    np.testing.assert_allclose(np.asarray(s16.sim.dof_pos),
                               np.asarray(s32.sim.dof_pos), atol=2e-2)
    assert np.isfinite(np.asarray(o16.rew)).all()


@pytest.mark.slow
def test_jit_with_world_threads_bands_explicitly(monkeypatch):
    """jit_with_world passes the band stacks as jit arguments via the
    wrapped callable's `grid=` keyword (r5: no trace-time env.grid
    mutation).  Forcing the interpret window mode attaches bands on CPU so
    the full path — init_state, step, and the TSC train_iteration — runs
    through the threaded grid."""
    monkeypatch.setenv("AGILITY_WINDOWS", "interpret")
    import jax
    import jax.numpy as jnp

    from agility_tpu.envs.go2_agility import Go2AgilityEnv
    from agility_tpu.envs.tsc_config import tsc_smoke_cfg
    from agility_tpu.learn.jitwrap import jit_with_world
    from agility_tpu.learn.ppo_tsc import TscAlgoCfg, TscPPO
    from agility_tpu.learn.runner_tsc import load_bbc_frozen

    env = Go2AgilityEnv(tsc_smoke_cfg(num_envs=4, courses=2))
    assert env.grid.band_contact is not None or env.grid.band_scan is not None
    es = jit_with_world(env.init_state, env)(jax.random.PRNGKey(0))
    es2, out = jit_with_world(env.step, env)(es, jnp.zeros((4, 12)))
    assert np.isfinite(np.asarray(out.obs)).all()
    alg = TscPPO(env, load_bbc_frozen(None, seed=0),
                 TscAlgoCfg(num_steps_per_env=2, num_learning_epochs=1,
                            num_mini_batches=2), seed=0)
    ts = jax.jit(alg.init_train_state)(jax.random.PRNGKey(2))
    dh = jnp.repeat(es2.disc_obs[:, None], env.cfg.env.disc_obs_len, axis=1)
    _, _, _, m = jit_with_world(alg.train_iteration, env)(
        ts, es2, dh, jnp.asarray(0))
    assert np.isfinite(float(m["rollout/r_total"]))
