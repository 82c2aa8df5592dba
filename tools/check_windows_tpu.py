"""TPU smoke check for physics/windows.py: compile the band-DMA kernels on
the real chip and assert parity with the gather path at production shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from agility_tpu.physics import heightfield as hf
from agility_tpu.physics import patch as pt
from agility_tpu.physics import windows as win

N = int(os.environ.get("BENCH_ENVS", "1024"))
H, W = 480, 640


def main():
    rng = np.random.default_rng(0)
    height = (0.2 * rng.normal(size=(H, W))).astype(np.float32)
    layer_id = np.zeros((H, W), np.int8)
    layer_id[100:150, 200:300] = 1
    layer_id[250:300, 350:450] = 2
    lever = np.zeros((H, W), np.float32)
    lever[350:400, 150:250] = np.linspace(-0.5, 0.5, 100)[None, :]
    ceil = np.full((H, W), hf.NO_CEILING, np.float32)
    ceil[150:200, 100:200] = 0.45
    ceil_l = np.zeros((H, W), np.int8)
    ceil_l[150:200, 150:200] = 1
    base = hf.from_numpy(height, 0.05, (-1.0, -1.0), layer_id=layer_id,
                         lever=lever, ceiling=ceil, ceiling_layer=ceil_l)

    cx = rng.uniform(0.0, H * 0.05 - 2.5, N).astype(np.float32) - 1.0
    cy = rng.uniform(0.0, W * 0.05 - 2.5, N).astype(np.float32) - 1.0
    centers = jnp.asarray(np.stack([cx, cy], -1))
    weights = jnp.asarray(rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32))

    # ---- contact extraction: production size 32 in both band dtypes
    # (f32, and the bf16 shipped default — SimCfg.contact_band_bf16) ----
    for dtype, atol in ((jnp.float32, 1e-6), (jnp.bfloat16, 0.01)):
        csz = 32
        grid = win.attach_bands(base, contact_size=csz, contact_dtype=dtype)
        assert grid.band_contact is not None
        t0 = time.time()
        bp = jax.jit(lambda c, w: win.extract_band_batch(grid, c, csz, w))(
            centers, weights)
        jax.block_until_ready(bp.values)
        print(f"contact kernel [{jnp.dtype(dtype).name}] compiled+ran in "
              f"{time.time()-t0:.1f}s", flush=True)
        ref = jax.jit(lambda c, w: pt.extract_batch(grid, c, csz, w))(
            centers, weights)
        roff = np.asarray(bp.roff); coff = np.asarray(bp.coff)
        vals = np.asarray(bp.values, np.float32)
        ceilv = np.asarray(bp.ceil, np.float32)
        rv = np.asarray(ref.values); rc = np.asarray(ref.ceil)
        err = 0.0
        for i in range(0, N, max(N // 16, 1)):
            got_v = vals[i, roff[i]:roff[i]+csz, coff[i]:coff[i]+csz]
            got_c = ceilv[i, roff[i]:roff[i]+csz, coff[i]:coff[i]+csz]
            err = max(err, np.abs(got_v - rv[i]).max())
            np.testing.assert_allclose(got_v, rv[i], atol=atol)
            np.testing.assert_allclose(got_c, rc[i], atol=max(atol * 50, 1e-6))
        print(f"contact parity [{jnp.dtype(dtype).name}]: OK "
              f"(max|err| {err:.2e} <= {atol})", flush=True)

    # ---- scandots: production auto-size 34 (circumcenter windows) and the
    # legacy 56 ----
    K = 132
    for ssz, spread in ((34, 0.72), (56, 1.3)):
        grid = win.attach_bands(base, scan_size=ssz)
        assert grid.band_scan is not None
        px = centers[:, 0:1] + jnp.asarray(
            rng.uniform(-spread, spread, (N, K)).astype(np.float32))
        py = centers[:, 1:2] + jnp.asarray(
            rng.uniform(-spread, spread, (N, K)).astype(np.float32))
        t0 = time.time()
        got = jax.jit(lambda c, w, a, b: win.measure_scandots_band(
            grid, c, ssz, w, a, b))(centers, weights, px, py)
        jax.block_until_ready(got)
        print(f"scandot kernel [P{ssz}] compiled+ran in {time.time()-t0:.1f}s",
              flush=True)
        refs = jax.jit(lambda c, w, a, b: pt.measure_scandots_batch(
            grid._replace(band_scan=None), c, ssz, w, a, b))(
            centers, weights, px, py)
        # 1 bf16 ULP: the TPU gather path folds under
        # xla_allow_excess_precision (f32 intermediates, no per-op bf16
        # rounds), the kernel rounds per op — interpret-mode parity vs the
        # per-op-rounded semantics is exact (tests/test_windows.py);
        # on-chip they differ by at most one rounding.
        diff = np.abs(np.asarray(got) - np.asarray(refs)).max()
        np.testing.assert_allclose(np.asarray(got), np.asarray(refs),
                                   atol=0.008)
        print(f"scandot parity [P{ssz}]: OK (max|err| {diff:.2e} <= 1 bf16 "
              "ULP vs excess-precision gather)", flush=True)


if __name__ == "__main__":
    main()
