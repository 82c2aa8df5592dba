"""Microbenchmark: per-env terrain-window extraction formulations on TPU.

The round-3 TSC profile (tools/trace_agg.py on bench_tsc) shows 52% of the
teacher iteration inside patch.py window extraction: the banded row gather
(patch.py:163/259) plus the one-hot column contraction (patch.py:166).
This tool A/B-tests formulations on course-world shapes so the production
choice is measured, not guessed:

  A  current: banded gather (H, nb, band, K) + one-hot einsum
  B  K-leading banded gather (K, H, nb, band) + one-hot einsum
  C  lane-concat band (H, nb, K*band) + static lane slices + einsum
  D  pallas scalar-prefetch kernel: per-env async DMA HBM->VMEM windows

Run:  python tools/bench_windows.py            (TPU)
"""
import functools
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

H = W = 1800          # TSC course world at 0.05 m
N = int(os.environ.get("BENCH_ENVS", "6144"))
T = 24                # steps per timed scan (matches rollout length)


def timed(fn, *args, iters=3, label=""):
    """Time fn inside a lax.scan with full feedback (PERF_NOTES lesson 4)."""
    def step(carry, _):
        x0, y0, acc = carry
        out = fn(x0, y0)
        s = jnp.sum(out.astype(jnp.float32))
        # feed the result back into the next step's indices so nothing hoists
        bump = (s.astype(jnp.int32) & 1)
        return (x0 + bump, y0 + bump, acc + s), None

    @jax.jit
    def run(x0, y0):
        (x0, y0, acc), _ = jax.lax.scan(step, (x0, y0, jnp.float32(0)), None, length=T)
        return acc

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(0, H - 80, N), jnp.int32)
    y0 = jnp.asarray(rng.integers(0, W - 80, N), jnp.int32)
    acc = run(x0, y0)
    jax.block_until_ready(acc)
    t0 = time.time()
    for _ in range(iters):
        acc = run(x0, y0)
    jax.block_until_ready(acc)
    ms = (time.time() - t0) / iters / T * 1e3
    print(f"{label:44s} {ms:8.3f} ms/step", flush=True)
    return ms


def make_surfaces(K, dtype):
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.normal(0, 0.3, (K, H, W)).astype(np.float32)).astype(dtype)


# ---------------------------------------------------------------- A: current
def banded_gather(Gs_hwk, P, band, stride):
    """Current production formulation (patch.py:_column_bands + gather +
    one-hot einsum), shapes (H, nb, band, K)."""
    Hh, Ww, K = Gs_hwk.shape
    nb = max((Ww - P) // stride + 1, 1)
    Wp = (nb - 1) * stride + band
    Gp = jnp.pad(Gs_hwk, ((0, 0), (0, max(Wp - Ww, 0)), (0, 0)))
    R = Gp.reshape(Hh, Wp // stride, stride, K)
    reps = band // stride
    G2 = jnp.concatenate([R[:, i:i + nb] for i in range(reps)], axis=2)

    def fn(x0, y0):
        yb = jnp.clip(y0 // stride, 0, nb - 1)
        off = y0 - yb * stride
        ix = x0[:, None] + jnp.arange(P)
        rows = G2[ix, yb[:, None]]                    # (N, P, band, K)
        iy = off[:, None, None] + jnp.arange(P)[None, None, :]
        oh = (jnp.arange(band)[None, :, None] == iy).astype(jnp.bfloat16)
        return jnp.einsum("npjk,njq->npqk", rows, oh,
                          precision=jax.lax.Precision.HIGHEST)
    return fn


# ------------------------------------------------------------- B: K-leading
def banded_gather_kfirst(Gs_khw, P, band, stride):
    K, Hh, Ww = Gs_khw.shape
    nb = max((Ww - P) // stride + 1, 1)
    Wp = (nb - 1) * stride + band
    Gp = jnp.pad(Gs_khw, ((0, 0), (0, 0), (0, max(Wp - Ww, 0))))
    R = Gp.reshape(K, Hh, Wp // stride, stride)
    reps = band // stride
    G2 = jnp.concatenate([R[:, :, i:i + nb] for i in range(reps)], axis=3)

    def fn(x0, y0):
        yb = jnp.clip(y0 // stride, 0, nb - 1)
        off = y0 - yb * stride
        ix = x0[:, None] + jnp.arange(P)
        rows = G2[:, ix, yb[:, None]]                 # (K, N, P, band)
        iy = off[:, None, None] + jnp.arange(P)[None, None, :]
        oh = (jnp.arange(band)[None, :, None] == iy).astype(jnp.bfloat16)
        return jnp.einsum("knpj,njq->knpq", rows, oh,
                          precision=jax.lax.Precision.HIGHEST)
    return fn


# ----------------------------------------------------------- C: lane-concat
def banded_gather_laneconcat(Gs_khw, P, band, stride):
    """Surfaces concatenated along the lane (band) axis: one gather of
    (H, nb, K*band); per-surface selection by static lane slice."""
    K, Hh, Ww = Gs_khw.shape
    nb = max((Ww - P) // stride + 1, 1)
    Wp = (nb - 1) * stride + band
    Gp = jnp.pad(Gs_khw, ((0, 0), (0, 0), (0, max(Wp - Ww, 0))))
    R = Gp.reshape(K, Hh, Wp // stride, stride)
    reps = band // stride
    G2 = jnp.concatenate([R[:, :, i:i + nb] for i in range(reps)], axis=3)
    G2 = jnp.concatenate([G2[k] for k in range(K)], axis=-1)   # (H, nb, K*band)

    def fn(x0, y0):
        yb = jnp.clip(y0 // stride, 0, nb - 1)
        off = y0 - yb * stride
        ix = x0[:, None] + jnp.arange(P)
        rows = G2[ix, yb[:, None]]                    # (N, P, K*band)
        iy = off[:, None, None] + jnp.arange(P)[None, None, :]
        oh = (jnp.arange(band)[None, :, None] == iy).astype(jnp.bfloat16)
        outs = [jnp.einsum("npj,njq->npq", rows[..., k * band:(k + 1) * band],
                           oh, precision=jax.lax.Precision.HIGHEST)
                for k in range(K)]
        return jnp.stack(outs, -1)
    return fn


# --------------------------------------------------- E: pallas banded DMA
def pallas_band_dma(Gs_khw, P, band=64, stride=32, EB=16, interpret=False):
    """Banded window extraction as per-env DMA: world stored as overlapping
    column bands (nb, H, K*band) — dim 0 (band index) is untiled so an
    arbitrary per-env index is legal, dim 1 start is 8-aligned (x0a), lanes
    are copied whole.  No gather, no one-hot selection: the output IS the
    (P8, K*band) window at origin (x0a, yb*stride)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, Hh, Ww = Gs_khw.shape
    al = 8 if Gs_khw.dtype == jnp.float32 else 16   # sublane tile
    nb = max((Ww - P) // stride + 1, 1)
    Wp = (nb - 1) * stride + band
    Gp = jnp.pad(Gs_khw, ((0, 0), (0, 0), (0, max(Wp - Ww, 0))))
    R = Gp.reshape(K, Hh, Wp // stride, stride)
    reps = band // stride
    G2 = jnp.concatenate([R[:, :, i:i + nb] for i in range(reps)], axis=3)
    # (nb, H, K*band), H padded to a multiple of the sublane tile and the
    # lane (band-stack) dim padded to a multiple of 128
    Hp = -(-Hh // al) * al
    KB = -(-(K * band) // 128) * 128
    G2 = jnp.pad(jnp.transpose(G2, (2, 1, 0, 3)).reshape(nb, Hh, K * band),
                 ((0, 0), (0, Hp - Hh), (0, KB - K * band)))
    P8 = -(-(P + al) // al) * al

    def kernel(x0a_ref, yb_ref, g_ref, out_ref, sems):
        blk = pl.program_id(0)

        def issue(e, _):
            i = blk * EB + e
            x0 = pl.multiple_of(x0a_ref[i], al)
            pltpu.make_async_copy(
                g_ref.at[yb_ref[i], pl.ds(x0, P8), :],
                out_ref.at[e], sems.at[e]).start()
            return 0

        jax.lax.fori_loop(0, EB, issue, 0)

        def drain(e, _):
            i = blk * EB + e
            x0 = pl.multiple_of(x0a_ref[i], al)
            pltpu.make_async_copy(
                g_ref.at[yb_ref[i], pl.ds(x0, P8), :],
                out_ref.at[e], sems.at[e]).wait()
            return 0

        jax.lax.fori_loop(0, EB, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // EB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((EB, P8, KB), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((EB,))],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec, interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((N, P8, KB), Gs_khw.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    def fn(x0, y0):
        x0a = jnp.clip((x0 // al) * al, 0, Hp - P8)
        yb = jnp.clip(y0 // stride, 0, nb - 1)
        return call(x0a, yb, G2)
    return fn


# ------------------------------------------------------------ D: pallas DMA
def pallas_windows(Gs_khw, P, EB=8, Pc=None):
    """Per-env window extraction with scalar-prefetch DMA: grid over env
    blocks; each env's (P, Pc) window per surface is one async HBM->VMEM
    copy at the exact (x0, y0) offset — no banding, no one-hot contraction."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = Gs_khw.shape[0]
    Pc = Pc or P

    def kernel(x0_ref, y0_ref, g_ref, out_ref, scratch, sems):
        blk = pl.program_id(0)

        def issue(e, _):
            i = blk * EB + e
            x0 = x0_ref[i]
            y0 = y0_ref[i]
            cp = pltpu.make_async_copy(
                g_ref.at[:, pl.ds(x0, P), pl.ds(y0, Pc)],
                scratch.at[e], sems.at[e])
            cp.start()
            return 0

        jax.lax.fori_loop(0, EB, issue, 0)

        def drain(e, _):
            i = blk * EB + e
            x0 = x0_ref[i]
            y0 = y0_ref[i]
            pltpu.make_async_copy(
                g_ref.at[:, pl.ds(x0, P), pl.ds(y0, Pc)],
                scratch.at[e], sems.at[e]).wait()
            return 0

        jax.lax.fori_loop(0, EB, drain, 0)
        out_ref[:] = scratch[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // EB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((EB, K, P, Pc), lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((EB, K, P, Pc), Gs_khw.dtype),
            pltpu.SemaphoreType.DMA((EB,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, K, P, Pc), Gs_khw.dtype),
    )

    def fn(x0, y0):
        return call(x0, y0, Gs_khw)
    return fn


def check_band_dma():
    """Numerical check: E's window agrees with direct slicing."""
    K, P, band, stride = 5, 32, 64, 32
    g = make_surfaces(K, jnp.float32)
    fn = pallas_band_dma(g, P, band, stride, EB=8)
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.integers(0, H - 80, N), jnp.int32)
    y0 = jnp.asarray(rng.integers(0, W - 80, N), jnp.int32)
    out = np.asarray(fn(x0, y0))                 # (N, P8, K*band)
    gnp = np.asarray(g)
    for i in (0, 1, 17, N - 1):
        x0a = min((int(x0[i]) // 8) * 8, H - out.shape[1])
        yb = min(int(y0[i]) // stride, (W - P) // stride)
        c0 = yb * stride
        for k in range(K):
            ref = gnp[k, x0a:x0a + out.shape[1], c0:c0 + band]
            got = out[i, :, k * band:(k + 1) * band]
            w = min(ref.shape[1], band)
            np.testing.assert_array_equal(got[:, :w][:ref.shape[0]], ref[:, :w])
    print("E numerics: OK", flush=True)


def main():
    print(f"N={N}, world {H}x{W}", flush=True)
    check_band_dma()
    # --- contact-patch shapes: f32, K=5, P=32 ---
    K, P = 5, 32
    g_hwk = jnp.transpose(make_surfaces(K, jnp.float32), (1, 2, 0))
    g_khw = make_surfaces(K, jnp.float32)
    timed(banded_gather(g_hwk, P, 64, 32), label=f"A banded (H,nb,band,K) f32 K{K} P{P}")
    timed(banded_gather_laneconcat(g_khw, P, 64, 32), label=f"C lane-concat f32 K{K} P{P}")
    for eb in (8, 16, 32, 64):
        try:
            timed(pallas_band_dma(g_khw, P, 64, 32, EB=eb),
                  label=f"E pallas band DMA f32 K{K} P{P} EB{eb}")
        except Exception as e:
            print(f"E pallas EB{eb} failed: {type(e).__name__}: {str(e)[:300]}")

    # --- scandot shapes: bf16, K=3, P=56 (and the centroid-shrunk 36) ---
    for P in (56, 36):
        K = 3
        g_hwk = jnp.transpose(make_surfaces(K, jnp.bfloat16), (1, 2, 0))
        g_khw = make_surfaces(K, jnp.bfloat16)
        stride = 8 if P == 56 else 16
        timed(banded_gather(g_hwk, P, 64, stride), label=f"A banded bf16 K{K} P{P}")
        for eb in (16, 32, 64):
            try:
                timed(pallas_band_dma(g_khw, P, 64, stride, EB=eb),
                      label=f"E pallas band DMA bf16 K{K} P{P} EB{eb}")
            except Exception as e:
                print(f"E pallas EB{eb} failed: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
