"""Pallas band-DMA terrain window extraction — the TPU hot path.

The round-3 TSC profile (tools/trace_agg.py over tools/bench_tsc.py) put
52% of the teacher iteration inside patch.py's banded row-gather plus the
one-hot column contraction.  XLA lowers the per-env row gather to scalar
loads; tools/bench_windows.py measured the per-step cost on course-world
shapes (N=6144, 1800x1800, v5e):

    contact stack  f32 K5 P32:  gather+einsum 5.78 ms  ->  band DMA 2.18 ms
    scandot stack  bf16 K3 P56: gather+einsum 5.37 ms  ->  band DMA 1.54 ms

This module makes the measured winner the production path.  The world is
pre-stacked as *overlapping column bands* ``(nb, Hp, KB)``:

  * dim 0 is the band index — the untiled major dim, so an arbitrary
    per-env index is a legal DMA source;
  * dim 1 rows — a window start rounded down to the sublane tile (8 for
    f32, 16 for bf16) is tile-aligned, so ``pl.ds(x0a, P8)`` is legal;
  * dim 2 lanes hold the K surfaces side by side (surface k in lanes
    ``[k*64, (k+1)*64)``), copied whole.

Each env's window extraction is then ONE async HBM->VMEM copy issued from
a Pallas kernel (scalar-prefetched band/row indices), and the per-env
movable-layer fold — and for scandots the min(node,+x,+y) surface — runs
in-kernel on the VMEM block, so only the folded result is written back.
Bands at stride s replicate the world 64/s times (the TSC course world is
~150 MB at the scandot stride 8 — built once at env setup, HBM is 16 GB).

No rectification: the returned window keeps its aligned origin and the
samplers shift query coordinates by the per-env (roff, coff) instead —
queries clip to the *original* (size x size) window, so values match the
gather path (patch.py) bit-for-bit; tests/test_windows.py asserts parity
in interpret mode.

Reference behavior being served: per-robot terrain height queries for
contact (tsc/legged_gym/envs/base/legged_robot.py:1640-1699 samples the
heightfield around each robot) and the 132-point scandot observation
(legged_robot.py:1674-1699).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from agility_tpu.physics.heightfield import HeightGrid

BAND = 64


def _band_stride(size: int):
    """Largest stride s | 64 with s <= 64 - size (window fits in a band)."""
    return next((d for d in (32, 16, 8, 4) if size <= BAND - d), None)


def _sublane(dtype) -> int:
    return 8 if jnp.dtype(dtype).itemsize == 4 else 16


def _rows_per_window(size: int, al: int) -> int:
    """Rows DMA'd per window: size plus the up-to-(al-1) alignment shift,
    rounded up to the sublane tile."""
    return -(-(size + al) // al) * al


def _surfaces(grid: HeightGrid, with_ceiling: bool):
    """The surface stack in fold order (matches patch.extract_batch)."""
    surfs = [grid.height]
    if grid.lever is not None:
        surfs.append(grid.lever)
    if grid.layer_id is not None:
        surfs.append(grid.layer_id.astype(jnp.float32))
    if with_ceiling and grid.ceiling is not None:
        surfs.append(grid.ceiling)
        if grid.ceiling_layer is not None:
            surfs.append(grid.ceiling_layer.astype(jnp.float32))
    return surfs


def build_bands(grid: HeightGrid, size: int, dtype,
                with_ceiling: bool) -> jnp.ndarray | None:
    """Host-side band-stack build: (nb, Hp, KB) for window size `size`.
    Returns None when the world is too small to band (the gather path is
    cheap there anyway)."""
    stride = _band_stride(size)
    H, W = grid.height.shape
    al = _sublane(dtype)
    if stride is None or W <= BAND or H < _rows_per_window(size, al):
        return None
    surfs = [np.asarray(s, np.float32) for s in _surfaces(grid, with_ceiling)]
    K = len(surfs)
    nb = max((W - size) // stride + 1, 1)
    Wp = (nb - 1) * stride + BAND
    g = np.stack(surfs, 0)                                   # (K, H, W)
    g = np.pad(g, ((0, 0), (0, 0), (0, max(Wp - W, 0))))
    R = g.reshape(K, H, Wp // stride, stride)
    reps = BAND // stride
    g2 = np.concatenate([R[:, :, i:i + nb] for i in range(reps)], axis=3)
    Hp = -(-H // al) * al
    KB = -(-(K * BAND) // 128) * 128
    g2 = np.transpose(g2, (2, 1, 0, 3)).reshape(nb, H, K * BAND)
    g2 = np.pad(g2, ((0, 0), (0, Hp - H), (0, KB - K * BAND)))
    return jnp.asarray(g2.astype(jnp.dtype(dtype)))


def attach_bands(grid: HeightGrid, contact_size: int = 0,
                 scan_size: int = 0,
                 contact_dtype=jnp.float32) -> HeightGrid:
    """Pre-build the band stacks on the grid (call once at env setup):
    `band_contact` (f32, or bf16 via `contact_dtype` — gated by the
    solver-precision tests in tests/test_windows.py) with ceiling surfaces
    for the engine's contact patch, `band_scan` bf16 floor-only for
    scandot measurement.  No-op when the gather path is active (CPU test
    runs) — the stacks replicate the world up to 8x and would never be
    read."""
    if _mode() == "gather":
        return grid
    # Policy: only band multi-surface worlds.  Single-surface worlds (BBC
    # terrain: height only) lose on the band path — K=1 pads the 64 lanes
    # to a 128-lane tile (2x DMA bytes) and patch.py's banded gather is
    # already cheap there.  Measured end-to-end @4096 envs v5e: 661k
    # env-steps/s gather vs 495k banded.  The win case is the multi-surface
    # TSC course world (K=5 contact / K=3 scan): 227k -> 333k @6144.
    bc = build_bands(grid, contact_size, contact_dtype, True) \
        if contact_size and len(_surfaces(grid, True)) >= 2 else None
    bs = build_bands(grid, scan_size, jnp.bfloat16, False) \
        if scan_size and len(_surfaces(grid, False)) >= 2 else None
    return grid._replace(band_contact=bc, band_scan=bs)


def _mode() -> str:
    m = os.environ.get("AGILITY_WINDOWS", "")
    if m in ("pallas", "interpret", "gather"):
        return m
    return "pallas" if jax.default_backend() == "tpu" else "gather"


def enabled(grid: HeightGrid, size: int = None, scan: bool = False) -> bool:
    """Band path available for this grid?  With `size`, also verify the
    attached band stack was built for that window size (stride and surface
    count must match) — mismatch falls back to the gather path."""
    band = grid.band_scan if scan else grid.band_contact
    if band is None or _mode() == "gather":
        return False
    if size is not None:
        stride = _band_stride(size)
        if stride is None:
            return False
        H, W = grid.height.shape
        nb = max((W - size) // stride + 1, 1)
        K = len(_surfaces(grid, with_ceiling=not scan))
        al = _sublane(band.dtype)
        if (band.shape[0] != nb
                or band.shape[1] < _rows_per_window(size, al)
                or band.shape[2] != -(-(K * BAND) // 128) * 128):
            return False
    return True


def _env_block(n: int) -> int:
    return next(e for e in (64, 32, 16, 8, 4, 2, 1) if n % e == 0)


def _window_origin(grid, centers_xy, size):
    """Per-env window origin (x0, y0) — identical to patch.extract_batch —
    plus the aligned DMA origin and in-band offsets."""
    H, W = grid.height.shape
    gx = (centers_xy[:, 0] - grid.origin[0]) / grid.hscale
    gy = (centers_xy[:, 1] - grid.origin[1]) / grid.hscale
    x0 = jnp.clip(jnp.round(gx).astype(jnp.int32) - size // 2,
                  0, max(H - size, 0))
    y0 = jnp.clip(jnp.round(gy).astype(jnp.int32) - size // 2,
                  0, max(W - size, 0))
    return x0, y0


def _dma_coords(x0, y0, size, al, Hp, nb, stride):
    P8 = _rows_per_window(size, al)
    x0a = jnp.clip((x0 // al) * al, 0, Hp - P8)
    yb = jnp.clip(y0 // stride, 0, nb - 1)
    return x0a, yb, x0 - x0a, y0 - yb * stride


def _band_call(g2, n, P8, KBo, dtype, kernel, n_scalars, extra_in=(),
               interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    EB = _env_block(n)
    KB = g2.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalars,
        grid=(n // EB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + list(extra_in),
        out_specs=pl.BlockSpec((EB, P8, KBo), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((EB, P8, KB), dtype),
            pltpu.SemaphoreType.DMA((EB,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((n, P8, KBo), dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def _dma_loops(pl, pltpu, x0a_ref, yb_ref, g_ref, scratch, sems, EB, P8, al):
    """Issue all EB window copies, then drain them."""
    blk = pl.program_id(0)

    def issue(e, _):
        i = blk * EB + e
        x0 = pl.multiple_of(x0a_ref[i], al)
        pltpu.make_async_copy(
            g_ref.at[yb_ref[i], pl.ds(x0, P8), :],
            scratch.at[e], sems.at[e]).start()
        return 0

    jax.lax.fori_loop(0, EB, issue, 0)

    def drain(e, _):
        i = blk * EB + e
        x0 = pl.multiple_of(x0a_ref[i], al)
        pltpu.make_async_copy(
            g_ref.at[yb_ref[i], pl.ds(x0, P8), :],
            scratch.at[e], sems.at[e]).wait()
        return 0

    jax.lax.fori_loop(0, EB, drain, 0)


def _fold_floor(scratch, w_ref, have_lever, n_layers):
    """Folded floor surface from the band block (EB, P8, KB): height plus
    lever tilt plus per-env movable-layer weights (w_ref: the lane-resident
    (EB, WROWS, 128) block from _weight_block — layer weights in rows
    0..n_layers-1, the lever multiplier in row n_layers).

    Mosaic cannot reshape/broadcast/select 16-bit vectors across sublanes
    and lanes, so every intermediate here runs in f32 — but each result is
    rounded back through the band dtype exactly where the gather path
    (patch.measure_scandots_batch) performs a bf16 op, so the folded bf16
    values are bit-identical: a bf16 mul/add equals the exact f32 op on
    the same bf16 inputs followed by one rounding cast.  The weight block
    is stored in the band dtype, so _wcol's f32 view is already rounded."""
    dt = scratch.dtype
    f32 = jnp.float32
    vals = scratch[:, :, 0:BAND].astype(f32)
    k = 1
    if have_lever:
        lev = scratch[:, :, k * BAND:(k + 1) * BAND]
        k += 1
        w = _wcol(w_ref, n_layers, vals.shape, dt)       # lever row
        prod = (lev.astype(f32) * w).astype(dt)          # == dt multiply
        vals = (vals + prod.astype(f32)).astype(dt).astype(f32)  # == dt add
    if n_layers:
        lid = jnp.round(scratch[:, :, k * BAND:(k + 1) * BAND].astype(f32))
        k += 1
        for l in range(n_layers):
            w = _wcol(w_ref, l, vals.shape, dt)
            add = jnp.where(lid == l + 1, w, 0.0)
            vals = (vals + add).astype(dt).astype(f32)   # == dt add
    return vals.astype(dt), k


WROWS = 8   # weight-input sublane rows (>= max weight columns)


def _wcol(w_ref, col, shape, dt):
    """Weight column broadcast to (EB, P8, 64), already rounded through the
    band dtype (the input block is stored in that dtype) so the value
    matches the gather path's bf16 weight operand.

    The weights arrive as a lane-resident (EB, WROWS, 128) block (built by
    _weight_block) — slicing [:, col:col+1, 0:64] keeps a 3-D layout and
    the broadcast touches SUBLANES ONLY: a per-env scalar (EB, 1, 1) ->
    (EB, P8, 64) broadcast hits Mosaic's "Broadcast in both sublanes and
    lanes" NotImplemented on the P8=80 bf16 scan-block shapes."""
    w = w_ref[:, col:col + 1, 0:BAND].astype(jnp.float32)   # (EB, 1, 64)
    return jnp.broadcast_to(w, shape)


def _weight_block(weights, n, dtype):
    """Lane-resident (n, WROWS, 128) weight block in the band dtype (one
    weight column per sublane row, replicated across lanes) — the form
    _wcol can broadcast inside a Mosaic kernel."""
    wb = jnp.zeros((n, WROWS, 128), dtype)
    if weights is not None:
        L = weights.shape[-1]
        wb = wb.at[:, :L, :].set(
            jnp.broadcast_to(weights.astype(dtype)[:, :, None], (n, L, 128)))
    return wb


class BandPatch(NamedTuple):
    """A per-env terrain window living at its band-aligned origin.
    values/ceil are (N, P8, 64); query coordinates relative to the window
    origin (x0, y0) must be shifted by (roff, coff) to index the arrays
    (band_sample_hn does this)."""
    values: jnp.ndarray
    ceil: jnp.ndarray | None
    x0: jnp.ndarray      # (N,) window-origin grid row (gather-path x0)
    y0: jnp.ndarray      # (N,) window-origin grid col
    roff: jnp.ndarray    # (N,) x0 - aligned DMA row
    coff: jnp.ndarray    # (N,) y0 - band origin col


def extract_band_batch(grid: HeightGrid, centers_xy, size: int,
                       weights=None) -> BandPatch:
    """Contact-patch extraction via band DMA + in-kernel layer fold.
    Drop-in for patch.extract_batch on the SoA contact path: same window
    origin, same folded values on the window cells (parity asserted in
    tests/test_windows.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g2 = grid.band_contact
    al = _sublane(g2.dtype)
    stride = _band_stride(size)
    nb, Hp, KB = g2.shape
    P8 = _rows_per_window(size, al)
    have_lever = grid.lever is not None
    have_ceil = grid.ceiling is not None
    have_cl = have_ceil and grid.ceiling_layer is not None
    n_layers = 0
    if grid.layer_id is not None and weights is not None:
        n_layers = weights.shape[-1] - (1 if have_lever else 0)
    n = centers_xy.shape[0]
    EB = _env_block(n)
    KBo = BAND * (2 if have_ceil else 1)

    x0, y0 = _window_origin(grid, centers_xy, size)
    x0a, yb, roff, coff = _dma_coords(x0, y0, size, al, Hp, nb, stride)

    w = _weight_block(weights, n, g2.dtype)

    def kernel(x0a_ref, yb_ref, g_ref, w_ref, out_ref, scratch, sems):
        _dma_loops(pl, pltpu, x0a_ref, yb_ref, g_ref, scratch, sems,
                   EB, P8, al)
        use_lever = have_lever and weights is not None
        vals, k = _fold_floor(scratch, w_ref, use_lever, n_layers)
        if have_lever and weights is None:
            k += 1                       # skip the unfolded lever surface
        if grid.layer_id is not None and not n_layers:
            k += 1                       # skip the unused layer-id surface
        out_ref[:, :, 0:BAND] = vals
        if have_ceil:
            dt = scratch.dtype
            ceil = scratch[:, :, k * BAND:(k + 1) * BAND].astype(jnp.float32)
            k += 1
            if have_cl:
                cl = jnp.round(
                    scratch[:, :, k * BAND:(k + 1) * BAND].astype(jnp.float32))
                for l in range(n_layers):
                    add = jnp.where(cl == l + 1,
                                    _wcol(w_ref, l, ceil.shape, dt), 0.0)
                    # round through the band dtype per add (== dt add, the
                    # _fold_floor cast discipline) so bf16 bands match the
                    # gather path's arithmetic exactly
                    ceil = (ceil + add).astype(dt).astype(jnp.float32)
            out_ref[:, :, BAND:2 * BAND] = ceil.astype(dt)

    interp = _mode() == "interpret"
    call = _band_call(g2, n, P8, KBo, g2.dtype, kernel, 2,
                      extra_in=[pl.BlockSpec((EB, WROWS, 128),
                                             lambda b, *_: (b, 0, 0),
                                             memory_space=pltpu.VMEM)],
                      interpret=interp)
    out = call(x0a, yb, g2, w)
    ceil = out[:, :, BAND:2 * BAND] if have_ceil else None
    return BandPatch(values=out[:, :, 0:BAND], ceil=ceil, x0=x0, y0=y0,
                     roff=roff, coff=coff)


def band_sample_hn(vals_T, x0, y0, roff, coff, origin, hscale, size, x, y):
    """Bilinear height + analytic normal on a BandPatch in env-minor
    layout: vals_T (P8, 64, N), x/y (S, N).  Queries clip to the original
    (size x size) window — identical semantics to soa.patch_sample_hn —
    then shift by the per-env band offsets."""
    Pr, Pc = vals_T.shape[0], vals_T.shape[1]
    gx = (x - origin[0]) / hscale - x0[None].astype(x.dtype)
    gy = (y - origin[1]) / hscale - y0[None].astype(x.dtype)
    gx = jnp.clip(gx, 0.0, size - 1.001) + roff[None].astype(x.dtype)
    gy = jnp.clip(gy, 0.0, size - 1.001) + coff[None].astype(x.dtype)
    idx_r = jnp.arange(Pr, dtype=x.dtype)[None, :, None]      # (1, Pr, 1)
    idx_c = jnp.arange(Pc, dtype=x.dtype)[None, :, None]
    dx = gx[:, None, :] - idx_r                                # (S, Pr, N)
    dy = gy[:, None, :] - idx_c                                # (S, Pc, N)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
    dwx = jnp.where((dx > 0) & (dx < 1), -1.0, 0.0) + jnp.where(
        (dx <= 0) & (dx > -1), 1.0, 0.0)
    dwy = jnp.where((dy > 0) & (dy < 1), -1.0, 0.0) + jnp.where(
        (dy <= 0) & (dy > -1), 1.0, 0.0)
    rows = jnp.einsum("spn,pqn->sqn", wx, vals_T)
    drows = jnp.einsum("spn,pqn->sqn", dwx, vals_T)
    h = jnp.sum(rows * wy, axis=1)
    dhdx = jnp.sum(drows * wy, axis=1) / hscale
    dhdy = jnp.sum(rows * dwy, axis=1) / hscale
    inv = 1.0 / jnp.sqrt(dhdx * dhdx + dhdy * dhdy + 1.0)
    return h, (-dhdx * inv, -dhdy * inv, inv)


def band_sample_ceiling(ceil_T, x0, y0, roff, coff, origin, hscale, size,
                        x, y):
    h, n = band_sample_hn(ceil_T, x0, y0, roff, coff, origin, hscale,
                          size, x, y)
    return h, (-n[0], -n[1], -n[2])


def measure_scandots_band(grid: HeightGrid, centers_xy, size: int, weights,
                          px, py):
    """Scandot heights via band DMA with in-kernel fold AND min(node,+x,+y):
    drop-in for patch.measure_scandots_batch (same bf16 arithmetic, parity
    asserted in tests/test_windows.py).  px/py (N, K) world coords ->
    (N, K) f32 conservative floor heights.

    The fold + min3 runs INSIDE the kernel (same _fold_floor machinery as
    the contact path), so only the folded-and-min'd (N, P8, 128) block is
    written back instead of the raw (N, P8, KB=256) surface stack — the
    round-2 pure-DMA formulation cost ~3.6 ms/step @6144 on the padded
    write + refold reads (tools/bench_env_ablate_tsc.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g2 = grid.band_scan
    al = _sublane(g2.dtype)
    stride = _band_stride(size)
    nb, Hp, KB = g2.shape
    P8 = _rows_per_window(size, al)
    have_lever = grid.lever is not None
    n_layers = 0
    if grid.layer_id is not None and weights is not None:
        n_layers = weights.shape[-1] - (1 if have_lever else 0)
    n = centers_xy.shape[0]
    EB = _env_block(n)
    KBo = 2 * BAND      # min3 result in lanes [0:64]; [64:128] lane padding

    x0, y0 = _window_origin(grid, centers_xy, size)
    x0a, yb, roff, coff = _dma_coords(x0, y0, size, al, Hp, nb, stride)

    w = _weight_block(weights, n, g2.dtype)

    def kernel(x0a_ref, yb_ref, g_ref, w_ref, out_ref, scratch, sems):
        _dma_loops(pl, pltpu, x0a_ref, yb_ref, g_ref, scratch, sems,
                   EB, P8, al)
        use_lever = have_lever and weights is not None
        vals, _ = _fold_floor(scratch, w_ref, use_lever, n_layers)
        # conservative min(node, +x, +y) — same arithmetic as the gather
        # path (patch.measure_scandots_batch).  Sampled nodes stay below
        # P8-1 rows / 63 cols in window coords (size-1 + max offset), so
        # the duplicated last row/col is never read back.
        vr = jnp.concatenate([vals[:, 1:, :], vals[:, -1:, :]], axis=1)
        m = jnp.minimum(vals, vr)
        vc = jnp.concatenate([vals[:, :, 1:], vals[:, :, -1:]], axis=2)
        m = jnp.minimum(m, vc)
        out_ref[:, :, 0:BAND] = m
        out_ref[:, :, BAND:2 * BAND] = m    # lane padding (never sampled)

    interp = _mode() == "interpret"
    call = _band_call(g2, n, P8, KBo, g2.dtype, kernel, 2,
                      extra_in=[pl.BlockSpec((EB, WROWS, 128),
                                             lambda b, *_: (b, 0, 0),
                                             memory_space=pltpu.VMEM)],
                      interpret=interp)
    m = call(x0a, yb, g2, w)[:, :, 0:BAND]                    # (N, P8, 64)

    # one-hot floor-node sampling — same arithmetic as the gather path
    # (patch.measure_scandots_batch): bf16 exact 0/1 row selector on the
    # MXU at HIGHEST precision, f32 column mask.
    gx = jnp.clip((px - grid.origin[0]) / grid.hscale
                  - x0[:, None].astype(px.dtype), 0.0, size - 1.001)
    gy = jnp.clip((py - grid.origin[1]) / grid.hscale
                  - y0[:, None].astype(py.dtype), 0.0, size - 1.001)
    fx = jnp.floor(gx) + roff[:, None].astype(px.dtype)
    fc = jnp.floor(gy) + coff[:, None].astype(py.dtype)
    idx_p = jax.lax.broadcasted_iota(jnp.float32, (1, 1, P8), 2)
    idx_b = jax.lax.broadcasted_iota(jnp.float32, (1, 1, BAND), 2)
    ohr = (jnp.abs(fx[:, :, None] - idx_p) < 0.5).astype(jnp.bfloat16)
    ohc = (jnp.abs(fc[:, :, None] - idx_b) < 0.5).astype(jnp.float32)
    tmp = jnp.einsum("nkp,npj->nkj", ohr, m,
                     precision=jax.lax.Precision.HIGHEST)     # (n, K, 64) f32
    return jnp.sum(tmp * ohc, axis=-1)
