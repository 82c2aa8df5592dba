"""Gather-free heightfield sampling via per-env terrain patches.

TPU gathers are slow scalar loops; sampling 24 contact points x 5 taps per
substep measured ~21 ms of a 31 ms substep at 4096 envs (PERF_NOTES.md).
Instead, a small square patch of terrain around each robot is extracted
*once per control step* with a batched `dynamic_slice`, and every
height/normal/scandot query inside the step becomes a separable "hat
weight" contraction against the patch:

    h(x, y)    = wx(gx)^T  P  wy(gy)          (bilinear interpolation)
    dh/dx      = wx'(gx)^T P  wy(gy)          (analytic surface gradient)

where wx/wy are 1-D hat windows (two non-zero taps).  These are batched
matmuls — MXU work — with zero gathers.  Movable-layer weights fold into
the patch at extraction time, so layered courses cost nothing per query.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from agility_tpu.physics.heightfield import HeightGrid


class Patch(NamedTuple):
    values: jnp.ndarray    # (P, P) heights (meters), layers/lever folded in
    min3: jnp.ndarray      # (P, P) min(self, +x, +y) — scandot semantics
    x0: jnp.ndarray        # () grid x-index of patch node (0, 0)
    y0: jnp.ndarray        # ()
    hscale: float
    origin: jnp.ndarray    # (2,) world xy of grid node (0, 0)
    ceil: jnp.ndarray = None   # (P, P) ceiling heights (layers folded) or None


def extract(grid: HeightGrid, center_xy, size: int, weights=None) -> Patch:
    """Slice a size x size patch centered at world `center_xy` (single env;
    vmap over envs).  Start indices clamp at the grid boundary.  Movable
    layer weights, the seesaw lever tilt (weights[-1]) and the ceiling
    surface are folded into the patch at extraction time."""
    H, W = grid.height.shape
    size = min(size, H, W)   # degenerate grids (e.g. the flat 2x2 plane)
    gx = (center_xy[0] - grid.origin[0]) / grid.hscale
    gy = (center_xy[1] - grid.origin[1]) / grid.hscale
    x0 = jnp.clip(jnp.round(gx).astype(jnp.int32) - size // 2, 0, max(H - size, 0))
    y0 = jnp.clip(jnp.round(gy).astype(jnp.int32) - size // 2, 0, max(W - size, 0))
    vals = jax.lax.dynamic_slice(grid.height, (x0, y0), (size, size))
    lw = weights
    if grid.lever is not None and weights is not None:
        lev = jax.lax.dynamic_slice(grid.lever, (x0, y0), (size, size))
        vals = vals + lev * weights[-1]
        lw = weights[:-1]
    if grid.layer_id is not None and lw is not None and lw.shape[-1] > 0:
        lid = jax.lax.dynamic_slice(grid.layer_id, (x0, y0), (size, size))
        w = jnp.concatenate([jnp.zeros((1,), vals.dtype), lw])
        vals = vals + w[lid.astype(jnp.int32)]
    ceil = None
    if grid.ceiling is not None:
        ceil = jax.lax.dynamic_slice(grid.ceiling, (x0, y0), (size, size))
        if grid.ceiling_layer is not None and lw is not None and lw.shape[-1] > 0:
            cl = jax.lax.dynamic_slice(grid.ceiling_layer, (x0, y0), (size, size))
            w = jnp.concatenate([jnp.zeros((1,), ceil.dtype), lw])
            ceil = ceil + w[cl.astype(jnp.int32)]
    # conservative scandot surface: min of node and its +x/+y neighbors
    m = jnp.minimum(vals, jnp.roll(vals, -1, axis=0).at[-1].set(vals[-1]))
    m = jnp.minimum(m, jnp.roll(vals, -1, axis=1).at[:, -1].set(vals[:, -1]))
    return Patch(values=vals, min3=m, x0=x0, y0=y0, hscale=grid.hscale,
                 origin=grid.origin, ceil=ceil)


def _column_bands(Gs, size: int, y0):
    """Build the overlapping 64-wide column-block tensor and per-env block
    coordinates for banded window extraction.

    Returns (G2 (H, nb, band, K), yb (N,), off (N,), band).  Any size-wide
    window starting at clipped y0 lies fully inside block yb at column
    offset off.  Preferred scheme: 64-lane blocks at stride s | 64 with
    s <= 64 - size (gather fetches 64 lanes per row).  Fallback for
    size > 60 or degenerate grids: two concatenated aligned blocks
    (band = 128)."""
    H, W, K = Gs.shape
    s = next((d for d in (32, 16, 8, 4) if size <= 64 - d), None)
    if s is not None and W > 64:
        nb = max((W - size) // s + 1, 1)
        Wp = (nb - 1) * s + 64
        Gp = jnp.pad(Gs, ((0, 0), (0, max(Wp - W, 0)), (0, 0)))
        R = Gp.reshape(H, Wp // s, s, K)
        reps = 64 // s
        G2 = jnp.concatenate([R[:, i:i + nb] for i in range(reps)], axis=2)
        yb = jnp.clip(y0 // s, 0, nb - 1)
        return G2, yb, y0 - yb * s, 64
    B = 64 if size <= 64 else 128
    nb = -(-W // B) + 1
    Gp = jnp.pad(Gs, ((0, 0), (0, nb * B - W), (0, 0)))
    blocks = Gp.reshape(H, nb, B, K)
    G2 = jnp.concatenate([blocks[:, :-1], blocks[:, 1:]], axis=2)
    yb = jnp.clip(y0 // B, 0, nb - 2)
    return G2, yb, y0 - yb * B, 2 * B


def extract_batch(grid: HeightGrid, centers_xy, size: int, weights=None,
                  with_ceiling: bool = True) -> Patch:
    """Batched patch extraction for N envs at once: one row-gather plus one
    exact one-hot MXU contraction per surface stack.

    Replaces `jax.vmap(extract)`: XLA lowers a vmapped `dynamic_slice` with
    per-env starts to a *serial while loop over envs* — measured 6.7 ms for
    4096 (24, 24) windows on v5e vs 2.1 ms for this formulation (the loop
    was ~70% of the whole physics step, tools/ trace 2026-08).  The one-hot
    column selector is exact 0/1 in bf16 and the contraction runs at
    HIGHEST precision, so selected values are exact f32 — parity with
    `extract` is asserted in tests/test_patch.py.

    centers_xy: (N, 2); weights: (N, L) per-env movable-layer weights or
    None.  Returns a Patch whose leaves carry a leading env axis.
    """
    H, W = grid.height.shape
    size = min(size, H, W)
    gx = (centers_xy[:, 0] - grid.origin[0]) / grid.hscale
    gy = (centers_xy[:, 1] - grid.origin[1]) / grid.hscale
    x0 = jnp.clip(jnp.round(gx).astype(jnp.int32) - size // 2, 0, max(H - size, 0))
    y0 = jnp.clip(jnp.round(gy).astype(jnp.int32) - size // 2, 0, max(W - size, 0))

    surfaces = [grid.height]
    have_lever = grid.lever is not None
    have_lid = grid.layer_id is not None
    # callers that only sample the floor (scandot measurement) skip the
    # ceiling surfaces — 40% less gathered band on 5-surface worlds
    have_ceil = with_ceiling and grid.ceiling is not None
    have_cl = have_ceil and grid.ceiling_layer is not None
    if have_lever:
        surfaces.append(grid.lever)
    if have_lid:
        surfaces.append(grid.layer_id.astype(jnp.float32))
    if have_ceil:
        surfaces.append(grid.ceiling)
    if have_cl:
        surfaces.append(grid.ceiling_layer.astype(jnp.float32))
    Gs = jnp.stack(surfaces, axis=-1)                      # (H, W, K)

    # Banded gather: fetching full-width rows costs (N*P, W, K) HBM — 21 GB
    # on the TSC obstacle world (W=1800, K=5, P=56).  Instead gather a
    # fixed 64-lane column band around each window, then select columns
    # inside the band.  Bands are overlapping 64-wide blocks at stride
    # s = (largest divisor of 64) <= 64 - size, so any size-window starting
    # at y0 lies fully inside block y0 // s (off = y0 mod s <= s-1, and
    # off + size - 1 <= 62 < 64).  The (64/s)-fold replicated block tensor
    # is loop-invariant — built once per traced iteration, outside the
    # rollout scan — while the per-step gather traffic halves vs the older
    # 2-block (128-lane) formulation.
    G2, yb, off, band = _column_bands(Gs, size, y0)

    K = Gs.shape[-1]
    ix = x0[:, None] + jnp.arange(size)                    # (N, P)
    N = ix.shape[0]
    # chunk envs so the gathered band stays under ~300 MB
    band_bytes = size * band * K * 4
    chunk = max(1, min(N, int(300e6 // max(band_bytes, 1))))
    outs = []
    for s0 in range(0, N, chunk):
        sl = slice(s0, min(s0 + chunk, N))
        rows = G2[ix[sl], yb[sl, None]]                    # (n, P, band, K)
        iy = off[sl, None, None] + jnp.arange(size)[None, None, :]
        oh = (jnp.arange(band)[None, :, None] == iy).astype(jnp.bfloat16)
        outs.append(jnp.einsum("npjk,njq->npqk", rows, oh,
                               precision=jax.lax.Precision.HIGHEST))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    k = 0
    vals = out[..., 0]
    k += 1
    lw = weights
    if have_lever:
        lev = out[..., k]
        k += 1
        if weights is not None:
            vals = vals + lev * weights[:, -1, None, None]
            lw = weights[:, :-1]
    if have_lid:
        lid = out[..., k]
        k += 1
        if lw is not None and lw.shape[-1] > 0:
            # small-L one-hot fold (layer 0 = static ground)
            for l in range(lw.shape[-1]):
                vals = vals + jnp.where(
                    jnp.round(lid) == l + 1, lw[:, l, None, None], 0.0)
    ceil = None
    if have_ceil:
        ceil = out[..., k]
        k += 1
        if have_cl and lw is not None and lw.shape[-1] > 0:
            cl = out[..., k]
            for l in range(lw.shape[-1]):
                ceil = ceil + jnp.where(
                    jnp.round(cl) == l + 1, lw[:, l, None, None], 0.0)

    m = jnp.minimum(vals, jnp.roll(vals, -1, axis=1).at[:, -1].set(vals[:, -1]))
    m = jnp.minimum(m, jnp.roll(vals, -1, axis=2).at[:, :, -1].set(vals[:, :, -1]))
    return Patch(values=vals, min3=m, x0=x0, y0=y0, hscale=grid.hscale,
                 origin=grid.origin, ceil=ceil)


def measure_scandots_batch(grid: HeightGrid, centers_xy, size: int, weights,
                           px, py):
    """Scandot heights for N envs at K points each, sampled directly from
    the gathered column band — no (P, P) patch materialization and no
    ceiling surfaces, with the floor stack gathered in bf16 (the scandots
    are observation-grade: bf16 rounds course-scale heights by <~1 cm,
    below the reference's horizontal measurement noise and comparable to
    its 5 mm heightfield quantization, tsc legged_robot.py:1674-1699,
    terrain vertical_scale 0.005).  Matches
    `sample_height_min3_batch(extract_batch(...), px, py)` semantics: the
    conservative min(node, +x, +y) floor height at the scandot's floor
    node, coords clipped into the size-window around each env center.

    centers_xy (N, 2), weights (N, L) or None, px/py (N, K) world coords.
    Returns (N, K) float32 heights.
    """
    from agility_tpu.physics import windows as win

    if win.enabled(grid, size=min(size, *grid.height.shape), scan=True):
        return win.measure_scandots_band(
            grid, centers_xy, min(size, *grid.height.shape), weights, px, py)
    H, W = grid.height.shape
    size = min(size, H, W)
    gx0 = (centers_xy[:, 0] - grid.origin[0]) / grid.hscale
    gy0 = (centers_xy[:, 1] - grid.origin[1]) / grid.hscale
    x0 = jnp.clip(jnp.round(gx0).astype(jnp.int32) - size // 2, 0, max(H - size, 0))
    y0 = jnp.clip(jnp.round(gy0).astype(jnp.int32) - size // 2, 0, max(W - size, 0))

    surfaces = [grid.height]
    have_lever = grid.lever is not None
    have_lid = grid.layer_id is not None
    if have_lever:
        surfaces.append(grid.lever)
    if have_lid:
        surfaces.append(grid.layer_id.astype(jnp.float32))
    Gs = jnp.stack(surfaces, axis=-1).astype(jnp.bfloat16)   # (H, W, K)

    G2, yb, off, band = _column_bands(Gs, size, y0)
    K = Gs.shape[-1]
    ix = x0[:, None] + jnp.arange(size)                      # (N, P)
    N = ix.shape[0]
    band_bytes = size * band * K * 2
    chunk = max(1, min(N, int(300e6 // max(band_bytes, 1))))

    # point coords: rows relative to the window, columns relative to the band
    Psz = size
    gx = jnp.clip((px - grid.origin[0]) / grid.hscale - x0[:, None].astype(px.dtype),
                  0.0, Psz - 1.001)
    gy_abs = (py - grid.origin[1]) / grid.hscale
    gy_abs = jnp.clip(gy_abs, y0[:, None].astype(py.dtype),
                      (y0 + Psz)[:, None].astype(py.dtype) - 1.001)
    # band column = absolute grid column minus the block's origin column
    # (y0 - off = yb * stride in either banding scheme)
    bcol = gy_abs - (y0 - off)[:, None].astype(py.dtype)
    fx = jnp.floor(gx)
    fc = jnp.floor(bcol)

    outs = []
    for s0 in range(0, N, chunk):
        sl = slice(s0, min(s0 + chunk, N))
        rows = G2[ix[sl], yb[sl, None]]                      # (n, P, band, K)
        k = 0
        vals = rows[..., 0]
        k += 1
        lw = weights[sl] if weights is not None else None
        if have_lever:
            lev = rows[..., k]
            k += 1
            if lw is not None:
                vals = vals + lev * lw[:, -1, None, None].astype(vals.dtype)
                lw = lw[:, :-1]
        if have_lid:
            lid = rows[..., k]
            if lw is not None and lw.shape[-1] > 0:
                for l in range(lw.shape[-1]):
                    vals = vals + jnp.where(
                        jnp.round(lid) == l + 1,
                        lw[:, l, None, None].astype(vals.dtype), 0.0)
        # conservative min(node, +x, +y); sampled nodes are < P-1 in both
        # axes (coords clip at P-1.001) so true in-band neighbors are used,
        # edge rows/cols are never read back
        m = jnp.minimum(vals, jnp.concatenate([vals[:, 1:], vals[:, -1:]], 1))
        m = jnp.minimum(m, jnp.concatenate([vals[:, :, 1:], vals[:, :, -1:]], 2))
        idx_p = jax.lax.broadcasted_iota(jnp.float32, (1, 1, Psz), 2)
        idx_b = jax.lax.broadcasted_iota(jnp.float32, (1, 1, band), 2)
        ohr = (jnp.abs(fx[sl, :, None] - idx_p) < 0.5).astype(jnp.bfloat16)
        ohc = (jnp.abs(fc[sl, :, None] - idx_b) < 0.5).astype(jnp.float32)
        tmp = jnp.einsum("nkp,npj->nkj", ohr, m,
                         precision=jax.lax.Precision.HIGHEST)  # (n, K, band) f32
        outs.append(jnp.sum(tmp * ohc, axis=-1))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _coords(p: Patch, x, y):
    P = p.values.shape[0]
    gx = (x - p.origin[0]) / p.hscale - p.x0
    gy = (y - p.origin[1]) / p.hscale - p.y0
    return jnp.clip(gx, 0.0, P - 1.001), jnp.clip(gy, 0.0, P - 1.001)


def _hat(g, P):
    """(K, P) two-tap hat windows for query coords g (K,)."""
    idx = jax.lax.broadcasted_iota(jnp.float32, (1, P), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(g[:, None] - idx))


def _dhat(g, P):
    """d hat / d g — the derivative windows (piecewise +-1 on the two taps)."""
    idx = jax.lax.broadcasted_iota(jnp.float32, (1, P), 1)
    d = g[:, None] - idx
    return jnp.where((d > 0) & (d < 1), -1.0, 0.0) + jnp.where(
        (d <= 0) & (d > -1), 1.0, 0.0)


def sample_height(p: Patch, x, y):
    """Bilinear heights for K query points (K,) -> (K,), gather-free."""
    Psz = p.values.shape[0]
    gx, gy = _coords(p, x, y)
    wx = _hat(gx, Psz)                      # (K, P)
    wy = _hat(gy, Psz)
    return jnp.einsum("ka,ab,kb->k", wx, p.values, wy)


def sample_height_and_normal(p: Patch, x, y):
    """(h (K,), n (K, 3)) — normal from the analytic bilinear gradient."""
    Psz = p.values.shape[0]
    gx, gy = _coords(p, x, y)
    wx, wy = _hat(gx, Psz), _hat(gy, Psz)
    dwx, dwy = _dhat(gx, Psz), _dhat(gy, Psz)
    rows = wx @ p.values                    # (K, P)
    drows = dwx @ p.values
    h = jnp.sum(rows * wy, -1)
    dhdx = jnp.sum(drows * wy, -1) / p.hscale
    dhdy = jnp.sum(rows * dwy, -1) / p.hscale
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)], -1)
    return h, n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def sample_ceiling_and_normal(p: Patch, x, y):
    """(h (K,), n (K, 3)) on the ceiling surface (p.ceil) with the DOWNWARD
    outward normal of a solid lying *above* z = c(x, y) — the negation of
    the floor-style normal of the same surface (cf. soa.patch_sample_ceiling)."""
    Psz = p.ceil.shape[0]
    gx, gy = _coords(p, x, y)
    wx, wy = _hat(gx, Psz), _hat(gy, Psz)
    dwx, dwy = _dhat(gx, Psz), _dhat(gy, Psz)
    rows = wx @ p.ceil                      # (K, P)
    drows = dwx @ p.ceil
    h = jnp.sum(rows * wy, -1)
    dhdx = jnp.sum(drows * wy, -1) / p.hscale
    dhdy = jnp.sum(rows * dwy, -1) / p.hscale
    n = jnp.stack([dhdx, dhdy, -jnp.ones_like(h)], -1)
    return h, n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def sample_height_min3(p: Patch, x, y):
    """Conservative floor-node height (scandots): one-hot tap on the
    precomputed min3 patch at the floor node."""
    Psz = p.values.shape[0]
    gx, gy = _coords(p, x, y)
    fx = jnp.floor(gx)
    fy = jnp.floor(gy)
    idx = jax.lax.broadcasted_iota(jnp.float32, (1, Psz), 1)
    ox = (jnp.abs(fx[:, None] - idx) < 0.5).astype(p.values.dtype)
    oy = (jnp.abs(fy[:, None] - idx) < 0.5).astype(p.values.dtype)
    return jnp.einsum("ka,ab,kb->k", ox, p.min3, oy)


def sample_height_min3_batch(p: Patch, x, y):
    """Batched `sample_height_min3` over a Patch from `extract_batch`
    (leading env axis on values/min3/x0/y0).  x, y: (N, K) world coords."""
    Psz = p.values.shape[-1]
    gx = (x - p.origin[0]) / p.hscale - p.x0[:, None].astype(x.dtype)
    gy = (y - p.origin[1]) / p.hscale - p.y0[:, None].astype(x.dtype)
    gx = jnp.clip(gx, 0.0, Psz - 1.001)
    gy = jnp.clip(gy, 0.0, Psz - 1.001)
    fx = jnp.floor(gx)
    fy = jnp.floor(gy)
    idx = jax.lax.broadcasted_iota(jnp.float32, (1, 1, Psz), 2)
    ox = (jnp.abs(fx[:, :, None] - idx) < 0.5).astype(p.min3.dtype)
    oy = (jnp.abs(fy[:, :, None] - idx) < 0.5).astype(p.min3.dtype)
    return jnp.einsum("nka,nab,nkb->nk", ox, p.min3, oy)
