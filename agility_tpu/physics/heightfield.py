"""Heightfield terrain queries.

The world is a regular height grid (the same representation the reference
builds with isaacgym terrain_utils and converts to a trimesh,
bbc/legged_gym/utils/terrain.py:41-45).  We keep it as a grid and sample it
bilinearly on device — collision, scandots, and the depth ray-caster all read
the same `HeightGrid`.

A flat plane is a degenerate 2x2 zero grid (single code path, no branches).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class HeightGrid(NamedTuple):
    height: jnp.ndarray       # (H, W) meters
    hscale: float             # grid spacing [m]
    origin: jnp.ndarray       # (2,) world xy of grid node (0, 0)
    # optional movable layer tags (TSC obstacle course: bar beam / tire sill,
    # DOF-driven actors in the reference, tsc/.../legged_robot.py:1370-1427).
    # Cells tagged with layer l>0 get `weights[l-1]` added to their height at
    # sample time; the per-env weights vector is threaded via
    # EnvParams.hf_weights, so curriculum height changes are pure array ops.
    layer_id: jnp.ndarray = None    # (H, W) int8 or None
    # optional seesaw lever grid: signed plank-axis distance from the pivot
    # [m] on seesaw plank cells, 0 elsewhere.  Effective floor height gains
    # `lever * weights[-1]` where weights[-1] is the per-env plank tilt
    # (small-angle tan(theta)); the 1-DOF passive plank of the reference
    # (tsc legged_robot.py:1370-1427) becomes a per-env scalar state.
    lever: jnp.ndarray = None       # (H, W) f32 or None
    # optional ceiling surface: lowest overhead solid z (meters), NO_CEILING
    # where open sky.  Gives the tunnel its roof and the tire its top ring
    # (reference URDF collision meshes, obstacle.py:434-523); sampled by the
    # contact engine (upper-body spheres) and the depth ray-caster.
    ceiling: jnp.ndarray = None         # (H, W) f32 or None
    ceiling_layer: jnp.ndarray = None   # (H, W) int8 or None
    # optional pre-built overlapping column-band stacks for the Pallas
    # window-DMA extraction path (physics/windows.py; built once at env
    # setup via windows.attach_bands): contact = f32 all-surface stack for
    # the engine's terrain patch, scan = bf16 floor-only for scandots.
    band_contact: jnp.ndarray = None    # (nb, Hp, KB) f32 or None
    band_scan: jnp.ndarray = None       # (nb, Hp, KB) bf16 or None (same weights)

    @property
    def shape(self):
        return self.height.shape


NO_CEILING = 100.0   # sentinel ceiling height [m] for open-sky cells


def flat_grid(size: float = 1.0, dtype=jnp.float32) -> HeightGrid:
    return HeightGrid(
        height=jnp.zeros((2, 2), dtype),
        hscale=size,
        origin=jnp.asarray([-size, -size], dtype),
    )


def from_numpy(height_m: np.ndarray, hscale: float, origin_xy=(0.0, 0.0),
               layer_id: np.ndarray = None, lever: np.ndarray = None,
               ceiling: np.ndarray = None, ceiling_layer: np.ndarray = None
               ) -> HeightGrid:
    j = lambda x, dt: None if x is None else jnp.asarray(x, dt)
    return HeightGrid(
        height=jnp.asarray(height_m, jnp.float32),
        hscale=float(hscale),
        origin=jnp.asarray(origin_xy, jnp.float32),
        layer_id=j(layer_id, jnp.int8),
        lever=j(lever, jnp.float32),
        ceiling=j(ceiling, jnp.float32),
        ceiling_layer=j(ceiling_layer, jnp.int8),
    )


def _grid_coords(g: HeightGrid, x, y):
    gx = (x - g.origin[0]) / g.hscale
    gy = (y - g.origin[1]) / g.hscale
    H, W = g.height.shape
    gx = jnp.clip(gx, 0.0, H - 1.001)
    gy = jnp.clip(gy, 0.0, W - 1.001)
    return gx, gy


def _node(g: HeightGrid, xi, yi, weights):
    """Effective height at integer nodes: gather + movable-layer offset +
    seesaw plank tilt (lever * weights[-1])."""
    h = g.height[xi, yi]
    if weights is None:
        return h
    lw = weights
    if g.lever is not None:
        h = h + g.lever[xi, yi] * weights[-1]
        lw = weights[:-1]
    if g.layer_id is not None and lw.shape[-1] > 0:
        w = jnp.concatenate([jnp.zeros((1,), h.dtype), lw])
        h = h + w[g.layer_id[xi, yi].astype(jnp.int32)]
    return h


def sample_height(g: HeightGrid, x, y, weights=None):
    """Bilinear height at world (x, y); x/y broadcast to any shape."""
    gx, gy = _grid_coords(g, x, y)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    fx = gx - x0
    fy = gy - y0
    h00 = _node(g, x0, y0, weights)
    h10 = _node(g, x0 + 1, y0, weights)
    h01 = _node(g, x0, y0 + 1, weights)
    h11 = _node(g, x0 + 1, y0 + 1, weights)
    return (
        h00 * (1 - fx) * (1 - fy)
        + h10 * fx * (1 - fy)
        + h01 * (1 - fx) * fy
        + h11 * fx * fy
    )


def _cnode(g: HeightGrid, xi, yi, weights):
    """Effective ceiling height at integer nodes (NO_CEILING = open sky)."""
    h = g.ceiling[xi, yi]
    if weights is None:
        return h
    lw = weights[:-1] if g.lever is not None else weights
    if g.ceiling_layer is not None and lw.shape[-1] > 0:
        w = jnp.concatenate([jnp.zeros((1,), h.dtype), lw])
        h = h + w[g.ceiling_layer[xi, yi].astype(jnp.int32)]
    return h


def sample_ceiling(g: HeightGrid, x, y, weights=None):
    """Bilinear ceiling height at world (x, y); requires g.ceiling."""
    gx, gy = _grid_coords(g, x, y)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    fx = gx - x0
    fy = gy - y0
    return (
        _cnode(g, x0, y0, weights) * (1 - fx) * (1 - fy)
        + _cnode(g, x0 + 1, y0, weights) * fx * (1 - fy)
        + _cnode(g, x0, y0 + 1, weights) * (1 - fx) * fy
        + _cnode(g, x0 + 1, y0 + 1, weights) * fx * fy
    )


def sample_lever(g: HeightGrid, x, y):
    """Bilinear raw seesaw lever arm [m] at world (x, y); requires g.lever.
    Used by the env to convert foot normal forces into plank torque
    (reference passive seesaw DOF, tsc legged_robot.py:1414-1427)."""
    gx, gy = _grid_coords(g, x, y)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    fx = gx - x0
    fy = gy - y0
    lv = g.lever
    return (lv[x0, y0] * (1 - fx) * (1 - fy) + lv[x0 + 1, y0] * fx * (1 - fy)
            + lv[x0, y0 + 1] * (1 - fx) * fy + lv[x0 + 1, y0 + 1] * fx * fy)


def on_lever(g: HeightGrid, x, y):
    """True where the nearest node is a seesaw plank cell (lever != 0 on any
    of the 4 surrounding nodes)."""
    gx, gy = _grid_coords(g, x, y)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    lv = g.lever
    return ((lv[x0, y0] != 0) | (lv[x0 + 1, y0] != 0)
            | (lv[x0, y0 + 1] != 0) | (lv[x0 + 1, y0 + 1] != 0))


def sample_height_nearest(g: HeightGrid, x, y, weights=None):
    """Nearest-node height — matches the reference's integer height lookup
    for measured scandots (legged_robot.py:1174-1228)."""
    gx, gy = _grid_coords(g, x, y)
    return _node(g, jnp.round(gx).astype(jnp.int32), jnp.round(gy).astype(jnp.int32), weights)


def sample_height_min3(g: HeightGrid, x, y, weights=None):
    """Conservative floor-node height: min of the cell node and its +x/+y
    neighbors — the reference's scandot lookup (legged_robot.py:1218-1228)."""
    gx, gy = _grid_coords(g, x, y)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    hm = jnp.minimum(_node(g, x0, y0, weights), _node(g, x0 + 1, y0, weights))
    return jnp.minimum(hm, _node(g, x0, y0 + 1, weights))


def sample_normal(g: HeightGrid, x, y, weights=None, eps: float = None):
    """Unit surface normal from central differences of the bilinear surface."""
    e = g.hscale if eps is None else eps
    dhdx = (sample_height(g, x + e, y, weights) - sample_height(g, x - e, y, weights)) / (2 * e)
    dhdy = (sample_height(g, x, y + e, weights) - sample_height(g, x, y - e, weights)) / (2 * e)
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)
