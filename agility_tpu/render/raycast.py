"""On-device depth camera: heightfield ray-caster.

Replaces IsaacGym's rasterized camera sensors (reference depth pipeline:
tsc/legged_gym/envs/base/legged_robot.py:1203-1226 attach, :154-175
normalize/noise).  Rays from a base-mounted camera (front Go2 camera,
position [0.305, 0.0175, 0.098], horizontal FOV 87deg) are marched against
the same HeightGrid the physics collides with; the first surface crossing
gives metric depth, then the reference's processing is applied (clip to
[near, far], normalize to [-0.5, 0.5], uniform + per-pixel noise).

Everything is fixed-shape: `n_steps` march samples per ray, refined with one
secant step — branch-free under jit/vmap.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agility_tpu.core import quat as qm
from agility_tpu.physics import heightfield as hf


class CameraModel(NamedTuple):
    dirs: jnp.ndarray         # (H*W, 3) ray directions, camera frame (+x fwd)
    offset: jnp.ndarray       # (3,) mount position in base frame
    width: int
    height: int
    near: float
    far: float
    n_steps: int


def make_camera(width=87, height=58, horizontal_fov_deg=87.0,
                position=(0.305, 0.0175, 0.098), near=0.3, far=4.0,
                n_steps=32) -> CameraModel:
    hfov = np.radians(horizontal_fov_deg)
    fx = (width / 2) / np.tan(hfov / 2)
    u = np.arange(width) - (width - 1) / 2
    v = np.arange(height) - (height - 1) / 2
    uu, vv = np.meshgrid(u, v, indexing="xy")      # (H, W)
    # camera frame: +x forward, +y left, +z up (image u -> -y, v -> -z)
    dirs = np.stack([np.ones_like(uu) * fx, -uu, -vv], axis=-1)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    return CameraModel(
        dirs=jnp.asarray(dirs.reshape(-1, 3), jnp.float32),
        offset=jnp.asarray(position, jnp.float32),
        width=width, height=height, near=float(near), far=float(far),
        n_steps=n_steps)


def render_depth(cam: CameraModel, grid: hf.HeightGrid, base_pos, base_quat,
                 cam_pitch=0.0, hf_weights=None):
    """Metric depth (H, W) for a single env (vmap over envs).

    cam_pitch: extra mount pitch [rad], positive = down (reference randomizes
    +-5 deg, config depth.angle).
    """
    # mount rotation: pitch about camera y-axis, then base orientation
    pitch_q = qm.quat_from_axis_angle(
        jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(cam_pitch))
    dirs_w = qm.quat_rotate(base_quat[None, :], qm.quat_rotate(pitch_q[None, :], cam.dirs))
    origin = base_pos + qm.quat_rotate(base_quat, cam.offset)

    ts = jnp.linspace(cam.near, cam.far, cam.n_steps)          # (S,)
    pts = origin[None, None, :] + dirs_w[:, None, :] * ts[None, :, None]  # (R, S, 3)
    h = hf.sample_height(grid, pts[..., 0], pts[..., 1], hf_weights)      # (R, S)
    # signed clearance: below floor OR above a ceiling surface (tunnel roof,
    # tire top ring) counts as inside solid — rays see overhangs
    f = pts[..., 2] - h
    if grid.ceiling is not None:
        hc = hf.sample_ceiling(grid, pts[..., 0], pts[..., 1], hf_weights)
        f = jnp.minimum(f, hc - pts[..., 2])
    below = f < 0                                              # crossed surface
    # first crossing index (n_steps if none)
    idx = jnp.argmax(below, axis=-1)
    any_hit = jnp.any(below, axis=-1)
    i1 = jnp.clip(idx, 1, cam.n_steps - 1)
    i0 = i1 - 1
    # secant refinement between the straddling samples
    f0 = jnp.take_along_axis(f, i0[:, None], axis=1)[:, 0]
    f1 = jnp.take_along_axis(f, i1[:, None], axis=1)[:, 0]
    t0 = ts[i0]
    t1 = ts[i1]
    tau = t0 - f0 * (t1 - t0) / jnp.where(jnp.abs(f1 - f0) < 1e-9, 1e-9, f1 - f0)
    depth = jnp.where(any_hit, jnp.clip(tau, cam.near, cam.far), cam.far)
    return depth.reshape(cam.height, cam.width)


def process_depth(key, depth, near, far, depth_noise=0.05):
    """Reference process_depth_image (:154-170): clip, normalize to
    [-0.5, 0.5], global + per-pixel uniform noise."""
    d = jnp.clip(depth, near, far)
    d = (d - near) / (far - near) - 0.5
    k1, k2, k3 = jax.random.split(key, 3)
    level = depth_noise * jax.random.uniform(k1)
    d = d + depth_noise * 2.0 * (jax.random.uniform(k2) - 0.5)
    d = d + level * 2.0 * (jax.random.uniform(k3, d.shape) - 0.5)
    return d
