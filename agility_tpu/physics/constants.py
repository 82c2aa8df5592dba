"""Device-resident model constants.

`ModelConsts` is the jnp mirror of `core.model.RobotModel`: a frozen pytree of
arrays closed over by the jitted physics functions.  Built once per model.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from agility_tpu.core.model import RobotModel


def _quat_from_mat_np(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> xyzw quaternion (host, build time)."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w > 1e-6:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:  # pick largest diagonal
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(0.0, 1.0 + R[i, i] - R[j, j] - R[k, k])) * 2.0
        q = np.zeros(3)
        q[i] = s / 4
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        w = (R[k, j] - R[j, k]) / s
        x, y, z = q
    q = np.array([x, y, z, w])
    return q / np.linalg.norm(q)


@dataclasses.dataclass(frozen=True)
class ModelConsts:
    """Closure-only constants: never pass through a jit/vmap boundary.

    Index/structure fields are *numpy* (concrete at trace time, usable for
    static control flow and constant gathers); float fields are jnp device
    constants.
    """
    # tree
    parent: np.ndarray           # (L,) int32 numpy — static tree structure
    joint_pos: jnp.ndarray       # (L, 3)
    joint_quat: jnp.ndarray      # (L, 4) xyzw, parent->child at q=0
    joint_axis: jnp.ndarray      # (L, 3) in child frame
    # inertial
    link_mass: jnp.ndarray       # (L,)
    link_com: jnp.ndarray        # (L, 3)
    link_inertia: jnp.ndarray    # (L, 3, 3)
    # dofs
    dof_link: np.ndarray         # (nu,) int32 numpy
    dof_limit_lower: jnp.ndarray
    dof_limit_upper: jnp.ndarray
    dof_effort_limit: jnp.ndarray
    dof_velocity_limit: jnp.ndarray
    default_dof_pos: jnp.ndarray
    # bodies
    body_link: np.ndarray        # (B,) int32 numpy
    body_offset: jnp.ndarray     # (B, 3)
    # collision spheres
    sph_link: np.ndarray         # (S,) int32 numpy
    sph_body: np.ndarray         # (S,) int32 numpy
    sph_offset: jnp.ndarray      # (S, 3)
    sph_radius: jnp.ndarray      # (S,)
    # structure
    ancestors: jnp.ndarray       # (L, nu) float32 mask
    nu: int = dataclasses.field(metadata=dict(static=True), default=12)
    n_links: int = dataclasses.field(metadata=dict(static=True), default=13)
    n_bodies: int = dataclasses.field(metadata=dict(static=True), default=17)

    @property
    def nv(self) -> int:
        return 6 + self.nu

    @staticmethod
    def from_model(m: RobotModel, dtype=jnp.float32) -> "ModelConsts":
        sl, sb, so, sr = m.sphere_arrays()
        jq = np.stack([_quat_from_mat_np(R) for R in m.joint_rot])
        f = lambda x: jnp.asarray(x, dtype)
        return ModelConsts(
            parent=np.asarray(m.parent, np.int32),
            joint_pos=f(m.joint_pos),
            joint_quat=f(jq),
            joint_axis=f(m.joint_axis),
            link_mass=f(m.link_mass),
            link_com=f(m.link_com),
            link_inertia=f(m.link_inertia),
            dof_link=np.asarray(m.dof_link, np.int32),
            dof_limit_lower=f(m.dof_limit_lower),
            dof_limit_upper=f(m.dof_limit_upper),
            dof_effort_limit=f(m.dof_effort_limit),
            dof_velocity_limit=f(m.dof_velocity_limit),
            default_dof_pos=f(m.default_dof_pos),
            body_link=np.asarray(m.body_link, np.int32),
            body_offset=f(m.body_offset),
            sph_link=np.asarray(sl, np.int32),
            sph_body=np.asarray(sb, np.int32),
            sph_offset=f(so),
            sph_radius=f(sr),
            ancestors=f(m.ancestors.astype(np.float32)),
            nu=m.nu,
            n_links=m.n_links,
            n_bodies=m.n_bodies,
        )


# Intentionally NOT registered as a pytree: ModelConsts is closed over by
# jitted functions, never traced.  Keeping index arrays as numpy guarantees
# static tree structure at trace time (python loops over links unroll).
