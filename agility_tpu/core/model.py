"""Static robot model description.

A `RobotModel` is a plain container of *numpy* constants describing a floating
-base kinematic tree: built once on the host (from a URDF), then closed over
by jitted physics functions as compile-time constants.  Nothing here is traced.

The reference obtains the same information at runtime through IsaacGym asset
introspection (bbc/legged_gym/envs/base/legged_robot.py:1006-1107,
gym.get_asset_dof_properties / rigid_body_names); we bake it at build time.

Conventions:
  * link 0 is the floating base; links are in depth-first URDF order.
  * generalized position q: [base pos (3), base quat xyzw (4), joint q (nu)]
  * generalized velocity u: [base lin vel world (3), base ang vel world (3),
    joint qd (nu)]  ->  nv = 6 + nu
  * "bodies" are the reported rigid-body frames (17 for Go2: the 13 moving
    links plus the 4 fixed foot frames), matching the reference's rigid-body
    state tensor layout so body-indexed logic (feet/penalized/termination
    contacts, key bodies) carries over by name.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np


@dataclasses.dataclass
class CollisionSphere:
    """A collision sphere attached to a moving link.

    `body` is the index in the *reported body* table that receives this
    sphere's contact force (so e.g. a foot sphere reports on the foot body,
    not on the calf link that actually moves it).
    """
    link: int
    body: int
    offset: np.ndarray  # (3,) in link frame
    radius: float
    name: str = ""


@dataclasses.dataclass
class RobotModel:
    # --- kinematic tree (moving links) ---
    link_names: List[str]                 # (L,)
    parent: np.ndarray                    # (L,) int, -1 for base
    joint_pos: np.ndarray                 # (L, 3) joint origin in parent frame
    joint_rot: np.ndarray                 # (L, 3, 3) joint origin rotation (parent->child at q=0)
    joint_axis: np.ndarray                # (L, 3) revolute axis in child frame (0 for base)
    # --- per-link composite inertial parameters (fixed children merged) ---
    link_mass: np.ndarray                 # (L,)
    link_com: np.ndarray                  # (L, 3) in link frame
    link_inertia: np.ndarray              # (L, 3, 3) about link COM, link frame
    # --- dofs ---
    dof_names: List[str]                  # (nu,)
    dof_link: np.ndarray                  # (nu,) moving-link index of each dof
    dof_limit_lower: np.ndarray           # (nu,)
    dof_limit_upper: np.ndarray           # (nu,)
    dof_effort_limit: np.ndarray          # (nu,)
    dof_velocity_limit: np.ndarray        # (nu,)
    default_dof_pos: np.ndarray           # (nu,)
    # --- reported bodies ---
    body_names: List[str]                 # (B,)
    body_link: np.ndarray                 # (B,) moving link carrying the body
    body_offset: np.ndarray               # (B, 3) fixed offset in link frame
    # --- collisions ---
    spheres: List[CollisionSphere]
    # --- ancestor structure ---
    # ancestors[l, j] = True iff joint dof j is on the path base->link l
    ancestors: np.ndarray                 # (L, nu) bool

    @property
    def n_links(self) -> int:
        return len(self.link_names)

    @property
    def nu(self) -> int:
        return len(self.dof_names)

    @property
    def nv(self) -> int:
        return 6 + self.nu

    @property
    def nq(self) -> int:
        return 7 + self.nu

    @property
    def n_bodies(self) -> int:
        return len(self.body_names)

    @property
    def n_spheres(self) -> int:
        return len(self.spheres)

    # stacked sphere arrays for vectorized collision
    def sphere_arrays(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        link = np.array([s.link for s in self.spheres], np.int32)
        body = np.array([s.body for s in self.spheres], np.int32)
        offset = np.stack([s.offset for s in self.spheres]).astype(np.float64)
        radius = np.array([s.radius for s in self.spheres], np.float64)
        return link, body, offset, radius

    def body_index(self, name: str) -> int:
        return self.body_names.index(name)

    def match_bodies(self, substr: str) -> List[int]:
        """All reported-body indices whose name contains `substr` (the
        reference's find-by-substring convention, legged_robot.py:1077-1094)."""
        return [i for i, n in enumerate(self.body_names) if substr in n]

    def total_mass(self) -> float:
        return float(np.sum(self.link_mass))


def merge_inertia(
    m1: float, com1: np.ndarray, I1: np.ndarray,
    m2: float, com2: np.ndarray, I2: np.ndarray,
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Combine two bodies expressed in a common frame into one composite
    (mass, COM, inertia-about-composite-COM)."""
    m = m1 + m2
    if m <= 0:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    com = (m1 * com1 + m2 * com2) / m

    def shift(I, mi, ci):
        d = ci - com
        return I + mi * (np.dot(d, d) * np.eye(3) - np.outer(d, d))

    return m, com, shift(I1, m1, com1) + shift(I2, m2, com2)


def rpy_to_mat(rpy: np.ndarray) -> np.ndarray:
    """URDF fixed-axis rpy -> rotation matrix (R = Rz(y) @ Ry(p) @ Rx(r))."""
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx
