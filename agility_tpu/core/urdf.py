"""URDF -> RobotModel parsing (host-side, build time).

Replaces the reference's IsaacGym asset pipeline (gym.load_asset with
collapse_fixed_joints + dont_collapse flags, bbc/legged_gym/envs/base/
legged_robot.py:1006-1030): fixed-joint subtrees are merged into their moving
parent (composite inertia), except frames marked `dont_collapse="true"` which
are kept as massless *reported bodies* (their inertia is still merged so the
dynamics see the full mass).
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

import numpy as np

from agility_tpu.core.model import (
    CollisionSphere,
    RobotModel,
    merge_inertia,
    rpy_to_mat,
)


def _vec(s: Optional[str], default="0 0 0") -> np.ndarray:
    return np.array([float(x) for x in (s or default).split()])


class _Link:
    def __init__(self, el):
        self.name = el.get("name")
        inertial = el.find("inertial")
        if inertial is None:
            self.mass, self.com, self.inertia = 0.0, np.zeros(3), np.zeros((3, 3))
        else:
            self.mass = float(inertial.find("mass").get("value"))
            o = inertial.find("origin")
            self.com = _vec(o.get("xyz") if o is not None else None)
            rot = rpy_to_mat(_vec(o.get("rpy") if o is not None else None))
            I = inertial.find("inertia")
            g = lambda k: float(I.get(k))
            Ib = np.array(
                [
                    [g("ixx"), g("ixy"), g("ixz")],
                    [g("ixy"), g("iyy"), g("iyz")],
                    [g("ixz"), g("iyz"), g("izz")],
                ]
            )
            self.inertia = rot @ Ib @ rot.T


class _Joint:
    def __init__(self, el):
        self.name = el.get("name")
        self.type = el.get("type")
        self.parent = el.find("parent").get("link")
        self.child = el.find("child").get("link")
        o = el.find("origin")
        self.xyz = _vec(o.get("xyz") if o is not None else None)
        self.rot = rpy_to_mat(_vec(o.get("rpy") if o is not None else None))
        ax = el.find("axis")
        self.axis = _vec(ax.get("xyz")) if ax is not None else np.array([1.0, 0, 0])
        lim = el.find("limit")
        self.lower = float(lim.get("lower", "0")) if lim is not None else 0.0
        self.upper = float(lim.get("upper", "0")) if lim is not None else 0.0
        self.effort = float(lim.get("effort", "0")) if lim is not None else 0.0
        self.velocity = float(lim.get("velocity", "0")) if lim is not None else 0.0
        self.dont_collapse = el.get("dont_collapse") == "true"


def load_urdf(path: str) -> "ParsedURDF":
    root = ET.parse(path).getroot()
    links = {l.name: l for l in (_Link(el) for el in root.findall("link"))}
    joints = [_Joint(el) for el in root.findall("joint")]
    return ParsedURDF(links, joints)


def parsed_to_json(p: "ParsedURDF") -> dict:
    """Serialize a parsed robot description to a plain-JSON schema (the form
    our distilled model assets ship in; see tools/extract_go2.py)."""
    return {
        "links": {
            n: {"mass": l.mass, "com": l.com.tolist(), "inertia": l.inertia.tolist()}
            for n, l in p.links.items()
        },
        "joints": [
            {
                "name": j.name, "type": j.type, "parent": j.parent, "child": j.child,
                "xyz": j.xyz.tolist(), "rot": j.rot.tolist(), "axis": j.axis.tolist(),
                "lower": j.lower, "upper": j.upper, "effort": j.effort,
                "velocity": j.velocity, "dont_collapse": j.dont_collapse,
            }
            for j in p.joints
        ],
    }


def parsed_from_json(d: dict) -> "ParsedURDF":
    links = {}
    for n, ld in d["links"].items():
        l = _Link.__new__(_Link)
        l.name = n
        l.mass = float(ld["mass"])
        l.com = np.array(ld["com"])
        l.inertia = np.array(ld["inertia"])
        links[n] = l
    joints = []
    for jd in d["joints"]:
        j = _Joint.__new__(_Joint)
        j.name, j.type = jd["name"], jd["type"]
        j.parent, j.child = jd["parent"], jd["child"]
        j.xyz = np.array(jd["xyz"])
        j.rot = np.array(jd["rot"])
        j.axis = np.array(jd["axis"])
        j.lower, j.upper = jd["lower"], jd["upper"]
        j.effort, j.velocity = jd["effort"], jd["velocity"]
        j.dont_collapse = jd["dont_collapse"]
        joints.append(j)
    return ParsedURDF(links, joints)


class ParsedURDF:
    def __init__(self, links: Dict[str, _Link], joints: List[_Joint]):
        self.links = links
        self.joints = joints
        self.children: Dict[str, List[_Joint]] = {}
        child_names = set()
        for j in joints:
            self.children.setdefault(j.parent, []).append(j)
            child_names.add(j.child)
        roots = [n for n in links if n not in child_names]
        assert len(roots) == 1, f"expected one root link, got {roots}"
        self.root = roots[0]

    def build_model(self, default_dof_pos: Optional[Dict[str, float]] = None) -> RobotModel:
        """Collapse fixed joints and emit a RobotModel (no collision spheres;
        callers attach those per-robot)."""
        link_names: List[str] = []
        parents: List[int] = []
        joint_pos: List[np.ndarray] = []
        joint_rot: List[np.ndarray] = []
        joint_axis: List[np.ndarray] = []
        masses: List[float] = []
        coms: List[np.ndarray] = []
        inertias: List[np.ndarray] = []
        dof_names: List[str] = []
        dof_link: List[int] = []
        limits: List[List[float]] = []
        # reported bodies: (name, moving link idx, offset in link frame)
        body_names: List[str] = []
        body_link: List[int] = []
        body_offset: List[np.ndarray] = []

        def add_moving_link(name, parent_idx, jpos, jrot, jaxis):
            idx = len(link_names)
            link_names.append(name)
            parents.append(parent_idx)
            joint_pos.append(jpos)
            joint_rot.append(jrot)
            joint_axis.append(jaxis)
            l = self.links[name]
            masses.append(l.mass)
            coms.append(l.com.copy())
            inertias.append(l.inertia.copy())
            body_names.append(name)
            body_link.append(idx)
            body_offset.append(np.zeros(3))
            return idx

        def visit(link_name: str, moving_idx: int, fixed_pos: np.ndarray, fixed_rot: np.ndarray):
            """Recurse over children of `link_name`; (fixed_pos, fixed_rot) is
            the accumulated fixed transform from the moving link's frame."""
            for j in self.children.get(link_name, []):
                if j.type in ("revolute", "continuous", "prismatic"):
                    jp = fixed_pos + fixed_rot @ j.xyz
                    jr = fixed_rot @ j.rot
                    child_idx = add_moving_link(j.child, moving_idx, jp, jr, j.axis)
                    dof_names.append(j.name)
                    dof_link.append(child_idx)
                    limits.append([j.lower, j.upper, j.effort, j.velocity])
                    visit(j.child, child_idx, np.zeros(3), np.eye(3))
                elif j.type == "fixed":
                    cp = fixed_pos + fixed_rot @ j.xyz
                    cr = fixed_rot @ j.rot
                    cl = self.links[j.child]
                    if cl.mass > 0:
                        # composite the fixed child's inertia into the moving link
                        com_in_moving = cp + cr @ cl.com
                        I_in_moving = cr @ cl.inertia @ cr.T
                        m, c, I = merge_inertia(
                            masses[moving_idx], coms[moving_idx], inertias[moving_idx],
                            cl.mass, com_in_moving, I_in_moving,
                        )
                        masses[moving_idx], coms[moving_idx], inertias[moving_idx] = m, c, I
                    if j.dont_collapse:
                        body_names.append(j.child)
                        body_link.append(moving_idx)
                        body_offset.append(cp)
                    visit(j.child, moving_idx, cp, cr)
                else:
                    raise ValueError(f"unsupported joint type {j.type}")

        base_idx = add_moving_link(self.root, -1, np.zeros(3), np.eye(3), np.zeros(3))
        visit(self.root, base_idx, np.zeros(3), np.eye(3))

        limits_arr = np.array(limits) if limits else np.zeros((0, 4))
        nu = len(dof_names)
        L = len(link_names)
        ancestors = np.zeros((L, nu), bool)
        for d in range(nu):
            l = dof_link[d]
            # dof d drives link dof_link[d] and all its descendants
            for i in range(L):
                k = i
                while k != -1:
                    if k == l:
                        ancestors[i, d] = True
                        break
                    k = parents[k]

        ddp = np.zeros(nu)
        if default_dof_pos:
            for i, n in enumerate(dof_names):
                ddp[i] = default_dof_pos.get(n, 0.0)

        return RobotModel(
            link_names=link_names,
            parent=np.array(parents, np.int32),
            joint_pos=np.stack(joint_pos),
            joint_rot=np.stack(joint_rot),
            joint_axis=np.stack(joint_axis),
            link_mass=np.array(masses),
            link_com=np.stack(coms),
            link_inertia=np.stack(inertias),
            dof_names=dof_names,
            dof_link=np.array(dof_link, np.int32),
            dof_limit_lower=limits_arr[:, 0],
            dof_limit_upper=limits_arr[:, 1],
            dof_effort_limit=limits_arr[:, 2],
            dof_velocity_limit=limits_arr[:, 3],
            default_dof_pos=ddp,
            body_names=body_names,
            body_link=np.array(body_link, np.int32),
            body_offset=np.stack(body_offset),
            spheres=[],
            ancestors=ancestors,
        )


# ---------------------------------------------------------------------------
# Go2
# ---------------------------------------------------------------------------

GO2_DEFAULT_DOF_POS = {
    # reference bbc/legged_gym/envs/go2/go2_locomotion_config.py:36-51
    "FL_hip_joint": 0.0, "RL_hip_joint": 0.0, "FR_hip_joint": 0.0, "RR_hip_joint": 0.0,
    "FL_thigh_joint": 0.9, "RL_thigh_joint": 0.9, "FR_thigh_joint": 0.9, "RR_thigh_joint": 0.9,
    "FL_calf_joint": -1.8, "RL_calf_joint": -1.8, "FR_calf_joint": -1.8, "RR_calf_joint": -1.8,
}


def _go2_collision_spheres(model: RobotModel) -> List[CollisionSphere]:
    """Sphere decomposition of the Go2 URDF collision primitives.

    Offsets/radii derive from the collision geometry in
    bbc/resources/robots/go2/urdf/go2.urdf (base box 0.376x0.094x0.114, hip
    cylinders r=0.046 at |y|=0.08, thigh boxes 0.11 long at z=-0.1065, calf +
    calflower cylinders, foot spheres r=0.022 at the foot frame).
    """
    spheres: List[CollisionSphere] = []
    li = {n: i for i, n in enumerate(model.link_names)}
    bi = {n: i for i, n in enumerate(model.body_names)}

    def add(link, body, off, r, name):
        spheres.append(CollisionSphere(li[link], bi[body], np.array(off, float), r, name))

    # base box -> 3 spheres along x; head (fixed to base) -> 1 sphere
    for k, x in enumerate((-0.13, 0.0, 0.13)):
        add("base", "base", (x, 0.0, 0.0), 0.057, f"base_{k}")
    add("base", "base", (0.293, 0.0, -0.06), 0.047, "head")

    for leg in ("FL", "FR", "RL", "RR"):
        ys = 1.0 if leg in ("FL", "RL") else -1.0
        add(f"{leg}_hip", f"{leg}_hip", (0.0, 0.08 * ys, 0.0), 0.046, f"{leg}_hip")
        add(f"{leg}_thigh", f"{leg}_thigh", (0.0, 0.0, -0.1065), 0.034, f"{leg}_thigh")
        add(f"{leg}_calf", f"{leg}_calf", (0.008, 0.0, -0.06), 0.013, f"{leg}_calf_u")
        add(f"{leg}_calf", f"{leg}_calf", (0.016, 0.0, -0.15), 0.016, f"{leg}_calf_l")
        add(f"{leg}_calf", f"{leg}_foot", (-0.002, 0.0, -0.213), 0.022, f"{leg}_foot")
    return spheres


def build_go2_model(source: Optional[str] = None) -> RobotModel:
    """Build the Go2 RobotModel: 13 moving links, 12 dofs, 17 reported bodies
    (base, 4x hip/thigh/calf/foot) — the body-by-name layout the reference
    indexes into (legged_robot.py:1077-1094, KEY_BODY_NAMES :19).

    `source` may be a .urdf or a distilled .json model asset; default is the
    packaged assets/go2_model.json (generated by tools/extract_go2.py).
    """
    import json
    import os

    if source is None:
        source = os.path.join(os.path.dirname(__file__), "..", "assets", "go2_model.json")
    if source.endswith(".json"):
        with open(source) as f:
            parsed = parsed_from_json(json.load(f))
    else:
        parsed = load_urdf(source)
    model = parsed.build_model(GO2_DEFAULT_DOF_POS)
    # keep only base + leg bodies in the reported table (drop Head_* frames),
    # preserving depth-first order: base, {leg}_hip/thigh/calf/foot x4
    keep = [i for i, n in enumerate(model.body_names) if n == "base" or n[:3] in ("FL_", "FR_", "RL_", "RR_")]
    model.body_names = [model.body_names[i] for i in keep]
    model.body_link = model.body_link[keep]
    model.body_offset = model.body_offset[keep]
    model.spheres = _go2_collision_spheres(model)
    return model
