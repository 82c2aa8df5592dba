"""The batched simulation engine: PD actuation -> forward dynamics -> contact
solve -> semi-implicit integration, `decimation` substeps per control step.

This is the TPU-native replacement for the reference's IsaacGym step loop
(bbc/legged_gym/envs/base/legged_robot.py:99-115: per-substep
`_compute_torques` -> set_dof_actuation_force_tensor -> gym.simulate).
Everything is a pure function of (state, control, params); the env layer
vmaps/shards it along the env axis.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agility_tpu.core import quat as qm
from agility_tpu.physics import contact as ct
from agility_tpu.physics import dynamics as dyn
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics import kinematics as kin
from agility_tpu.physics.constants import ModelConsts
from agility_tpu.physics.state import SimState


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    dt: float = 1.0 / 200.0          # sim dt (reference legged_robot_config.py:174)
    decimation: int = 4              # control dt = dt * decimation (go2 cfg:60)
    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81)
    solver: str = "jacobi"           # "jacobi" | "pgs" | "soft"
    pgs_iters: int = 4               # ~ physx num_position_iterations (cfg:182)
    jacobi_iters: int = 10
    jacobi_relax: float = 0.6
    warm_start: bool = False  # carry contact impulses across substeps (SoA
    #                           path); lets jacobi_iters drop to ~5 at equal
    #                           contact accuracy — flip on after TPU timing
    baumgarte: float = 0.2
    contact_slop: float = 0.002
    max_depenetration_vel: float = 1.0   # physx cfg:187
    restitution: float = 0.0             # terrain cfg:27
    # soft-solver gains
    soft_kn: float = 5000.0
    soft_cn: float = 150.0
    soft_kt: float = 500.0
    # joint handling
    enforce_joint_limits: bool = True
    fast: bool = True        # layout-optimized dynamics/contact (fastpath.py)
    patch_size: int = 24     # per-env terrain patch (gather-free sampling);
    #                          0 disables patching (direct grid gathers)
    pallas_contact: bool = False   # fused Pallas LCP kernel (pallas_contact.py)
    pallas_env_block: int = 16
    soa: bool = True         # env-minor ("batch-last") layout path (soa.py);
    #                          False falls back to vmap(control_step)
    dtype: object = jnp.float32


class EnvParams(NamedTuple):
    """Per-env domain-randomized physical parameters (leading env axis added
    by the env layer; here shapes are single-env).  Reference distributions:
    legged_robot.py:386-447, 861-888; go2_locomotion_config.py:74-100."""
    friction: jnp.ndarray          # () terrain friction coefficient
    kp_scale: jnp.ndarray          # (nu,) motor-strength/EASI stiffness factor
    kd_scale: jnp.ndarray          # (nu,) damping factor
    added_base_mass: jnp.ndarray   # () payload [kg]
    base_com_shift: jnp.ndarray    # (3,) CoM offset [m]
    hf_weights: jnp.ndarray = None  # (L,) movable heightfield layer offsets

    @staticmethod
    def nominal(nu: int = 12, dtype=jnp.float32):
        return EnvParams(
            friction=jnp.asarray(1.0, dtype),
            kp_scale=jnp.ones(nu, dtype),
            kd_scale=jnp.ones(nu, dtype),
            added_base_mass=jnp.asarray(0.0, dtype),
            base_com_shift=jnp.zeros(3, dtype),
        )


class Control(NamedTuple):
    """PD position targets + gains (constant gains live here so control_type
    variants stay possible)."""
    target: jnp.ndarray    # (nu,) desired joint positions
    kp: jnp.ndarray        # (nu,)
    kd: jnp.ndarray        # (nu,)


class EnvState(NamedTuple):
    """Minimal generalized state carried between substeps (single env)."""
    base_pos: jnp.ndarray
    base_quat: jnp.ndarray
    dof_pos: jnp.ndarray
    u: jnp.ndarray          # (nv,) [v_base, w_base, qd]


def _env_consts(mc: ModelConsts, params: EnvParams) -> ModelConsts:
    """Apply per-env payload/CoM randomization to the base link inertials."""
    link_mass = mc.link_mass.at[0].add(params.added_base_mass)
    link_com = mc.link_com.at[0].add(params.base_com_shift)
    return dataclasses.replace(mc, link_mass=link_mass, link_com=link_com)


def pd_torques(mc: ModelConsts, control: Control, params: EnvParams, dof_pos, dof_vel):
    """Reference _compute_torques (legged_robot.py:547-579): scaled PD with
    per-env motor-strength factors, clipped to URDF effort limits.  Returns
    (clipped, unclipped) — rewards penalize the raw value (torques_org)."""
    tau = (
        params.kp_scale * control.kp * (control.target - dof_pos)
        - params.kd_scale * control.kd * dof_vel
    )
    return jnp.clip(tau, -mc.dof_effort_limit, mc.dof_effort_limit), tau


def substep(
    mc: ModelConsts,
    cfg: EngineConfig,
    grid: hf.HeightGrid,
    s: EnvState,
    control: Control,
    params: EnvParams,
    terrain_patch=None,
):
    """One physics substep.  Returns (new_state, torques, sphere_forces)."""
    mce = _env_consts(mc, params)
    gravity = jnp.asarray(cfg.gravity, cfg.dtype)

    ls = kin.fk(mce, s.base_pos, s.base_quat, s.dof_pos)
    ls = kin.velocities(mce, ls, s.u[:3], s.u[3:6], s.u[6:])
    axes = kin.world_axes(mce, ls)

    tau_j, tau_org = pd_torques(mce, control, params, s.dof_pos, s.u[6:])
    tau = jnp.concatenate([jnp.zeros(6, cfg.dtype), tau_j])

    if cfg.fast:
        from agility_tpu.physics import fastpath as fp

        M, C = fp.mass_and_bias(mce, ls, axes, s.u[6:], gravity)
        factors = dyn.factor_mass_matrix(M)
        phi, normals, JpT = fp.detect_T(mce, ls, axes, grid, params.hf_weights,
                                        terrain_patch)
        u_free = s.u + cfg.dt * dyn.solve_mass(factors, tau - C)
        if cfg.solver in ("pgs", "jacobi"):
            u_new, sph_force = fp.jacobi_solve_world(
                phi, normals, JpT, factors, u_free, params.friction, cfg.dt,
                iters=cfg.jacobi_iters, relax=cfg.jacobi_relax,
                baumgarte=cfg.baumgarte, slop=cfg.contact_slop,
                max_depen_vel=cfg.max_depenetration_vel,
                restitution=cfg.restitution)
        else:
            f_world = fp.soft_forces_world(
                phi, normals, JpT, s.u, params.friction,
                kn=cfg.soft_kn, cn=cfg.soft_cn, kt=cfg.soft_kt)
            tau_c = JpT @ f_world.reshape(-1)
            u_new = s.u + cfg.dt * dyn.solve_mass(factors, tau + tau_c - C)
            sph_force = f_world
    else:
        M = dyn.mass_matrix(mce, ls, axes)
        C = dyn.bias_forces(mce, ls, axes, s.u[6:], gravity)
        factors = dyn.factor_mass_matrix(M)

        con = ct.detect(mce, ls, axes, grid, params.hf_weights)

        if cfg.solver in ("pgs", "jacobi"):
            u_free = s.u + cfg.dt * dyn.solve_mass(factors, tau - C)
            solve = ct.pgs_solve if cfg.solver == "pgs" else ct.jacobi_solve
            kw = (
                dict(iters=cfg.pgs_iters)
                if cfg.solver == "pgs"
                else dict(iters=cfg.jacobi_iters, relax=cfg.jacobi_relax)
            )
            u_new, _, sph_force = solve(
                con, factors, u_free, params.friction, cfg.dt,
                baumgarte=cfg.baumgarte,
                slop=cfg.contact_slop, max_depen_vel=cfg.max_depenetration_vel,
                restitution=cfg.restitution, **kw,
            )
        else:
            f_world = ct.soft_forces(
                con, s.u, params.friction, kn=cfg.soft_kn, cn=cfg.soft_cn, kt=cfg.soft_kt
            )
            # project world contact forces into generalized coords: tau_c = Jp^T f
            Jp = jnp.einsum("sba,sbv->sav", con.frame, con.Jc)  # undo frame rot
            tau_c = jnp.einsum("sav,sa->v", Jp, f_world)
            u_new = s.u + cfg.dt * dyn.solve_mass(factors, tau + tau_c - C)
            sph_force = f_world

    # semi-implicit Euler (momentum-consistent limit impulses; the residual
    # safety clamp lives in _integrate)
    return (_integrate(mc, cfg, s, u_new, factors), (tau_j, tau_org),
            sph_force)


def control_step(
    mc: ModelConsts,
    cfg: EngineConfig,
    grid: hf.HeightGrid,
    s: EnvState,
    control: Control,
    params: EnvParams,
):
    """`decimation` substeps (the reference's 200 Hz sim / 50 Hz control
    split).  Returns (state, torques, body_forces (B,3), max_body_forces).

    The terrain patch around the robot is extracted once here and reused by
    every substep (the base moves <~4 cm within one control step)."""
    terrain_patch = None
    if cfg.fast and cfg.patch_size:
        from agility_tpu.physics import patch as pt

        terrain_patch = pt.extract(grid, s.base_pos[:2], cfg.patch_size,
                                   params.hf_weights)

    def body(carry, _):
        st, _ = carry
        st2, taus, sphf = substep(mc, cfg, grid, st, control, params, terrain_patch)
        # net contact force per reported body; ceiling rows (appended past S
        # by fastpath.detect_T on overhang worlds) accumulate onto the same
        # leading base-link bodies
        ids = np.asarray(mc.sph_body)
        if sphf.shape[0] > ids.shape[0]:
            ids = np.concatenate([ids, ids[: sphf.shape[0] - ids.shape[0]]])
        bf = jax.ops.segment_sum(sphf, ids, num_segments=mc.n_bodies)
        return (st2, taus), bf

    zt = jnp.zeros(mc.nu, cfg.dtype)
    (s2, taus), bf_all = jax.lax.scan(body, (s, (zt, zt)), None, length=cfg.decimation)
    body_forces = bf_all[-1]
    max_body_forces = jnp.max(jnp.abs(bf_all), axis=0)
    return s2, taus, body_forces, max_body_forces, terrain_patch


def _pre_contact(mc: ModelConsts, cfg: EngineConfig, grid, s: EnvState,
                 control: Control, params: EnvParams, terrain_patch):
    """Single-env fastpath work up to (and excluding) the contact solve."""
    from agility_tpu.physics import fastpath as fp

    mce = _env_consts(mc, params)
    gravity = jnp.asarray(cfg.gravity, cfg.dtype)
    ls = kin.fk(mce, s.base_pos, s.base_quat, s.dof_pos)
    ls = kin.velocities(mce, ls, s.u[:3], s.u[3:6], s.u[6:])
    axes = kin.world_axes(mce, ls)
    tau_j, tau_org = pd_torques(mce, control, params, s.dof_pos, s.u[6:])
    tau = jnp.concatenate([jnp.zeros(6, cfg.dtype), tau_j])
    M, C = fp.mass_and_bias(mce, ls, axes, s.u[6:], gravity)
    factors = dyn.factor_mass_matrix(M)
    u_free = s.u + cfg.dt * dyn.solve_mass(factors, tau - C)
    phi, normals, JpT = fp.detect_T(mce, ls, axes, grid, params.hf_weights,
                                    terrain_patch)
    MinvJT = dyn.solve_mass(factors, JpT)
    G = JpT.T @ MinvJT
    return u_free, phi, normals, JpT, MinvJT, G, (tau_j, tau_org), factors


def _clamp_base_velocity(u, max_lin=100.0, max_ang=50.0):
    """Backstop against runaway states (the analogue of PhysX's
    max_linear/angular_velocity caps, sim cfg :94-96)."""
    v = jnp.clip(u[:3], -max_lin, max_lin)
    w = jnp.clip(u[3:6], -max_ang, max_ang)
    return jnp.concatenate([v, w, u[6:]])


def _integrate(mc: ModelConsts, cfg: EngineConfig, s: EnvState, u_new,
               factors=None):
    u_new = _clamp_base_velocity(u_new)
    if cfg.enforce_joint_limits and factors is not None:
        # physical limit enforcement: joint-space impulses through M^-1
        # (dynamics.limit_impulses) — the old direct clamp deleted limb
        # momentum with no reaction and was pumpable into ballistic flight
        # (r4 trot diagnosis, PERF_NOTES round 5)
        u_new = dyn.limit_impulses(mc, factors, u_new, s.dof_pos, cfg.dt)
    base_pos = s.base_pos + cfg.dt * u_new[:3]
    base_quat = qm.quat_integrate(s.base_quat, u_new[3:6], cfg.dt)
    dof_pos = s.dof_pos + cfg.dt * u_new[6:]
    qd = u_new[6:]
    if cfg.enforce_joint_limits:
        # residual safety clamp: with the impulse pass this only catches
        # ~1e-3-scale frozen-active-set coupling residue
        clamped = jnp.clip(dof_pos, mc.dof_limit_lower, mc.dof_limit_upper)
        qd = jnp.where(clamped == dof_pos, qd, 0.0)
        dof_pos = clamped
        qd = jnp.clip(qd, -mc.dof_velocity_limit, mc.dof_velocity_limit)
    return EnvState(base_pos, base_quat, dof_pos,
                    jnp.concatenate([u_new[:6], qd]))


def step_batch(mc: ModelConsts, cfg: EngineConfig, grid, s: EnvState,
               control: Control, params: EnvParams):
    """The batched control-step entry point used by the env layer.
    Dispatches to the env-minor SoA path (default; PERF_NOTES.md layout
    rules), the fused-Pallas-LCP path, or plain vmap(control_step).

    The AGILITY_ENGINE environment variable overrides the config choice:
    "vmap" prefers the vmapped oracle path where it is capable (the CI
    suite uses this — the SoA path's scalar-unrolled HLO compiles ~10x
    slower on the XLA *CPU* backend, its target is the TPU compiler);
    "soa" forces the SoA path.  Grids with a ceiling surface always take
    the SoA path — overhang collision exists only there."""
    import os

    override = os.environ.get("AGILITY_ENGINE", "")
    use_soa = cfg.soa and cfg.solver == "jacobi" and not cfg.pallas_contact
    if override == "vmap":
        use_soa = False
    elif override == "soa":
        use_soa = True
    if grid.ceiling is not None and (cfg.pallas_contact or not cfg.fast
                                     or not cfg.patch_size):
        # overhang collision exists only in the SoA path and the patch-based
        # vmap fast path (fastpath.detect_T ceiling rows)
        use_soa = True
    if use_soa:
        from agility_tpu.physics import soa

        return soa.control_step_batched(mc, cfg, grid, s, control, params)
    if cfg.warm_start:
        # Only the SoA path carries contact impulses across substeps
        # (soa.py lam0 carry).  A warm-start config reaching the vmap or
        # pallas path would silently run cfg.jacobi_iters COLD sweeps —
        # short of the validated fixed point.  Restore the equivalent
        # cold sweep count instead: the warm default of 5 sweeps matches
        # the cold 10-sweep solution (tests/test_soa.py), i.e. warm ~
        # halves the sweeps needed, so cold needs 2x.
        cfg = dataclasses.replace(cfg, warm_start=False,
                                  jacobi_iters=2 * cfg.jacobi_iters)
    return control_step_batched(mc, cfg, grid, s, control, params)


def control_step_batched(mc: ModelConsts, cfg: EngineConfig, grid, s: EnvState,
                         control: Control, params: EnvParams):
    """Batched control step (leading env axis on every input).  With
    `cfg.pallas_contact` the contact LCP of all envs runs in one fused
    Pallas kernel per substep; otherwise this is equivalent to
    vmap(control_step)."""
    if not cfg.pallas_contact:
        return jax.vmap(
            lambda si, ci, pi: control_step(mc, cfg, grid, si, ci, pi)
        )(s, control, params)

    from agility_tpu.physics import pallas_contact as pc
    from agility_tpu.physics import patch as pt

    terrain_patch = None
    if cfg.fast and cfg.patch_size:
        terrain_patch = pt.extract_batch(
            grid, s.base_pos[:, :2], cfg.patch_size, params.hf_weights)

    def body(carry, _):
        st, _ = carry
        pre = jax.vmap(
            lambda si, ci, pi, tp: _pre_contact(mc, cfg, grid, si, ci, pi, tp),
            in_axes=(0, 0, 0, (pt.Patch(values=0, min3=0, x0=0, y0=0,
                                        hscale=None, origin=None,
                                        ceil=None if terrain_patch.ceil is None
                                        else 0)
                               if terrain_patch is not None else None)),
        )(st, control, params, terrain_patch)
        u_free, phi, normals, JpT, MinvJT, G, taus, factors = pre
        u_new, sph_force = pc.jacobi_solve_batch(
            phi, normals, JpT, MinvJT, G, u_free, params.friction, cfg.dt,
            iters=cfg.jacobi_iters, relax=cfg.jacobi_relax,
            baumgarte=cfg.baumgarte, slop=cfg.contact_slop,
            max_depen_vel=cfg.max_depenetration_vel,
            restitution=cfg.restitution, env_block=cfg.pallas_env_block)
        st2 = jax.vmap(lambda si, un, fi: _integrate(mc, cfg, si, un, fi))(
            st, u_new, factors)
        bf = jax.vmap(
            lambda f: jax.ops.segment_sum(f, mc.sph_body, num_segments=mc.n_bodies)
        )(sph_force)
        return (st2, taus), bf

    N = s.base_pos.shape[0]
    zt = jnp.zeros((N, mc.nu), cfg.dtype)
    (s2, taus), bf_all = jax.lax.scan(body, (s, (zt, zt)), None, length=cfg.decimation)
    body_forces = bf_all[-1]
    max_body_forces = jnp.max(jnp.abs(bf_all), axis=0)
    return s2, taus, body_forces, max_body_forces, terrain_patch


def refresh_sim_state(mc: ModelConsts, s: EnvState):
    """Recompute reported body states after a control step (the analogue of
    refresh_*_tensor, legged_robot.py:124-135).  Returns body pos/quat/vel/
    angvel tuples (B, ...) for a single env."""
    ls = kin.fk(mc, s.base_pos, s.base_quat, s.dof_pos)
    ls = kin.velocities(mc, ls, s.u[:3], s.u[3:6], s.u[6:])
    return kin.body_states(mc, ls)
