"""Go2 locomotion environment (the BBC task) as pure batched JAX functions.

Re-design of the reference env core (bbc/legged_gym/envs/base/legged_robot.py,
1396 lines of torch + IsaacGym) for SPMD execution: the env is a static
object holding compile-time data (model constants, terrain grid, domain-
randomization draws, reward tables); `step` is a pure function
(LocoState, actions) -> (LocoState, StepOutput) with *masked* resets instead
of the reference's indexed writes (legged_robot.py:178-240), so the whole
rollout jits into one XLA program and shards along the env axis.

Observation layout (go2_locomotion_config.py:12-16, legged_robot.py:261-331):
  actor/priv obs (671) = [prop 57 | explicit 4 | priv latent 29 |
                          prop history 10x57 | commands 5 | eps 1 | c 5]
  prop (57) = [roll,pitch | ang_vel*0.25 | dof_pos-default | dof_vel*0.05 |
               last action | contact_filt-0.5 | key_pos*0]
  disc obs (49) = [roll,pitch | root_h | lin_vel*0.5 | ang_vel*0.25 |
                   dof_pos-default | dof_vel*0.05 | flat key pos | contact]
"""
from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agility_tpu.core import quat as qm
from agility_tpu.core.urdf import build_go2_model
from agility_tpu.envs import mocap as mocap_mod
from agility_tpu.envs.config import Go2LocomotionCfg
from agility_tpu.physics import engine as eng
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics import windows
from agility_tpu.physics.constants import ModelConsts
from agility_tpu.terrain import generator as terrain_gen


class LocoState(NamedTuple):
    sim: eng.EnvState                 # batched (N, ...) leaves
    episode_length: jnp.ndarray       # (N,) int32
    commands: jnp.ndarray             # (N, 5)
    latent_eps: jnp.ndarray           # (N, 1)
    latent_c: jnp.ndarray             # (N, C)
    prior_parameters: jnp.ndarray     # (C,) — EMA'd by the learner
    actions: jnp.ndarray              # (N, 12) clipped delayed actions
    last_actions: jnp.ndarray         # (N, 12)
    action_history: jnp.ndarray       # (N, buf_len, 12)
    last_dof_vel: jnp.ndarray         # (N, 12)
    torques_org: jnp.ndarray          # (N, 12)
    last_torques_org: jnp.ndarray     # (N, 12)
    obs_history: jnp.ndarray          # (N, hist, 57)
    last_contacts: jnp.ndarray        # (N, 4) bool
    contact_filt: jnp.ndarray         # (N, 4) bool
    feet_air_time: jnp.ndarray        # (N, 4)
    episode_sums: jnp.ndarray         # (N, n_rew)
    reset_buf: jnp.ndarray            # (N,) bool
    time_out_buf: jnp.ndarray         # (N,) bool
    global_counter: jnp.ndarray       # () int32
    key: jnp.ndarray                  # PRNG key
    obs_buf: jnp.ndarray              # (N, 671) cached
    disc_obs: jnp.ndarray             # (N, 49) cached (previous step's)


class StepOutput(NamedTuple):
    obs: jnp.ndarray                  # (N, 671)
    privileged_obs: jnp.ndarray       # (N, 671)
    rew: jnp.ndarray                  # (N,)
    reset: jnp.ndarray                # (N,) bool
    time_out: jnp.ndarray             # (N,) bool
    disc_obs: jnp.ndarray             # (N, 49) — post-step (fresh state)
    terminal_disc_obs: jnp.ndarray    # (N, 49) — pre-reset disc obs
    episode_sums: jnp.ndarray         # (N, n_rew) at reset time
    reward_terms: jnp.ndarray         # (N, n_rew) this step (scaled)


def compute_disc_features(mc, feet_idx, osc, sim, contact_filt, root_h):
    """49-d discriminator features of an arbitrary (possibly pre-reset) sim
    state — the reference's get_disc_observations (bbc legged_robot.py:343).

    Exists as a standalone function so `step` can evaluate it on the
    *terminal* physics state before the masked reset: the reference patches
    the disc window of reset envs with the terminal state's disc obs
    (bbc/rsl_rl/runners/on_policy_runner.py:166-181), not the previous
    step's cached observation.
    """
    from agility_tpu.physics import soa

    bq = sim.base_quat
    base_lin_vel = qm.quat_rotate_inverse(bq, sim.u[:, :3])
    base_ang_vel = qm.quat_rotate_inverse(bq, sim.u[:, 3:6])
    roll, pitch, _ = qm.euler_from_quat(bq)
    imu = jnp.stack([roll, pitch], -1)
    key_pos_w = soa.body_positions(mc, sim, feet_idx)
    hq = qm.heading_quat_inv(bq)
    flat_key_pos = qm.quat_rotate(
        hq[:, None, :], key_pos_w - sim.base_pos[:, None, :]
    ).reshape(bq.shape[0], -1)
    dof_err = (sim.dof_pos - mc.default_dof_pos) * osc.dof_pos
    dof_vel = sim.u[:, 6:] * osc.dof_vel
    cf = contact_filt.astype(jnp.float32)
    return jnp.concatenate(
        [imu, root_h, base_lin_vel * osc.lin_vel_dist,
         base_ang_vel * osc.ang_vel_dist, dof_err, dof_vel,
         flat_key_pos * osc.key_pos, cf * osc.foot_contact], axis=-1)


class Go2LocomotionEnv:
    """Static env data + pure step/reset functions."""

    def __init__(self, cfg: Go2LocomotionCfg, motion: Optional[mocap_mod.MotionData] = None):
        self.cfg = cfg
        self.model = build_go2_model()
        self.mc = ModelConsts.from_model(self.model)
        self.dt = cfg.dt
        self.num_envs = cfg.env.num_envs
        # latent_c stays |mocap_category_all|-dim even when training a single
        # mode (reference _set_latent_c indexes mocap_category_all,
        # legged_robot.py:542-545)
        self.dim_c = len(cfg.env.mocap_category_all)
        self.num_mocap = len(cfg.env.mocap_category)
        self.single_c_idx = (
            list(cfg.env.mocap_category_all).index(cfg.env.mocap_category[0])
            if self.num_mocap == 1 else -1
        )

        self.engine_cfg = eng.EngineConfig(
            dt=cfg.sim.dt,
            decimation=cfg.control.decimation,
            gravity=cfg.sim.gravity,
            solver=cfg.sim.solver,
            jacobi_iters=cfg.sim.jacobi_iters,
            jacobi_relax=cfg.sim.jacobi_relax,
            warm_start=cfg.sim.warm_start,
            restitution=cfg.terrain.restitution,
        )

        # ---- terrain ----
        td = terrain_gen.generate(cfg.terrain, seed=cfg.seed)
        self.grid = hf.from_numpy(td.height, td.hscale, origin_xy=td.origin)
        self.grid = windows.attach_bands(
            self.grid, contact_size=self.engine_cfg.patch_size)
        self.env_origins = jnp.asarray(
            terrain_gen.assign_env_origins(td, self.num_envs, cfg.terrain, seed=cfg.seed),
            jnp.float32,
        )

        # ---- mocap ----
        if motion is not None:
            self.motion = motion
        elif cfg.mocap_dir:
            self.motion = mocap_mod.load_dir(
                os.path.join(cfg.mocap_dir, "mocap_all_lb"),
                os.path.join(cfg.mocap_dir, "mocap_all_ulb"),
                cfg.env.mocap_category_all,
            )
        else:
            self.motion = mocap_mod.synthetic(
                self.model, cfg.env.mocap_category_all, active=cfg.env.mocap_category)

        # ---- body index tables (by name, like legged_robot.py:1077-1094) ----
        m = self.model
        self.feet_idx = np.asarray(m.match_bodies("foot"), np.int32)
        self.penalized_idx = np.asarray(
            m.match_bodies("thigh") + m.match_bodies("calf"), np.int32)
        self.termination_idx = np.asarray(
            m.match_bodies("base") + m.match_bodies("hip"), np.int32)
        self.hip_dofs = np.asarray([0, 3, 6, 9], np.int32)

        # soft dof limits (reference _process_dof_props :404-430)
        mid = (m.dof_limit_lower + m.dof_limit_upper) / 2
        r = m.dof_limit_upper - m.dof_limit_lower
        soft = cfg.rewards.soft_dof_pos_limit
        self.soft_dof_lower = jnp.asarray(mid - 0.5 * r * soft, jnp.float32)
        self.soft_dof_upper = jnp.asarray(mid + 0.5 * r * soft, jnp.float32)

        # ---- per-env domain randomization (drawn once, like env creation) ----
        rng = np.random.default_rng(cfg.seed)
        dr = cfg.domain_rand
        N = self.num_envs
        if dr.randomize_friction:
            buckets = rng.uniform(*dr.friction_range, size=64)
            friction = buckets[rng.integers(0, 64, N)]
        else:
            friction = np.ones(N)
        added_mass = rng.uniform(*dr.added_mass_range, N) if dr.randomize_base_mass else np.zeros(N)
        com_shift = (
            rng.uniform(*dr.added_com_range, (N, 3)) if dr.randomize_base_com else np.zeros((N, 3))
        )
        if dr.randomize_motor:
            if dr.use_easi:
                mean = np.asarray(dr.easi_mean)
                var = np.asarray(dr.easi_var)
                # per-dof EASI param index: hips->0, thighs->2, calves->4
                type_idx = np.array([0, 2, 4] * 4)
                kp_scale = rng.normal(mean[type_idx], np.sqrt(var[type_idx]), (N, 12))
                kd_scale = rng.normal(mean[type_idx + 1], np.sqrt(var[type_idx + 1]), (N, 12))
            else:
                kp_scale = rng.uniform(*dr.motor_strength_range, (N, 12))
                kd_scale = rng.uniform(*dr.motor_strength_range, (N, 12))
        else:
            kp_scale = np.ones((N, 12))
            kd_scale = np.ones((N, 12))

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        self.params = eng.EnvParams(
            friction=f32(friction),
            kp_scale=f32(kp_scale),
            kd_scale=f32(kd_scale),
            added_base_mass=f32(added_mass),
            base_com_shift=f32(com_shift),
        )
        # priv-latent pieces (legged_robot.py:291-298)
        self.mass_params = f32(np.concatenate([added_mass[:, None], com_shift], -1))  # (N,4)

        self.kp = jnp.full(12, cfg.control.stiffness, jnp.float32)
        self.kd = jnp.full(12, cfg.control.damping, jnp.float32)

        # ---- measurement points (17 x 11 grid in base frame) ----
        t = cfg.terrain
        gx, gy = np.meshgrid(t.measured_points_x, t.measured_points_y, indexing="ij")
        self.height_points = f32(np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], -1))
        self.n_height_points = gx.size
        self.center_height_idx = self.n_height_points // 2 + 1  # legged_robot.py:264

        # ---- reward table ----
        scales = dataclasses.asdict(cfg.rewards.scales)
        self.reward_names = [k for k, v in scales.items() if v != 0 and k != "termination"]
        self.reward_scales = jnp.asarray(
            [scales[k] * self.dt for k in self.reward_names], jnp.float32)
        self.n_rew = len(self.reward_names)

        # ---- noise vector (reference _get_noise_scale_vec :724-742) ----
        ns, osc = cfg.noise.scales, cfg.normalization.obs_scales
        lvl = cfg.noise.noise_level
        nv = np.zeros(cfg.env.num_actor_obs, np.float32)
        nv[0:2] = ns.roll_pitch * lvl
        nv[2:5] = ns.ang_vel * lvl * osc.ang_vel
        nv[5:17] = ns.dof_pos * lvl * osc.dof_pos
        nv[17:29] = ns.dof_vel * lvl * osc.dof_vel
        nv[58:61] = ns.lin_vel * lvl * osc.lin_vel
        self.noise_vec = f32(nv)

        # command range tables (per mode)
        cr = cfg.commands.ranges
        self.cmd_ranges = {
            "lin_vel_x": f32(cr.lin_vel_x),
            "lin_vel_y": f32(cr.lin_vel_y),
            "ang_vel_yaw": f32(cr.ang_vel_yaw),
        }
        self.resample_steps = int(cfg.commands.resampling_time / self.dt)
        self.push_interval = int(np.ceil(cfg.domain_rand.push_interval_s / self.dt))
        self.max_episode_length = cfg.max_episode_length

    # ==================================================================
    # initialization
    # ==================================================================

    def init_state(self, key, grid=None) -> LocoState:
        N = self.num_envs
        C = self.dim_c
        H = self.cfg.env.history_len
        z12 = jnp.zeros((N, 12), jnp.float32)
        s = LocoState(
            sim=eng.EnvState(
                base_pos=jnp.zeros((N, 3)),
                base_quat=jnp.zeros((N, 4)).at[:, 3].set(1.0),
                dof_pos=jnp.tile(self.mc.default_dof_pos, (N, 1)),
                u=jnp.zeros((N, 18)),
            ),
            episode_length=jnp.zeros(N, jnp.int32),
            commands=jnp.zeros((N, 5)),
            latent_eps=jnp.zeros((N, 1)),
            latent_c=jnp.zeros((N, C)).at[:, 0].set(1.0),
            prior_parameters=jnp.full((C,), 1.0 / C, jnp.float32),
            actions=z12,
            last_actions=z12,
            action_history=jnp.zeros((N, self.cfg.domain_rand.action_buf_len, 12)),
            last_dof_vel=z12,
            torques_org=z12,
            last_torques_org=z12,
            obs_history=jnp.zeros((N, H, self.cfg.env.num_prop)),
            last_contacts=jnp.zeros((N, 4), bool),
            contact_filt=jnp.zeros((N, 4), bool),
            feet_air_time=jnp.zeros((N, 4)),
            episode_sums=jnp.zeros((N, self.n_rew)),
            reset_buf=jnp.zeros(N, bool),
            time_out_buf=jnp.zeros(N, bool),
            global_counter=jnp.zeros((), jnp.int32),
            key=key,
            obs_buf=jnp.zeros((N, self.cfg.env.num_actor_obs)),
            disc_obs=jnp.zeros((N, self.cfg.env.num_obs_disc)),
        )
        # reset everything
        key, sub = jax.random.split(key)
        s = self._reset_where(s._replace(key=key), jnp.ones(N, bool), sub)
        # fill caches with a zero-action step (reference reset(), base_task)
        s, _ = self.step(s, jnp.zeros((N, 12)), grid=grid)
        return s

    # ==================================================================
    # step
    # ==================================================================

    def step(self, state: LocoState, actions: jnp.ndarray,
             grid=None) -> Tuple[LocoState, StepOutput]:
        """`grid`: optional world override carrying the jit-argument band
        stacks (learn/jitwrap.py); defaults to the env's own grid.  Only the
        band consumers (engine.step_batch) need it — reset/obs height
        lookups read the plain height arrays, which are fine as closure
        constants."""
        cfg = self.cfg
        N = self.num_envs
        key = state.key
        keys = jax.random.split(key, 8)
        key = keys[0]

        # --- action pipeline (legged_robot.py:84-98) ---
        action_history = jnp.concatenate(
            [state.action_history[:, 1:], actions[:, None, :]], axis=1)
        if cfg.domain_rand.action_delay and len(cfg.domain_rand.action_curr_step) > 1:
            delay = jnp.where(
                state.global_counter >= cfg.domain_rand.delay_update_global_steps,
                cfg.domain_rand.action_curr_step[1],
                cfg.domain_rand.action_curr_step[0],
            )
            idx = action_history.shape[1] - 1 - delay
            used = jax.lax.dynamic_index_in_dim(
                jnp.moveaxis(action_history, 1, 0), idx, axis=0, keepdims=False)
        else:
            used = actions
        clip_a = cfg.normalization.clip_actions / cfg.control.action_scale
        acts = jnp.clip(used, -clip_a, clip_a)

        scaled = acts * cfg.control.action_scale
        scaled = scaled.at[:, self.hip_dofs].multiply(cfg.control.hip_scale_reduction)
        target = scaled + self.mc.default_dof_pos

        control = eng.Control(target=target, kp=jnp.tile(self.kp, (N, 1)), kd=jnp.tile(self.kd, (N, 1)))

        # --- physics (decimated substeps; SoA/vmap/pallas per engine cfg) ---
        sim, (tau, tau_org), body_forces, _, terrain_patch = eng.step_batch(
            self.mc, self.engine_cfg, self.grid if grid is None else grid,
            state.sim, control, self.params)

        episode_length = state.episode_length + 1
        global_counter = state.global_counter + 1

        # --- base-frame quantities (legged_robot.py:137-141) ---
        bq = sim.base_quat
        base_lin_vel = qm.quat_rotate_inverse(bq, sim.u[:, :3])
        base_ang_vel = qm.quat_rotate_inverse(bq, sim.u[:, 3:6])
        roll, pitch, yaw = qm.euler_from_quat(bq)

        feet_forces = jnp.linalg.norm(body_forces[:, self.feet_idx], axis=-1)
        contact = feet_forces > 2.0
        contact_filt = jnp.logical_or(contact, state.last_contacts)

        # --- resample latents/commands every resampling_time (:449-460) ---
        resample = (episode_length % self.resample_steps) == 0
        latent_eps, latent_c, commands = self._resample_where(
            state, resample, keys[1])

        # --- push robots (:682-687): overrides xy base velocity of ALL envs ---
        if cfg.domain_rand.push_robots:
            push_now = (global_counter % self.push_interval) == 0
            push_vel = jax.random.uniform(
                keys[2], (N, 2), minval=-cfg.domain_rand.max_push_vel_xy,
                maxval=cfg.domain_rand.max_push_vel_xy)
            new_u = sim.u.at[:, 0:2].set(jnp.where(push_now, push_vel, sim.u[:, 0:2]))
            sim = sim._replace(u=new_u)
            base_lin_vel = qm.quat_rotate_inverse(bq, sim.u[:, :3])

        # --- termination (:168-176) ---
        term_force = jnp.linalg.norm(body_forces[:, self.termination_idx], axis=-1)
        reset_buf = jnp.any(term_force > 1.0, axis=1)
        time_out = episode_length > self.max_episode_length
        time_out = jnp.logical_or(time_out, sim.base_pos[:, 2] < -6.0)
        reset_buf = jnp.logical_or(reset_buf, time_out)

        # --- root height over terrain (pre-reset, used by rewards): only
        # the center scandot is ever consumed by the BBC ---
        root_h = self._center_root_height(sim.base_pos, bq)

        # --- rewards (:242-259 + term library :1231-1374) ---
        new_state_partial = dict(
            base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
            commands=commands, torques_org=tau_org,
            last_torques_org=state.last_torques_org,
            dof_vel=sim.u[:, 6:], last_dof_vel=state.last_dof_vel,
            dof_pos=sim.dof_pos, actions=acts, last_actions=state.last_actions,
            body_forces=body_forces, root_h=root_h,
        )
        rew, terms = self._compute_reward(new_state_partial)
        episode_sums = state.episode_sums + terms

        # --- terminal disc obs: disc features of the PRE-reset (terminal)
        # physics state (on_policy_runner.py:166-181) ---
        terminal_disc_obs = compute_disc_features(
            self.mc, self.feet_idx, cfg.normalization.obs_scales,
            sim, contact_filt, root_h[:, None])

        # --- masked reset (:178-240) ---
        mid = LocoState(
            sim=sim, episode_length=episode_length, commands=commands,
            latent_eps=latent_eps, latent_c=latent_c,
            prior_parameters=state.prior_parameters,
            actions=acts, last_actions=state.last_actions,
            action_history=action_history, last_dof_vel=state.last_dof_vel,
            torques_org=tau_org, last_torques_org=state.last_torques_org,
            obs_history=state.obs_history, last_contacts=contact,
            contact_filt=contact_filt, feet_air_time=state.feet_air_time,
            episode_sums=episode_sums, reset_buf=reset_buf,
            time_out_buf=time_out, global_counter=global_counter, key=key,
            obs_buf=state.obs_buf, disc_obs=state.disc_obs,
        )
        out_episode_sums = episode_sums
        mid = self._reset_where(mid, reset_buf, keys[3])

        # --- observations (post-reset state, :261-331) ---
        obs, priv_obs, disc_obs, obs_history = self._compute_observations(mid, keys[4])

        new_state = mid._replace(
            obs_buf=obs,
            disc_obs=disc_obs,
            obs_history=obs_history,
            last_actions=mid.actions,
            last_dof_vel=mid.sim.u[:, 6:],
            last_torques_org=mid.torques_org,
        )
        out = StepOutput(
            obs=obs, privileged_obs=priv_obs, rew=rew, reset=reset_buf,
            time_out=time_out, disc_obs=disc_obs,
            terminal_disc_obs=terminal_disc_obs,
            episode_sums=out_episode_sums, reward_terms=terms,
        )
        return new_state, out

    # ==================================================================
    # pieces
    # ==================================================================

    def _center_root_height(self, base_pos, base_quat):
        """Root height over the terrain at the center measurement point —
        the ONLY scandot the BBC consumes (root_h obs + jump/loco-height
        rewards, legged_robot.py:264,1312-1335).  Measuring just this point
        instead of the full 17x11 grid saves ~5.7 ms/step at 4096 envs
        (tools/bench_env_ablate.py); identical values by construction."""
        if not self.cfg.terrain.measure_heights:
            return base_pos[:, 2]
        pt = qm.quat_apply_yaw(
            base_quat, jnp.broadcast_to(
                self.height_points[self.center_height_idx],
                (base_pos.shape[0], 3))) + base_pos
        return base_pos[:, 2] - hf.sample_height_min3(
            self.grid, pt[:, 0], pt[:, 1])

    def _resample_where(self, state: LocoState, mask, key):
        """Draw new eps / c / commands for all envs, select by mask."""
        k_eps, k_c, k_cmd = jax.random.split(key, 3)
        N = self.num_envs
        eps_new = jax.random.uniform(k_eps, (N, 1)) * 2.0 - 1.0
        if self.num_mocap == 1:
            c_new = jax.nn.one_hot(
                jnp.full((N,), self.single_c_idx, jnp.int32), self.dim_c)
        else:
            prior = jax.nn.softmax(state.prior_parameters / 0.25)
            cat = jax.random.categorical(k_c, jnp.log(prior)[None].repeat(N, 0), axis=-1)
            c_new = jax.nn.one_hot(cat, self.dim_c)
        cmd_new = self._sample_commands(k_cmd, c_new)
        m1 = mask[:, None]
        return (
            jnp.where(m1, eps_new, state.latent_eps),
            jnp.where(m1, c_new, state.latent_c),
            jnp.where(m1, cmd_new, state.commands),
        )

    def _sample_commands(self, key, latent_c):
        """Per-mode command ranges (legged_robot.py:473-538)."""
        cfg = self.cfg.commands
        N = self.num_envs
        c_idx = jnp.argmax(latent_c, axis=-1)
        ks = jax.random.split(key, 5)
        u = lambda k: jax.random.uniform(k, (N,))
        rx = self.cmd_ranges["lin_vel_x"][c_idx]
        ry = self.cmd_ranges["lin_vel_y"][c_idx]
        rw = self.cmd_ranges["ang_vel_yaw"][c_idx]
        vx = rx[:, 0] + (rx[:, 1] - rx[:, 0]) * u(ks[0])
        vy = ry[:, 0] + (ry[:, 1] - ry[:, 0]) * u(ks[1])
        wz = rw[:, 0] + (rw[:, 1] - rw[:, 0]) * u(ks[2])
        if self.num_mocap == 1:
            jump_cmd = jnp.full((N,), self.cfg.env.mocap_category[0] == "jump")
        else:
            jump_cmd = c_idx == (self.dim_c - 1)
        jh = cfg.ranges.jump_height
        lh = cfg.ranges.locomotion_height
        jump_h = (jh[0] + (jh[1] - jh[0]) * u(ks[3])) * jump_cmd
        loco_h = (lh[0] + (lh[1] - lh[0]) * u(ks[4])) * (~jump_cmd)
        vx = vx * (jnp.abs(vx) > cfg.lin_vel_x_clip)
        vy = vy * (jnp.abs(vy) > cfg.lin_vel_y_clip)
        wz = wz * (jnp.abs(wz) > cfg.ang_vel_yaw_clip)
        return jnp.stack([vx, vy, wz, jump_h, loco_h], axis=-1)

    def _reset_where(self, state: LocoState, mask, key) -> LocoState:
        """Masked replacement for reset_idx (legged_robot.py:178-240)."""
        cfg = self.cfg
        N = self.num_envs
        ks = jax.random.split(key, 6)
        # fresh latents + commands for reset envs
        latent_eps, latent_c, commands = self._resample_where(state, mask, ks[0])

        # state init
        if cfg.env.mocap_state_init:
            c_idx = jnp.argmax(latent_c, axis=-1)
            frames = self.motion.sample_frames(ks[1], c_idx, self.dt)
            dof_pos = frames[:, mocap_mod.JOINT_POS]
            dof_vel = frames[:, mocap_mod.JOINT_VEL]
            base_xy = frames[:, mocap_mod.ROOT_POS][:, :2] + self.env_origins[:, :2]
            # mocap z is height above flat ground; lift by the terrain height
            # at the actual spawn xy (the reference's env-origin-z offset
            # mismatches rough cells away from center and spawns robots
            # inside the heightfield)
            h = hf.sample_height(self.grid, base_xy[:, 0], base_xy[:, 1])
            base_pos = jnp.concatenate(
                [base_xy, (frames[:, 2] + h)[:, None]], axis=-1)
            base_quat = frames[:, mocap_mod.ROOT_ROT]
            lin = qm.quat_rotate(base_quat, frames[:, mocap_mod.LIN_VEL])
            ang = qm.quat_rotate(base_quat, frames[:, mocap_mod.ANG_VEL])
        else:
            # default reset (:586-632): dofs scaled 0.5-1.5x, random root vel
            dof_pos = self.mc.default_dof_pos * jax.random.uniform(
                ks[1], (N, 12), minval=0.5, maxval=1.5)
            dof_vel = jnp.zeros((N, 12))
            base_pos = jnp.asarray(cfg.init_state.pos) + self.env_origins
            base_quat = jnp.tile(jnp.asarray(cfg.init_state.rot), (N, 1))
            lin_ang = jax.random.uniform(ks[2], (N, 6), minval=-0.5, maxval=0.5)
            lin, ang = lin_ang[:, :3], lin_ang[:, 3:]

        # recovery init (legged_robot.py:208-211, 636-661): with prob p, the
        # whole reset batch spawns in a randomized fallen pose (uniform
        # orientation, dofs x U(0.5, 2), dof vel +-1) so the policy learns
        # to get up.  One draw per reset step, matching the reference's
        # single np.random draw per reset_idx call.  Dead by config in the
        # go2 task (recovery_init_prob = 0.0, go2_locomotion_config.py:20).
        if cfg.env.recovery_init_prob > 0.0:
            kr = jax.random.split(ks[4], 5)
            use_rec = jax.random.uniform(kr[0], ()) <= cfg.env.recovery_init_prob
            eul = jax.random.uniform(kr[1], (N, 3), minval=-3.14, maxval=3.14)
            quat_rec = qm.quat_from_euler_xyz(eul[:, 0], eul[:, 1], eul[:, 2])
            dof_rec = self.mc.default_dof_pos * jax.random.uniform(
                kr[2], (N, 12), minval=0.5, maxval=2.0)
            dofv_rec = jax.random.uniform(kr[3], (N, 12), minval=-1.0, maxval=1.0)
            pos_rec = jnp.asarray(cfg.init_state.pos) + self.env_origins
            la_rec = jax.random.uniform(kr[4], (N, 6), minval=-0.5, maxval=0.5)
            base_pos = jnp.where(use_rec, pos_rec, base_pos)
            base_quat = jnp.where(use_rec, quat_rec, base_quat)
            dof_pos = jnp.where(use_rec, dof_rec, dof_pos)
            dof_vel = jnp.where(use_rec, dofv_rec, dof_vel)
            lin = jnp.where(use_rec, la_rec[:, :3], lin)
            ang = jnp.where(use_rec, la_rec[:, 3:], ang)

        u_new = jnp.concatenate([lin, ang, dof_vel], axis=-1)
        m1 = mask[:, None]
        sim = eng.EnvState(
            base_pos=jnp.where(m1, base_pos, state.sim.base_pos),
            base_quat=jnp.where(m1, base_quat, state.sim.base_quat),
            dof_pos=jnp.where(m1, dof_pos, state.sim.dof_pos),
            u=jnp.where(m1, u_new, state.sim.u),
        )
        zero = lambda x: jnp.where(
            mask.reshape((N,) + (1,) * (x.ndim - 1)), jnp.zeros_like(x), x)
        return state._replace(
            sim=sim,
            commands=commands,
            latent_eps=latent_eps,
            latent_c=latent_c,
            episode_length=jnp.where(mask, 0, state.episode_length),
            actions=zero(state.actions),
            last_actions=zero(state.last_actions),
            action_history=zero(state.action_history),
            last_dof_vel=zero(state.last_dof_vel),
            torques_org=zero(state.torques_org),
            last_torques_org=zero(state.last_torques_org),
            obs_history=zero(state.obs_history),
            feet_air_time=zero(state.feet_air_time),
            episode_sums=zero(state.episode_sums),
            key=ks[5],
        )

    # ------------------------------------------------------------------

    def _compute_observations(self, state: LocoState, key):
        cfg = self.cfg
        osc = cfg.normalization.obs_scales
        sim = state.sim
        bq = sim.base_quat
        base_lin_vel = qm.quat_rotate_inverse(bq, sim.u[:, :3])
        base_ang_vel = qm.quat_rotate_inverse(bq, sim.u[:, 3:6])
        roll, pitch, _ = qm.euler_from_quat(bq)
        imu = jnp.stack([roll, pitch], -1)

        # root height over terrain at the (possibly post-reset) base pose;
        # single-point sample — the full scandot grid is never consumed
        root_h = self._center_root_height(sim.base_pos, bq)[:, None]

        dof_err = (sim.dof_pos - self.mc.default_dof_pos) * osc.dof_pos
        dof_vel = sim.u[:, 6:] * osc.dof_vel
        cf = state.contact_filt.astype(jnp.float32)

        disc_obs = compute_disc_features(
            self.mc, self.feet_idx, osc, sim, state.contact_filt, root_h)

        # prop's key-pos block is zeroed in the reference (legged_robot.py:284)
        prop = jnp.concatenate(
            [imu, base_ang_vel * osc.ang_vel, dof_err, dof_vel,
             state.action_history[:, -1], cf - 0.5,
             jnp.zeros((self.num_envs, 12), jnp.float32)], axis=-1)

        root_h_obs = root_h if cfg.env.root_height_obs else jnp.zeros_like(root_h)
        priv_explicit = jnp.concatenate([root_h_obs, base_lin_vel * osc.lin_vel], -1)
        priv_latent = jnp.concatenate(
            [self.mass_params, self.params.friction[:, None],
             self.params.kp_scale - 1.0, self.params.kd_scale - 1.0], axis=-1)

        # history ring: seeded with the current prop obs on fresh episodes
        obs_history = jnp.where(
            (state.episode_length <= 1)[:, None, None],
            jnp.repeat(prop[:, None, :], cfg.env.history_len, axis=1),
            jnp.concatenate([state.obs_history[:, 1:], prop[:, None, :]], axis=1),
        )

        priv_obs = jnp.concatenate(
            [prop, priv_explicit, priv_latent,
             obs_history.reshape(self.num_envs, -1),
             state.commands, state.latent_eps, state.latent_c], axis=-1)

        if cfg.noise.add_noise:
            noise = (jax.random.uniform(key, priv_obs.shape) * 2.0 - 1.0) * self.noise_vec
            priv_obs = priv_obs + noise

        clip = cfg.normalization.clip_observations
        priv_obs = jnp.clip(priv_obs, -clip, clip)
        obs = priv_obs
        obs_history = jnp.clip(obs_history, -clip, clip)
        return obs, priv_obs, disc_obs, obs_history

    # ------------------------------------------------------------------

    def _compute_reward(self, q):
        """Active reward terms for go2_locomotion (scales pre-multiplied by
        dt at build; zero-scale terms pruned, legged_robot.py:922-946)."""
        cfg = self.cfg.rewards
        terms = {}
        cmd = q["commands"]
        terms["tracking_lin_vel"] = jnp.exp(
            -jnp.sum(jnp.square(cmd[:, :2] - q["base_lin_vel"][:, :2]), -1) / cfg.tracking_sigma)
        terms["tracking_ang_vel"] = jnp.exp(
            -jnp.square(cmd[:, 2] - q["base_ang_vel"][:, 2]) / cfg.tracking_sigma)
        # jump bonus (:1312-1322)
        jump_err = jnp.abs(cmd[:, 3] - q["root_h"])
        jump_sig = cmd[:, 3] >= self.cfg.commands.ranges.jump_height[0]
        terms["jump_up_height"] = jnp.where(
            (jump_err < 0.05) & jump_sig, cfg.jump_goal, 0.0)
        # locomotion height tracking (:1324-1335)
        loco_err = jnp.abs(cmd[:, 4] - q["root_h"])
        loco_rwd = jnp.exp(-10.0 * jnp.square(loco_err) / cfg.tracking_sigma)
        jump_sig2 = cmd[:, 3] > self.cfg.commands.ranges.jump_height[0]
        terms["locomotion_height"] = jnp.where(~jump_sig2, loco_rwd, 0.0)
        terms["torques"] = jnp.sum(jnp.square(q["torques_org"]), -1)
        terms["delta_torques"] = jnp.sum(
            jnp.square(q["torques_org"] - q["last_torques_org"]), -1)
        terms["dof_acc"] = jnp.sum(
            jnp.square((q["last_dof_vel"] - q["dof_vel"]) / self.dt), -1)
        pen_force = jnp.linalg.norm(q["body_forces"][:, self.penalized_idx], axis=-1)
        terms["collision"] = jnp.sum((pen_force > 0.1).astype(jnp.float32), -1)
        terms["action_rate"] = jnp.sum(jnp.square(q["last_actions"] - q["actions"]), -1)
        out_low = -jnp.minimum(q["dof_pos"] - self.soft_dof_lower, 0.0)
        out_high = jnp.maximum(q["dof_pos"] - self.soft_dof_upper, 0.0)
        terms["dof_pos_limits"] = jnp.sum(out_low + out_high, -1)
        terms["dof_vel_limits"] = jnp.sum(
            jnp.clip(jnp.abs(q["dof_vel"]) - jnp.asarray(self.model.dof_velocity_limit)
                     * cfg.soft_dof_vel_limit, 0.0, 1.0), -1)
        terms["hip_pos"] = jnp.sum(jnp.square(
            q["dof_pos"][:, self.hip_dofs] - self.mc.default_dof_pos[self.hip_dofs]), -1)
        terms["dof_error"] = jnp.sum(
            jnp.square(q["dof_pos"] - self.mc.default_dof_pos), -1)
        terms["torque_limits"] = jnp.sum(jnp.maximum(
            jnp.abs(q["torques_org"]) - jnp.asarray(self.model.dof_effort_limit)
            * cfg.soft_torque_limit, 0.0), -1)

        stacked = jnp.stack([terms[n] for n in self.reward_names], axis=-1)
        scaled = stacked * self.reward_scales
        total = jnp.sum(scaled, axis=-1)
        if cfg.only_positive_rewards:
            total = jnp.maximum(total, 0.0)
        return total, scaled
