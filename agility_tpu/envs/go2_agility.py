"""Go2 agility-course environment (the TSC task) as pure batched JAX.

Re-design of tsc/legged_gym/envs/base/legged_robot.py (1947 lines of torch +
IsaacGym): the hierarchical MDP where a high-level policy chooses a behavior
mode + command vector every control step (`set_commands`, reference :699-760)
and a frozen BBC policy turns those commands into joint actions.  The course
is a per-env obstacle heightfield with goal waypoints, movable bar/tire
heights (heightfield layers + per-env weights), goal tracking machinery, and
parkour rewards (:1777-1925).

Observation layout (tsc config :14-31):
  obs (800)     = [prop 57 | delta_yaws 2 | obstacle one-hot 6 | scan 132 |
                   explicit 4 | priv latent 29 | prop history 10x57]
  obs_bbc (671) = [prop 57 | explicit 4 | priv latent 29 | history 570 |
                   commands 5 | eps 1 | c 5]   (fed to the frozen BBC)
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from agility_tpu.core import quat as qm
from agility_tpu.core.urdf import build_go2_model
from agility_tpu.envs import go2_locomotion as loco_mod
from agility_tpu.envs.tsc_config import Go2AgilityCfg
from agility_tpu.physics import engine as eng
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics import windows
from agility_tpu.physics.constants import ModelConsts
from agility_tpu.terrain import obstacle as obst_gen


class AgilityState(NamedTuple):
    sim: eng.EnvState
    episode_length: jnp.ndarray      # (N,)
    global_counter: jnp.ndarray      # ()
    key: jnp.ndarray
    # BBC command interface
    commands: jnp.ndarray            # (N, 5)
    latent_eps: jnp.ndarray          # (N, 1)
    latent_c: jnp.ndarray            # (N, 5)
    # low-level action plumbing
    actions_bbc: jnp.ndarray         # (N, 12)
    last_actions_bbc: jnp.ndarray
    action_history: jnp.ndarray      # (N, buf, 12)
    action_hl_history: jnp.ndarray   # (N, 3, 1 + 18)
    last_dof_vel: jnp.ndarray
    torques_org: jnp.ndarray
    last_torques_org: jnp.ndarray
    # observation machinery
    obs_history: jnp.ndarray         # (N, 10, 57)
    last_contacts: jnp.ndarray       # (N, 4)
    contact_filt: jnp.ndarray
    # goals
    cur_goal_idx: jnp.ndarray        # (N,)
    reach_goal_timer: jnp.ndarray    # (N,)
    cur_goals: jnp.ndarray           # (N, 3)
    next_goals: jnp.ndarray          # (N, 3)
    target_yaw: jnp.ndarray          # (N,)
    next_target_yaw: jnp.ndarray
    delta_yaw: jnp.ndarray
    delta_next_yaw: jnp.ndarray
    leave_goal: jnp.ndarray          # (N,) bool
    reached_goal: jnp.ndarray        # (N,) bool
    # curriculum: PER-ENV movable obstacle heights, resampled at reset within
    # ranges widened by curr_count (reference resamples per-env heights on
    # success, tsc legged_robot.py:917-957 — a global bias would collapse
    # the height distribution)
    bar_h: jnp.ndarray               # (N,) bar beam height
    tire_h: jnp.ndarray              # (N,) tire aperture height
    # 1-DOF passive seesaw plank per env (reference: revolute DOF with zero
    # stiffness + viscous damping, tsc legged_robot.py:1414-1427); effective
    # plank height = pivot + lever(x, y) * theta at heightfield sample time
    seesaw_theta: jnp.ndarray        # (N,) plank angle (tan approx)
    seesaw_theta_d: jnp.ndarray      # (N,) plank angular velocity
    curr_count: jnp.ndarray          # () int — widens the sampling ranges
    success_rate: jnp.ndarray        # () EMA of course completion
    # from-station-0 scoreboard (r5): under randomize_start the plain EMA
    # counts late-station spawns finishing the last obstacle as "success";
    # these track course TRAVERSAL — only episodes spawned at goal 0 count,
    # and goal_progress measures goals gained per episode regardless of spawn
    spawn_goal_idx: jnp.ndarray      # (N,) cur_goal_idx assigned at reset
    success_rate_s0: jnp.ndarray     # () EMA over episodes spawned at start
    goal_progress: jnp.ndarray       # () EMA of (end goal - spawn goal)
    # bookkeeping
    episode_sums: jnp.ndarray
    reset_buf: jnp.ndarray
    time_out_buf: jnp.ndarray
    reach_goal_cutoff: jnp.ndarray   # (N,) course completed
    obs_buf: jnp.ndarray
    obs_bbc_buf: jnp.ndarray
    disc_obs: jnp.ndarray


class TscStepOutput(NamedTuple):
    obs: jnp.ndarray
    obs_bbc: jnp.ndarray
    rew: jnp.ndarray
    reset: jnp.ndarray
    time_out: jnp.ndarray
    reach_goal_cutoff: jnp.ndarray
    disc_obs: jnp.ndarray
    terminal_disc_obs: jnp.ndarray
    episode_sums: jnp.ndarray
    reward_terms: jnp.ndarray


class Go2AgilityEnv:
    def __init__(self, cfg: Go2AgilityCfg):
        self.cfg = cfg
        self.model = build_go2_model()
        self.mc = ModelConsts.from_model(self.model)
        self.dt = cfg.dt
        self.num_envs = cfg.env.num_envs
        self.dim_c = len(cfg.env.mocap_category_all)
        # discrete-head index -> global mode index (reference mocap_indices,
        # tsc/.../legged_robot.py:101)
        self.mocap_indices = np.asarray(
            [list(cfg.env.mocap_category_all).index(c) for c in cfg.env.mocap_category],
            np.int32)

        self.engine_cfg = eng.EngineConfig(
            dt=cfg.sim.dt, decimation=cfg.control.decimation,
            solver=cfg.sim.solver, jacobi_iters=cfg.sim.jacobi_iters,
            jacobi_relax=cfg.sim.jacobi_relax,
            warm_start=cfg.sim.warm_start,
            patch_size=32)   # 1.6 m span at the 0.05 m course scale

        # ---- obstacle course world ----
        world = obst_gen.generate(cfg.obstacle, seed=cfg.seed)
        self.world = world
        self.grid = hf.from_numpy(world.height, world.hscale, world.origin,
                                  layer_id=world.layer_id, lever=world.lever,
                                  ceiling=world.ceil,
                                  ceiling_layer=world.ceil_layer)
        # Scan-window sizing happens after the scandot grid is built (the
        # static per-env measurement noise changes the extent); see the
        # attach_bands call below the height-points block.
        self.x_edge = jnp.asarray(world.x_edge)
        rng = np.random.default_rng(cfg.seed)
        N = self.num_envs
        self.course_id = np.arange(N) % cfg.obstacle.courses
        self.env_goals = jnp.asarray(world.goals[self.course_id], jnp.float32)       # (N, G, 3)
        self.goal_layer = jnp.asarray(world.goal_layer[self.course_id])              # (N, G)
        self.obst_types = jnp.asarray(world.obst_types[self.course_id])              # (N, 6)
        self.obst_yaws = jnp.asarray(world.obst_yaws[self.course_id], jnp.float32)   # (N, 6)
        self.robot_org = jnp.asarray(world.robot_org[self.course_id], jnp.float32)   # (N, 3)
        self.n_goals_total = world.n_goals_total
        self.num_goals = cfg.obstacle.num_goals
        self.last_goal_repeat = cfg.obstacle.last_goal_repeat

        # per-env movable obstacle heights
        bar_h, tire_h = obst_gen.sample_obstacle_heights(cfg.obstacle, rng, N)
        if cfg.obstacle.curriculum:
            bar_h = rng.uniform(*cfg.obstacle.bar_jump_init_range, N)
            tire_h = rng.uniform(*cfg.obstacle.tire_jump_init_range, N)
        self.bar_h = jnp.asarray(bar_h, jnp.float32)
        self.tire_h = jnp.asarray(tire_h, jnp.float32)
        # per-env plank joint damping U(1, 10) (tsc legged_robot.py:1414)
        self.seesaw_damping = jnp.asarray(rng.uniform(1.0, 10.0, N), jnp.float32)
        self.seesaw_pose = jnp.asarray(
            world.seesaw_pose[self.course_id], jnp.float32)       # (N, 3)

        # ---- body tables (go2_agility_config.py: stricter termination) ----
        m = self.model
        self.feet_idx = np.asarray(m.match_bodies("foot"), np.int32)
        self.penalized_idx = np.asarray(
            m.match_bodies("base") + m.match_bodies("hip") + m.match_bodies("thigh")
            + m.match_bodies("calf"), np.int32)
        self.termination_idx = np.asarray(
            m.match_bodies("base") + m.match_bodies("hip") + m.match_bodies("thigh"),
            np.int32)
        self.hip_dofs = np.asarray([0, 3, 6, 9], np.int32)

        # ---- domain randomization ----
        dr = cfg.domain_rand
        if dr.randomize_friction:
            buckets = rng.uniform(*dr.friction_range, size=64)
            friction = buckets[rng.integers(0, 64, N)]
        else:
            friction = np.ones(N)
        added_mass = rng.uniform(*dr.added_mass_range, N) if dr.randomize_base_mass else np.zeros(N)
        com_shift = rng.uniform(*dr.added_com_range, (N, 3)) if dr.randomize_base_com else np.zeros((N, 3))
        if dr.randomize_motor:
            kp_scale = rng.uniform(*dr.motor_strength_range, (N, 12))
            kd_scale = rng.uniform(*dr.motor_strength_range, (N, 12))
        else:
            kp_scale = np.ones((N, 12))
            kd_scale = np.ones((N, 12))
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        self.base_params = eng.EnvParams(
            friction=f32(friction), kp_scale=f32(kp_scale), kd_scale=f32(kd_scale),
            added_base_mass=f32(added_mass), base_com_shift=f32(com_shift),
            hf_weights=jnp.concatenate(
                [jnp.stack([self.bar_h, self.tire_h], axis=-1),
                 jnp.full((N, 1), obst_gen.SEESAW_THETA_REST, jnp.float32)], -1))
        self.mass_params = f32(np.concatenate([added_mass[:, None], com_shift], -1))
        self.kp = jnp.full(12, cfg.control.stiffness, jnp.float32)
        self.kd = jnp.full(12, cfg.control.damping, jnp.float32)

        # scandot grid (obstacle cfg 12 x 11), per-env with optional static
        # horizontal measurement noise (sum of two uniform draws, reference
        # _init_height_points, tsc legged_robot.py:1674-1699)
        ob = cfg.obstacle
        gx, gy = np.meshgrid(ob.measured_points_x, ob.measured_points_y, indexing="ij")
        pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], -1)   # (P, 3)
        pts = np.tile(pts[None], (N, 1, 1))
        hn = ob.measure_horizontal_noise
        if hn > 0.0:
            pts[:, :, :2] += (rng.uniform(-hn, hn, (N, gx.size, 2))
                              + rng.uniform(-hn, hn, (N, gx.size, 2)))
        self.height_points = f32(pts)                                     # (N, P, 3)
        self.n_height_points = gx.size
        self.center_height_idx = self.n_height_points // 2 + 1

        # Scan window auto-sizing (PERF_NOTES r3 lever: gathered rows to
        # actual sample support).  Centering the window on the scan grid's
        # circumcenter instead of the base cuts the worst-case extent from
        # |farthest point| (~1.21 m -> 56-cell windows, 80 DMA rows bf16)
        # to the circumradius (~0.74 m -> 34 cells, 64 rows, and band
        # stride 16 instead of 8 -> half the band-stack HBM).  Margin: 0.5
        # cell center rounding + 1 cell for the min3 +x/+y tap + clip.
        cen = pts[:, :, :2].mean(axis=1)                                  # (N, 2)
        # worst case over yaw: a point at Euclidean distance r from the
        # center can project fully onto either window axis
        extent = (np.linalg.norm(pts[:, :, :2] - cen[:, None], axis=-1).max()
                  / ob.horizontal_scale)
        self.scan_center_local = f32(
            np.concatenate([cen, np.zeros((N, 1))], -1))                  # (N, 3)
        self.scan_size = max(
            self.engine_cfg.patch_size,
            2 * int(np.ceil(extent + 1.5)))
        self.grid = windows.attach_bands(
            self.grid, contact_size=self.engine_cfg.patch_size,
            scan_size=self.scan_size,
            contact_dtype=(jnp.bfloat16 if cfg.sim.contact_band_bf16
                           else jnp.float32))

        # reward table
        scales = dataclasses.asdict(cfg.rewards.scales)
        self.reward_names = [k for k, v in scales.items() if v != 0 and k != "termination"]
        self.reward_scales = jnp.asarray(
            [scales[k] * self.dt for k in self.reward_names], jnp.float32)
        self.termination_scale = scales.get("termination", 0.0) * self.dt
        self.n_rew = len(self.reward_names) + (1 if self.termination_scale else 0)

        self.cmd_ranges = {
            "lin_vel_x": f32(cfg.commands.ranges.lin_vel_x),
            "lin_vel_y": f32(cfg.commands.ranges.lin_vel_y),
            "ang_vel_yaw": f32(cfg.commands.ranges.ang_vel_yaw),
        }
        self.max_episode_length = cfg.max_episode_length

    # ------------------------------------------------------------------

    def _weights(self, state) -> jnp.ndarray:
        """(N, 3) heightfield weights: [bar height, tire height, plank tilt]
        — layer offsets for movable parts + the seesaw lever multiplier."""
        return jnp.stack(
            [state.bar_h, state.tire_h, state.seesaw_theta], axis=-1)

    def _params_with_bias(self, state) -> eng.EnvParams:
        return self.base_params._replace(hf_weights=self._weights(state))

    def _sample_heights_where(self, state, mask, key):
        """Per-env bar/tire height resampling at reset, within ranges widened
        by the curriculum count (tsc legged_robot.py:917-957)."""
        ob = self.cfg.obstacle
        N = self.num_envs
        kb, kt = jax.random.split(key)
        if ob.curriculum:
            lo_b, hi_b0 = ob.bar_jump_init_range
            lo_t, hi_t0 = ob.tire_jump_init_range
            widen = state.curr_count.astype(jnp.float32) * ob.curr_step
            hi_b = jnp.minimum(hi_b0 + widen, ob.bar_jump_max_range[1])
            hi_t = jnp.minimum(hi_t0 + widen, ob.tire_jump_max_range[1])
        else:
            lo_b, hi_b = ob.bar_jump_range
            lo_t, hi_t = ob.tire_jump_range
        bar_new = lo_b + (hi_b - lo_b) * jax.random.uniform(kb, (N,))
        tire_new = lo_t + (hi_t - lo_t) * jax.random.uniform(kt, (N,))
        return (jnp.where(mask, bar_new, state.bar_h),
                jnp.where(mask, tire_new, state.tire_h))

    def _goal_z(self, state, goals, layers):
        """Movable goal heights (bar/tire center goals follow joint height)."""
        bar = state.bar_h
        tire = state.tire_h
        add = jnp.where(layers == obst_gen.LAYER_BAR, bar[:, None],
                        jnp.where(layers == obst_gen.LAYER_TIRE, tire[:, None], 0.0))
        return goals.at[..., 2].add(add)

    def _gather_goals(self, state, idx):
        """(N,3) goal at per-env index (clamped)."""
        idx = jnp.clip(idx, 0, self.n_goals_total - 1)
        g = jnp.take_along_axis(self.env_goals, idx[:, None, None], axis=1)[:, 0]
        l = jnp.take_along_axis(self.goal_layer, idx[:, None], axis=1)
        return self._goal_z(state, g[:, None, :], l)[:, 0]

    # ==================================================================
    # initialization
    # ==================================================================

    def init_state(self, key, grid=None) -> AgilityState:
        N = self.num_envs
        z12 = jnp.zeros((N, 12))
        s = AgilityState(
            sim=eng.EnvState(
                base_pos=jnp.zeros((N, 3)),
                base_quat=jnp.zeros((N, 4)).at[:, 3].set(1.0),
                dof_pos=jnp.tile(self.mc.default_dof_pos, (N, 1)),
                u=jnp.zeros((N, 18))),
            episode_length=jnp.zeros(N, jnp.int32),
            global_counter=jnp.zeros((), jnp.int32),
            key=key,
            commands=jnp.zeros((N, 5)),
            latent_eps=jnp.zeros((N, 1)),
            latent_c=jnp.zeros((N, self.dim_c)).at[:, 2].set(1.0),
            actions_bbc=z12, last_actions_bbc=z12,
            action_history=jnp.zeros((N, self.cfg.domain_rand.action_buf_len, 12)),
            action_hl_history=jnp.zeros((N, 3, 1 + 18)),
            last_dof_vel=z12, torques_org=z12, last_torques_org=z12,
            obs_history=jnp.zeros((N, self.cfg.env.history_len, 57)),
            last_contacts=jnp.zeros((N, 4), bool),
            contact_filt=jnp.zeros((N, 4), bool),
            cur_goal_idx=jnp.zeros(N, jnp.int32),
            reach_goal_timer=jnp.zeros(N),
            cur_goals=jnp.zeros((N, 3)), next_goals=jnp.zeros((N, 3)),
            target_yaw=jnp.zeros(N), next_target_yaw=jnp.zeros(N),
            delta_yaw=jnp.zeros(N), delta_next_yaw=jnp.zeros(N),
            leave_goal=jnp.zeros(N, bool), reached_goal=jnp.zeros(N, bool),
            bar_h=self.bar_h, tire_h=self.tire_h,
            seesaw_theta=jnp.full(N, obst_gen.SEESAW_THETA_REST),
            seesaw_theta_d=jnp.zeros(N),
            curr_count=jnp.zeros((), jnp.int32), success_rate=jnp.zeros(()),
            spawn_goal_idx=jnp.zeros(N, jnp.int32),
            success_rate_s0=jnp.zeros(()), goal_progress=jnp.zeros(()),
            episode_sums=jnp.zeros((N, self.n_rew)),
            reset_buf=jnp.zeros(N, bool), time_out_buf=jnp.zeros(N, bool),
            reach_goal_cutoff=jnp.zeros(N, bool),
            obs_buf=jnp.zeros((N, self.cfg.env.num_obs)),
            obs_bbc_buf=jnp.zeros((N, self.cfg.env.num_obs_bbc)),
            disc_obs=jnp.zeros((N, self.cfg.env.num_obs_disc)),
        )
        key, sub = jax.random.split(key)
        s = self._reset_where(s._replace(key=key), jnp.ones(N, bool), sub)
        s = s._replace(cur_goals=self._gather_goals(s, s.cur_goal_idx),
                       next_goals=self._gather_goals(s, s.cur_goal_idx + 1))
        s, _ = self.step(s, jnp.zeros((N, 12)), grid=grid)
        return s

    # ==================================================================
    # the hierarchical command bridge (reference set_commands :699-760)
    # ==================================================================

    def set_commands(self, state: AgilityState, hl_actions: jnp.ndarray):
        """Translate HL hybrid actions (N, 1+18) into BBC commands/latents.
        Returns (state, next_commands (N, 11))."""
        cfg = self.cfg
        N = self.num_envs
        key, k_noise = jax.random.split(state.key)
        nc = cfg.env.num_actions_c
        d = hl_actions[:, 0].astype(jnp.int32)
        mapped = jnp.asarray(self.mocap_indices)[d]           # global mode idx
        # per-mode continuous slice
        col = d[:, None] * nc + jnp.arange(nc)[None, :] + 1
        acts_c = jnp.take_along_axis(hl_actions, col, axis=1)
        cmds = jnp.clip(acts_c, -1.0, 1.0)
        latent_c = jax.nn.one_hot(mapped, self.dim_c)
        latent_eps = cmds[:, -1:]
        u = (cmds + 1.0) / 2.0
        rx = self.cmd_ranges["lin_vel_x"][mapped]
        ry = self.cmd_ranges["lin_vel_y"][mapped]
        rw = self.cmd_ranges["ang_vel_yaw"][mapped]
        vx = rx[:, 0] + (rx[:, 1] - rx[:, 0]) * u[:, 0]
        vy = ry[:, 0] + (ry[:, 1] - ry[:, 0]) * u[:, 1]
        wz = rw[:, 0] + (rw[:, 1] - rw[:, 0]) * u[:, 2]
        jh = cfg.commands.ranges.jump_height
        lh = cfg.commands.ranges.locomotion_height
        jump = mapped == (self.dim_c - 1)
        jump_h = (jh[0] + (jh[1] - jh[0]) * u[:, 3]) * jump
        loco_h = (lh[0] + (lh[1] - lh[0]) * u[:, 4]) * (~jump)
        commands = jnp.stack([vx, vy, wz, jump_h, loco_h], axis=-1)
        if cfg.domain_rand.randomize_action:
            noise = jax.random.uniform(
                k_noise, commands.shape, minval=cfg.domain_rand.action_noise[0],
                maxval=cfg.domain_rand.action_noise[1])
            commands = commands * noise
        hl_hist = jnp.concatenate(
            [state.action_hl_history[:, 1:], hl_actions[:, None, :]], axis=1)
        state = state._replace(commands=commands, latent_c=latent_c,
                               latent_eps=latent_eps, key=key,
                               action_hl_history=hl_hist)
        next_commands = jnp.concatenate([commands, latent_eps, latent_c], axis=-1)
        return state, next_commands

    # ==================================================================
    # step (takes the BBC's joint-space actions)
    # ==================================================================

    def step(self, state: AgilityState, actions_bbc: jnp.ndarray, grid=None):
        """`grid`: optional world override carrying the jit-argument band
        stacks (learn/jitwrap.py); only the band consumers — the engine
        contact step and the scandot window measurement — use it."""
        cfg = self.cfg
        N = self.num_envs
        keys = jax.random.split(state.key, 4)
        key = keys[0]
        params = self._params_with_bias(state)

        action_history = jnp.concatenate(
            [state.action_history[:, 1:], actions_bbc[:, None, :]], axis=1)
        if cfg.domain_rand.action_delay:
            idx = action_history.shape[1] - 1 - cfg.domain_rand.action_delay_step
            used = action_history[:, idx]
        else:
            used = actions_bbc
        clip_a = cfg.clip_actions / cfg.control.action_scale
        acts = jnp.clip(used, -clip_a, clip_a)
        scaled = acts * cfg.control.action_scale
        scaled = scaled.at[:, self.hip_dofs].multiply(cfg.control.hip_scale_reduction)
        target = scaled + self.mc.default_dof_pos
        control = eng.Control(target=target, kp=jnp.tile(self.kp, (N, 1)),
                              kd=jnp.tile(self.kd, (N, 1)))

        sim, (tau, tau_org), body_forces, _, _ = eng.step_batch(
            self.mc, self.engine_cfg, self.grid if grid is None else grid,
            state.sim, control, params)

        # --- passive seesaw plank dynamics (tsc legged_robot.py:1414-1427):
        # feet normal forces on plank cells torque the per-env plank angle;
        # semi-implicit Euler at control rate with per-env viscous damping
        # and hard stops where the plank ends touch the ground ---
        from agility_tpu.physics import soa as soa_mod

        feet_pos = soa_mod.body_positions(self.mc, sim, self.feet_idx)   # (N, 4, 3)
        # analytic lever (obstacle.lever_arm): no full-grid gather per foot
        lever_arm = obst_gen.lever_arm(
            self.seesaw_pose[:, None, :], feet_pos[:, :, 0], feet_pos[:, :, 1])
        fz = body_forces[:, self.feet_idx, 2]                 # upward on robot
        plank_tau = -jnp.sum(lever_arm * fz, axis=1)          # reaction torque
        th_d = state.seesaw_theta_d + self.dt * (
            plank_tau - self.seesaw_damping * state.seesaw_theta_d
        ) / obst_gen.SEESAW_INERTIA
        th = state.seesaw_theta + self.dt * th_d
        th_c = jnp.clip(th, -obst_gen.SEESAW_THETA_MAX, obst_gen.SEESAW_THETA_MAX)
        seesaw_theta_d = jnp.where(th_c == th, th_d, 0.0)
        seesaw_theta = th_c

        episode_length = state.episode_length + 1
        global_counter = state.global_counter + 1
        bq = sim.base_quat
        base_lin_vel = qm.quat_rotate_inverse(bq, sim.u[:, :3])
        base_ang_vel = qm.quat_rotate_inverse(bq, sim.u[:, 3:6])
        roll, pitch, yaw = qm.euler_from_quat(bq)
        feet_forces = jnp.linalg.norm(body_forces[:, self.feet_idx], axis=-1)
        contact = feet_forces > 2.0
        contact_filt = jnp.logical_or(contact, state.last_contacts)

        # --- goal machinery (:204-224) using last step's gathered goals ---
        next_flag = state.reach_goal_timer > (cfg.env.reach_goal_delay / self.dt)
        cur_goal_idx = state.cur_goal_idx + next_flag.astype(jnp.int32)
        reach_goal_timer = jnp.where(next_flag, 0.0, state.reach_goal_timer)
        dist = jnp.linalg.norm(sim.base_pos[:, :2] - state.cur_goals[:, :2], axis=-1)
        reached = dist < cfg.env.next_goal_threshold
        leave = dist > cfg.env.leave_goal_threshold
        reach_goal_timer = reach_goal_timer + reached
        target_rel = state.cur_goals[:, :2] - sim.base_pos[:, :2]
        next_rel = state.next_goals[:, :2] - sim.base_pos[:, :2]
        target_yaw = jnp.arctan2(
            target_rel[:, 1] / (jnp.linalg.norm(target_rel, axis=-1) + 1e-5),
            target_rel[:, 0] / (jnp.linalg.norm(target_rel, axis=-1) + 1e-5))
        next_target_yaw = jnp.arctan2(
            next_rel[:, 1] / (jnp.linalg.norm(next_rel, axis=-1) + 1e-5),
            next_rel[:, 0] / (jnp.linalg.norm(next_rel, axis=-1) + 1e-5))

        # current obstacle type one-hot (post_physics :254-258)
        goal_clamped = jnp.clip(
            cur_goal_idx, 0, self.n_goals_total - self.last_goal_repeat - 1)
        obst_station = goal_clamped // self.num_goals
        cur_obst_type = jnp.take_along_axis(
            self.obst_types, obst_station[:, None], axis=1)[:, 0]

        # --- termination (:322-346) ---
        term_force = jnp.linalg.norm(body_forces[:, self.termination_idx], axis=-1)
        reset_buf = jnp.any(term_force > 1.0, axis=1)
        reach_goal_cutoff = cur_goal_idx >= (self.n_goals_total - self.last_goal_repeat)
        time_out = episode_length > self.max_episode_length
        time_out = jnp.logical_or(time_out, reach_goal_cutoff)
        reset_buf = (reset_buf | time_out | (jnp.abs(roll) > 1.5)
                     | (jnp.abs(pitch) > 1.5) | (sim.base_pos[:, 2] < -0.25) | leave)

        # --- rewards ---
        q = dict(
            sim=sim, base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
            yaw=yaw, target_yaw=target_yaw, target_rel=target_rel,
            cur_obst_type=cur_obst_type, reached=reached,
            body_forces=body_forces, contact_filt=contact_filt,
            hl_hist=state.action_hl_history, reset_buf=reset_buf,
            time_out=time_out)
        rew, terms = self._compute_reward(q)
        episode_sums = state.episode_sums + terms

        # --- terminal disc obs: disc features of the PRE-reset (terminal)
        # physics state (bbc on_policy_runner.py:166-181 semantics; the TSC
        # runner applies the same patch, tsc on_policy_runner.py:216-220).
        # Only the center scan point is needed for root height here — the
        # full scandot grid is computed post-reset in _compute_observations.
        w = self._weights(state)
        center_pt = qm.quat_apply_yaw(
            bq, self.height_points[:, self.center_height_idx]
        ) + sim.base_pos
        ch = jax.vmap(
            lambda p, wi: hf.sample_height_min3(self.grid, p[0], p[1], wi)
        )(center_pt, w)
        root_h = sim.base_pos[:, 2] - ch
        terminal_disc_obs = loco_mod.compute_disc_features(
            self.mc, self.feet_idx, cfg.obs_scales, sim, contact_filt,
            root_h[:, None])

        # success-rate EMA over ending episodes (runner :248-271 analogue)
        n_end = jnp.sum(reset_buf)
        n_succ = jnp.sum(reach_goal_cutoff & reset_buf)
        success_rate = jnp.where(
            n_end > 0,
            state.success_rate * 0.98 + 0.02 * (n_succ / jnp.maximum(n_end, 1)),
            state.success_rate)
        # from-station-0 traversal metrics (r5 scoreboard fix): spawn-luck
        # completions are excluded, and goal_progress counts goals actually
        # gained this episode
        end_s0 = reset_buf & (state.spawn_goal_idx == 0)
        n_end0 = jnp.sum(end_s0)
        n_succ0 = jnp.sum(reach_goal_cutoff & end_s0)
        success_rate_s0 = jnp.where(
            n_end0 > 0,
            state.success_rate_s0 * 0.98 + 0.02 * (n_succ0 / jnp.maximum(n_end0, 1)),
            state.success_rate_s0)
        prog = jnp.sum(jnp.where(
            reset_buf, (cur_goal_idx - state.spawn_goal_idx).astype(jnp.float32), 0.0))
        goal_progress = jnp.where(
            n_end > 0,
            state.goal_progress * 0.98 + 0.02 * (prog / jnp.maximum(n_end, 1)),
            state.goal_progress)

        # obstacle curriculum (:917-957): widen the per-env height sampling
        # ranges on sustained success; heights themselves are resampled
        # per env at reset (_sample_heights_where)
        curr_count = state.curr_count
        if cfg.obstacle.curriculum:
            ob = cfg.obstacle
            step_now = ((success_rate > ob.curr_threshold)
                        & (global_counter % (self.max_episode_length * 2) == 0))
            curr_count = curr_count + step_now.astype(jnp.int32)

        mid = state._replace(
            sim=sim, seesaw_theta=seesaw_theta, seesaw_theta_d=seesaw_theta_d,
            episode_length=episode_length, global_counter=global_counter,
            key=key, actions_bbc=acts, action_history=action_history,
            torques_org=tau_org, last_contacts=contact, contact_filt=contact_filt,
            cur_goal_idx=cur_goal_idx, reach_goal_timer=reach_goal_timer,
            target_yaw=target_yaw, next_target_yaw=next_target_yaw,
            leave_goal=leave, reached_goal=reached,
            curr_count=curr_count,
            success_rate=success_rate, success_rate_s0=success_rate_s0,
            goal_progress=goal_progress, episode_sums=episode_sums,
            reset_buf=reset_buf, time_out_buf=time_out,
            reach_goal_cutoff=reach_goal_cutoff)
        out_episode_sums = episode_sums
        mid = self._reset_where(mid, reset_buf, keys[1])

        # re-gather goals post-reset (:275-276)
        cur_goals = self._gather_goals(mid, mid.cur_goal_idx)
        next_goals = self._gather_goals(mid, mid.cur_goal_idx + 1)
        mid = mid._replace(cur_goals=cur_goals, next_goals=next_goals)

        obs, obs_bbc, disc_obs, obs_history, dyaw, dnyaw = self._compute_observations(mid, grid)
        new_state = mid._replace(
            obs_buf=obs, obs_bbc_buf=obs_bbc, disc_obs=disc_obs,
            obs_history=obs_history, delta_yaw=dyaw, delta_next_yaw=dnyaw,
            last_actions_bbc=mid.actions_bbc,
            last_dof_vel=mid.sim.u[:, 6:],
            last_torques_org=mid.torques_org)
        out = TscStepOutput(
            obs=obs, obs_bbc=obs_bbc, rew=rew, reset=reset_buf,
            time_out=time_out, reach_goal_cutoff=reach_goal_cutoff,
            disc_obs=disc_obs, terminal_disc_obs=terminal_disc_obs,
            episode_sums=out_episode_sums, reward_terms=terms)
        return new_state, out

    # ------------------------------------------------------------------

    def _reset_where(self, state: AgilityState, mask, key) -> AgilityState:
        cfg = self.cfg
        N = self.num_envs
        ks = jax.random.split(key, 8)
        # start pose: course robot_org + xy/yaw noise (tsc config :42-53)
        e = cfg.env
        dx = jax.random.uniform(ks[0], (N,), minval=-e.rand_x_range,
                                maxval=e.rand_x_range) * e.randomize_start_x
        dy = jax.random.uniform(ks[1], (N,), minval=-e.rand_y_range,
                                maxval=e.rand_y_range) * e.randomize_start_y
        dyaw = jax.random.uniform(ks[2], (N,), minval=-e.rand_yaw_range,
                                  maxval=e.rand_yaw_range) * e.randomize_start_yaw
        # course heading: start facing +y (the first station runs along +y)
        # course heading: start facing +y (the first station runs along +y)
        if e.randomize_start:
            # spawn at a random station's approach goal with the station's
            # heading (reference tsc legged_robot.py:367-375: cur_goal_idx
            # = obst_idx * num_goals, pos = that goal, ang = station yaw)
            n_obst = self.obst_types.shape[1]
            obst_idx = jax.random.randint(ks[7], (N,), 0, n_obst)
            goal_idx = obst_idx * cfg.obstacle.num_goals
            spawn_goal = jnp.take_along_axis(
                self.env_goals, goal_idx[:, None, None].repeat(3, axis=2),
                axis=1)[:, 0]                                     # (N, 3)
            yaw0 = jnp.take_along_axis(self.obst_yaws, obst_idx[:, None],
                                       axis=1)[:, 0] + dyaw
            base_pos = jnp.stack(
                [spawn_goal[:, 0] + dx, spawn_goal[:, 1] + dy,
                 jnp.full((N,), cfg.init_state.pos[2])], axis=-1)
        else:
            obst_idx = jnp.zeros((N,), jnp.int32)
            goal_idx = jnp.zeros((N,), jnp.int32)
            yaw0 = jnp.pi / 2 + dyaw
            base_pos = self.robot_org + jnp.stack(
                [dx, dy, jnp.full((N,), cfg.init_state.pos[2])], axis=-1)
        base_quat = qm.quat_from_euler_xyz(
            jnp.zeros(N), jnp.zeros(N), yaw0)
        dof_pos = self.mc.default_dof_pos * jax.random.uniform(
            ks[3], (N, 12), minval=0.5, maxval=1.5)
        lin_ang = jax.random.uniform(ks[4], (N, 6), minval=-0.5, maxval=0.5)
        lin_ang = lin_ang * e.randomize_start_vel
        u_new = jnp.concatenate([lin_ang, jnp.zeros((N, 12))], axis=-1)

        m1 = mask[:, None]
        sim = eng.EnvState(
            base_pos=jnp.where(m1, base_pos, state.sim.base_pos),
            base_quat=jnp.where(m1, base_quat, state.sim.base_quat),
            dof_pos=jnp.where(m1, dof_pos, state.sim.dof_pos),
            u=jnp.where(m1, u_new, state.sim.u))
        zero = lambda x: jnp.where(
            mask.reshape((N,) + (1,) * (x.ndim - 1)), jnp.zeros_like(x), x)
        bar_h, tire_h = self._sample_heights_where(state, mask, ks[6])
        return state._replace(
            sim=sim,
            bar_h=bar_h, tire_h=tire_h,
            seesaw_theta=jnp.where(
                mask, obst_gen.SEESAW_THETA_REST, state.seesaw_theta),
            seesaw_theta_d=jnp.where(mask, 0.0, state.seesaw_theta_d),
            episode_length=jnp.where(mask, 0, state.episode_length),
            actions_bbc=zero(state.actions_bbc),
            last_actions_bbc=zero(state.last_actions_bbc),
            action_history=zero(state.action_history),
            action_hl_history=zero(state.action_hl_history),
            last_dof_vel=zero(state.last_dof_vel),
            torques_org=zero(state.torques_org),
            last_torques_org=zero(state.last_torques_org),
            obs_history=zero(state.obs_history),
            cur_goal_idx=jnp.where(mask, goal_idx, state.cur_goal_idx),
            spawn_goal_idx=jnp.where(mask, goal_idx, state.spawn_goal_idx),
            reach_goal_timer=zero(state.reach_goal_timer),
            episode_sums=zero(state.episode_sums),
            key=ks[5])

    # ------------------------------------------------------------------

    def _measure_heights(self, state, base_pos, base_quat, grid=None):
        g = self.grid if grid is None else grid
        w = self._weights(state)
        pts = qm.quat_apply_yaw(base_quat[:, None, :], self.height_points) + base_pos[:, None, :]
        if self.engine_cfg.fast and self.engine_cfg.patch_size:
            from agility_tpu.physics import patch as pt

            # window centered on the yaw-rotated scan-grid circumcenter,
            # sized to the grid's circumradius (self.scan_size, __init__) —
            # every scandot stays strictly inside the window
            centers = (qm.quat_apply_yaw(base_quat, self.scan_center_local)
                       + base_pos)[:, :2]
            return pt.measure_scandots_batch(
                g, centers, self.scan_size, w,
                pts[..., 0], pts[..., 1])
        return jax.vmap(
            lambda p, wi: hf.sample_height_min3(self.grid, p[:, 0], p[:, 1], wi)
        )(pts, w)

    def _compute_observations(self, state: AgilityState, grid=None):
        cfg = self.cfg
        osc = cfg.obs_scales
        sim = state.sim
        bq = sim.base_quat
        base_lin_vel = qm.quat_rotate_inverse(bq, sim.u[:, :3])
        base_ang_vel = qm.quat_rotate_inverse(bq, sim.u[:, 3:6])
        roll, pitch, yaw = qm.euler_from_quat(bq)
        imu = jnp.stack([roll, pitch], -1)
        measured = self._measure_heights(state, sim.base_pos, bq, grid)
        root_h = (sim.base_pos[:, 2] - measured[:, self.center_height_idx])[:, None]

        delta_yaw = qm.wrap_to_pi(state.target_yaw - yaw)
        delta_next_yaw = qm.wrap_to_pi(state.next_target_yaw - yaw)
        delta_yaws = jnp.stack([delta_yaw, delta_next_yaw], -1)

        dof_err = (sim.dof_pos - self.mc.default_dof_pos) * osc.dof_pos
        dof_vel = sim.u[:, 6:] * osc.dof_vel
        cf = state.contact_filt.astype(jnp.float32)

        disc_obs = loco_mod.compute_disc_features(
            self.mc, self.feet_idx, osc, sim, state.contact_filt, root_h)

        prop = jnp.concatenate(
            [imu, base_ang_vel * osc.ang_vel, dof_err, dof_vel,
             state.action_history[:, -1], cf - 0.5,
             jnp.zeros((self.num_envs, 12), jnp.float32)], axis=-1)

        root_h_obs = root_h if cfg.env.root_height_obs else jnp.zeros_like(root_h)
        priv_explicit = jnp.concatenate([root_h_obs, base_lin_vel * osc.lin_vel], -1)
        priv_latent = jnp.concatenate(
            [self.mass_params, self.base_params.friction[:, None],
             self.base_params.kp_scale - 1.0, self.base_params.kd_scale - 1.0], -1)
        obst_onehot = jax.nn.one_hot(
            jnp.take_along_axis(
                self.obst_types,
                jnp.clip(state.cur_goal_idx, 0, self.n_goals_total - self.last_goal_repeat - 1)[:, None]
                // self.num_goals, axis=1)[:, 0],
            cfg.env.n_obst_type)
        heights = jnp.clip(sim.base_pos[:, 2:3] - 0.3 - measured, -1.0, 1.0)

        obs_history = jnp.where(
            (state.episode_length <= 1)[:, None, None],
            jnp.repeat(prop[:, None, :], cfg.env.history_len, axis=1),
            jnp.concatenate([state.obs_history[:, 1:], prop[:, None, :]], axis=1))
        hist_flat = obs_history.reshape(self.num_envs, -1)

        obs = jnp.concatenate(
            [prop, delta_yaws, obst_onehot, heights, priv_explicit, priv_latent,
             hist_flat], axis=-1)
        obs_bbc = jnp.concatenate(
            [prop, priv_explicit, priv_latent, hist_flat,
             state.commands, state.latent_eps, state.latent_c], axis=-1)

        clip = cfg.clip_observations
        return (jnp.clip(obs, -clip, clip), jnp.clip(obs_bbc, -clip, clip),
                disc_obs, jnp.clip(obs_history, -clip, clip), delta_yaw, delta_next_yaw)

    # ------------------------------------------------------------------

    def _compute_reward(self, q):
        """Parkour reward terms (reference :1777-1925)."""
        cfg = self.cfg.rewards
        terms = {}
        target_rel = q["target_rel"]
        norm = jnp.linalg.norm(target_rel, axis=-1, keepdims=True)
        tvn = target_rel / (norm + 1e-5)
        cur_vel = q["sim"].u[:, :2]
        proj = jnp.sum(tvn * cur_vel, axis=-1)
        # jump obstacles (bar=0, tire=4) push target speed to 2.5 m/s
        tgt = jnp.where((q["cur_obst_type"] == 0) | (q["cur_obst_type"] == 4),
                        2.5, cfg.target_lin_vel)
        terms["tracking_goal_vel"] = jnp.minimum(proj, tgt) / (tgt + 1e-5)
        dyaw = qm.wrap_to_pi(q["target_yaw"] - q["yaw"])
        terms["tracking_yaw"] = jnp.exp(-jnp.abs(dyaw))
        terms["reach_goal"] = q["reached"].astype(jnp.float32)
        pen = jnp.linalg.norm(q["body_forces"][:, self.penalized_idx], axis=-1)
        terms["collision"] = jnp.sum((pen > 0.1).astype(jnp.float32), -1)
        hl = q["hl_hist"]
        terms["action_hl_rate"] = jnp.linalg.norm(hl[:, -2] - hl[:, -1], axis=-1)
        terms["latent_c_rate"] = 0.5 * (
            jnp.abs(hl[:, -3, 0] - hl[:, -1, 0]) + jnp.abs(hl[:, -2, 0] - hl[:, -1, 0]))
        # feet on x-edge cells while in contact (:1899-1915)
        from agility_tpu.physics import soa

        feet_pos = soa.body_positions(self.mc, q["sim"], self.feet_idx)[:, :, :2]
        gx = jnp.round((feet_pos[..., 0] - self.grid.origin[0]) / self.grid.hscale).astype(jnp.int32)
        gy = jnp.round((feet_pos[..., 1] - self.grid.origin[1]) / self.grid.hscale).astype(jnp.int32)
        gx = jnp.clip(gx, 0, self.x_edge.shape[0] - 1)
        gy = jnp.clip(gy, 0, self.x_edge.shape[1] - 1)
        at_edge = self.x_edge[gx, gy]
        terms["feet_edge"] = jnp.sum(
            (q["contact_filt"] & at_edge).astype(jnp.float32), -1)

        stacked = jnp.stack([terms[n] for n in self.reward_names], axis=-1)
        scaled = stacked * self.reward_scales
        total = jnp.sum(scaled, axis=-1)
        if cfg.only_positive_rewards:
            total = jnp.maximum(total, 0.0)
        # termination penalty after clipping (compute_reward :412-425)
        if self.termination_scale:
            term_rew = (q["reset_buf"] & ~q["time_out"]).astype(jnp.float32) \
                * self.termination_scale
            total = total + term_rew
            scaled = jnp.concatenate([scaled, term_rew[:, None]], axis=-1)
        return total, scaled
