"""TSC student distillation (learn_vision): depth-camera policy.

Functional re-design of tsc/rsl_rl/runners/on_policy_runner.py:278-441 +
ppo.py:327-358: per iteration, roll the *student* (depth encoder + depth
actor) through the env with a frozen BBC underneath, buffering depth images,
masked proprio, teacher supervision targets, and GRU inputs; then recompute
the student sequence under grad (the env path is detached in the reference,
so recomputation is exact), apply the distillation losses (action CE + L2,
weighted yaw L2, obstacle-type CE), and run BYOL minibatches on the depth
images.  The depth camera is our heightfield ray-caster.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from agility_tpu.envs.go2_agility import AgilityState, Go2AgilityEnv
from agility_tpu.learn import depth as depth_mod
from agility_tpu.learn import networks_tsc as tnets
from agility_tpu.learn.ppo_tsc import BBCFrozen, TscPPO
from agility_tpu.render import raycast


@dataclasses.dataclass(frozen=True)
class VisionCfg:
    # tsc depth_encoder cfg :406-414
    num_steps_per_env: int = 24
    learning_rate: float = 1e-3
    learning_rate_byol: float = 3e-4
    learning_rate_min: float = 1e-5
    lr_decay_iters: int = 20000
    byol_minibatches: int = 6
    yaw_scale: float = 1.5            # student yaw output scale (runner :334)
    delta_yaw_ok_thresh: float = 0.6  # env extras threshold (:144)
    max_grad_norm: float = 1.0


class VisionTrainState(NamedTuple):
    enc_params: Any
    enc_opt: Any
    actor_params: Any           # student copy of the teacher actor-critic
    actor_opt: Any
    byol_state: depth_mod.BYOLState
    byol_opt: Any
    hidden: jnp.ndarray         # (N, 512) GRU state (detached per iter)
    it: jnp.ndarray
    key: jnp.ndarray


class TscVision:
    def __init__(self, env: Go2AgilityEnv, teacher: TscPPO, teacher_params,
                 teacher_est_params, cfg: VisionCfg = VisionCfg(), seed: int = 1):
        self.env = env
        self.teacher = teacher            # provides ac/bbc/disc modules + frozen BBC
        self.teacher_params = teacher_params
        self.teacher_est_params = teacher_est_params
        self.cfg = cfg
        ecfg = env.cfg.env
        self.n_prop = ecfg.n_proprio
        self.n_aux = ecfg.n_auxiliary
        self.slices = teacher.slices
        self.cam = raycast.make_camera(
            width=env.cfg.depth.resized[0], height=env.cfg.depth.resized[1],
            horizontal_fov_deg=env.cfg.depth.horizontal_fov,
            position=env.cfg.depth.position,
            near=env.cfg.depth.near_clip, far=env.cfg.depth.far_clip)
        self.encoder = depth_mod.RecurrentDepthEncoder(
            n_latent=32, n_delta_yaw=ecfg.n_delta_yaw,
            n_obst_type=ecfg.n_obst_type, n_proprio=ecfg.n_proprio)

        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        N = env.num_envs
        H, W = env.cfg.depth.resized[1], env.cfg.depth.resized[0]
        self._enc_params0 = self.encoder.init(
            k1, jnp.zeros((1, H, W)), jnp.zeros((1, ecfg.n_proprio)),
            jnp.zeros((1, 512)))
        self.byol_net, self._byol_state0 = depth_mod.byol_init(k2, image_shape=(H, W))
        # per-env camera pitch (reference depth.angle randomization)
        lo, hi = env.cfg.depth.angle_range
        self.cam_pitch = jnp.radians(
            jax.random.uniform(k3, (N,), minval=lo, maxval=hi))

        sched = lambda lr: lr  # decay handled via state.it inside update
        self.opt_enc = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate))
        self.opt_actor = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate))
        self.opt_byol = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.learning_rate_byol)

    def init_train_state(self, key) -> VisionTrainState:
        N = self.env.num_envs
        return VisionTrainState(
            enc_params=self._enc_params0,
            enc_opt=self.opt_enc.init(self._enc_params0),
            actor_params=self.teacher_params,       # student starts from teacher
            actor_opt=self.opt_actor.init(self.teacher_params),
            byol_state=self._byol_state0,
            byol_opt=self.opt_byol.init(self._byol_state0.online),
            hidden=jnp.zeros((N, 512)),
            it=jnp.zeros((), jnp.int32),
            key=key)

    # ------------------------------------------------------------------

    def render(self, key, es: AgilityState):
        """(N, H, W) processed depth images from the current state."""
        w = jnp.stack([es.bar_h, es.tire_h, es.seesaw_theta], axis=-1)
        depth = jax.vmap(
            lambda bp, bq, cp, wi: raycast.render_depth(
                self.cam, self.env.grid, bp, bq, cp, wi)
        )(es.sim.base_pos, es.sim.base_quat, self.cam_pitch, w)
        keys = jax.random.split(key, depth.shape[0])
        return jax.vmap(
            lambda k, d: raycast.process_depth(
                k, d, self.cam.near, self.cam.far, self.env.cfg.depth.depth_noise)
        )(keys, depth)

    def _encode(self, enc_params, depth, prop_masked, hidden):
        """Depth encoder step (runs only on camera-refresh steps)."""
        out, hidden = self.encoder.apply(enc_params, depth, prop_masked, hidden)
        lat = out[:, :32]
        dyaw = self.cfg.yaw_scale * out[:, 32:34]
        types = out[:, 34:]
        return lat, dyaw, types, hidden

    def _act(self, actor_params, obs, lat, dyaw, types, teacher_dyaw_ok):
        """Student action heads with the (held) encoder outputs swapped into
        the observation (runs every control step)."""
        a0 = self.n_prop - self.n_aux
        obs_student = obs.at[:, a0 : a0 + 2].set(
            jnp.where(teacher_dyaw_ok[:, None], dyaw, obs[:, a0 : a0 + 2]))
        obs_student = obs_student.at[:, a0 + 2 : self.n_prop].set(
            jax.nn.one_hot(jnp.argmax(types, -1), types.shape[-1]))
        logits_d, mean_c, _ = self.teacher.ac.apply(
            actor_params, obs_student, method="heads", hist_encoding=True,
            scandots_latent=lat)
        return logits_d, mean_c

    # ------------------------------------------------------------------

    def _prep_obs(self, es):
        obs = es.obs_buf
        est = self.teacher.estimator.apply(self.teacher_est_params, obs[:, :57])
        obs = obs.at[:, self.slices.explicit].set(est)
        prop_masked = obs[:, : self.n_prop].at[:, self.n_prop - self.n_aux :].set(0.0)
        return obs, prop_masked

    def rollout(self, ts: VisionTrainState, es: AgilityState, grid=None):
        """Collect a T-step student trajectory with teacher supervision.

        Camera timing follows the reference (legged_robot_config.py:63-84,
        runner :331-337): depth is rendered and the GRU encoder stepped only
        every `depth.update_interval` control steps; between refreshes the
        encoder outputs (scan latent, delta-yaw, obstacle type) are HELD and
        only the action heads run.  The rollout is therefore structured as
        `n_refresh` python-unrolled chunks of an inner `interval`-step scan,
        which also stores depth images at refresh steps only."""
        T = self.cfg.num_steps_per_env
        interval = self.env.cfg.depth.update_interval
        key = ts.key
        hidden = ts.hidden
        depth_frames = []      # per-chunk refresh images (for update + BYOL)
        chunk_prop = []        # encoder inputs at refresh steps
        chunk_data = []        # per-step supervision data
        ms_all = []

        t = 0
        while t < T:
            steps = min(interval, T - t)
            key, k_depth = jax.random.split(key)
            obs0, prop_masked0 = self._prep_obs(es)
            depth = self.render(k_depth, es)
            lat, dyaw, types, hidden = self._encode(
                ts.enc_params, depth, prop_masked0, hidden)
            depth_frames.append(depth)
            chunk_prop.append(prop_masked0)

            def step(carry, _):
                es, key = carry
                key, k = jax.random.split(key)
                obs, _ = self._prep_obs(es)
                obs_bbc = es.obs_bbc_buf
                a0 = self.n_prop - self.n_aux
                teacher_dyaw = obs[:, a0 : a0 + 2]
                teacher_types = obs[:, a0 + 2 : self.n_prop]
                dyaw_ok = jnp.abs(es.delta_yaw) < self.cfg.delta_yaw_ok_thresh

                # teacher action (argmax_d, mean_c on true scandots)
                t_logits, t_mean, _ = self.teacher.ac.apply(
                    self.teacher_params, obs, method="heads", hist_encoding=True)
                actions_teacher = jnp.concatenate(
                    [jnp.argmax(t_logits, -1)[:, None].astype(jnp.float32),
                     t_mean], axis=-1)

                # student action with the held encoder outputs (no grad)
                s_logits, s_mean = self._act(
                    ts.actor_params, obs, lat, dyaw, types, dyaw_ok)
                actions_student = jnp.concatenate(
                    [jnp.argmax(s_logits, -1)[:, None].astype(jnp.float32),
                     s_mean], -1)

                es2, next_commands = self.env.set_commands(es, actions_student)
                actions_bbc = self.teacher.bbc_act(obs_bbc, next_commands)
                es3, out = self.env.step(es2, actions_bbc, grid=grid)

                data = dict(obs=obs, dyaw_ok=dyaw_ok,
                            actions_teacher=actions_teacher,
                            teacher_dyaw=teacher_dyaw,
                            teacher_types=teacher_types)
                m = dict(rew=jnp.mean(out.rew), done=jnp.sum(out.reset),
                         success=jnp.sum(out.reach_goal_cutoff))
                return (es3, key), (data, m)

            (es, key), (data, ms) = jax.lax.scan(
                step, (es, key), None, length=steps)
            chunk_data.append(data)
            ms_all.append(ms)
            t += steps

        ts = ts._replace(key=key)
        ms = jax.tree.map(lambda *xs: jnp.concatenate(xs), *ms_all)
        metrics = {k: jnp.mean(v) if k == "rew" else jnp.sum(v)
                   for k, v in ms.items()}
        rollout_data = dict(
            depth=jnp.stack(depth_frames),          # (R, N, H, W)
            prop_masked=jnp.stack(chunk_prop),      # (R, N, n_prop)
            chunks=chunk_data)                      # list of per-step pytrees
        return ts, es, rollout_data, hidden, metrics

    # ------------------------------------------------------------------

    def update(self, ts: VisionTrainState, data):
        """Distillation losses via recomputation under grad (exact: the env
        path is detached in the reference, ppo.py:327-358).  The encoder is
        recomputed only at the refresh steps, chaining the GRU hidden across
        chunks from the iteration-start state; the action heads are
        recomputed for every step of every chunk with the chunk's (held)
        encoder outputs."""
        cfg = self.cfg
        R, N = data["depth"].shape[:2]
        lr = jnp.maximum(
            cfg.learning_rate - (cfg.learning_rate - cfg.learning_rate_min)
            * ts.it.astype(jnp.float32) / cfg.lr_decay_iters,
            cfg.learning_rate_min)
        lr_byol = jnp.maximum(
            cfg.learning_rate_byol - (cfg.learning_rate_byol - cfg.learning_rate_min)
            * ts.it.astype(jnp.float32) / cfg.lr_decay_iters,
            cfg.learning_rate_min)

        def loss_fn(enc_params, actor_params):
            hidden = ts.hidden
            d_losses, c_losses, yaw_losses, type_losses = [], [], [], []
            for r in range(R):
                lat, dyaw, types, hidden = self._encode(
                    enc_params, data["depth"][r], data["prop_masked"][r], hidden)
                ch = data["chunks"][r]
                steps = ch["obs"].shape[0]
                flat = lambda x: x.reshape((steps * N,) + x.shape[2:])
                rep = lambda x: jnp.tile(x, (steps,) + (1,) * (x.ndim - 1))
                logits_d, mean_c = self._act(
                    actor_params, flat(ch["obs"]), rep(lat), rep(dyaw),
                    rep(types), flat(ch["dyaw_ok"]))
                at = flat(ch["actions_teacher"])
                d_losses.append(-jnp.take_along_axis(
                    jax.nn.log_softmax(logits_d, -1),
                    at[:, 0].astype(jnp.int32)[:, None], axis=-1)[:, 0])
                c_losses.append(jnp.linalg.norm(at[:, 1:] - mean_c, axis=-1))
                yaw_losses.append(jnp.linalg.norm(
                    (flat(ch["teacher_dyaw"]) - rep(dyaw))
                    * jnp.asarray([2.0, 0.5]), axis=-1))
                type_losses.append(-jnp.log(jnp.take_along_axis(
                    rep(types) + 1e-20,
                    jnp.argmax(flat(ch["teacher_types"]), -1)[:, None],
                    axis=-1))[:, 0])
            d_loss = jnp.mean(jnp.concatenate(d_losses))
            c_loss = jnp.mean(jnp.concatenate(c_losses))
            yaw_loss = jnp.mean(jnp.concatenate(yaw_losses))
            type_loss = jnp.mean(jnp.concatenate(type_losses))
            total = d_loss + c_loss + yaw_loss + type_loss
            return total, dict(actor=d_loss + c_loss, yaw=yaw_loss, types=type_loss)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True, argnums=(0, 1))(
            ts.enc_params, ts.actor_params)
        g_enc, g_actor = grads
        enc_opt = (ts.enc_opt[0], ts.enc_opt[1]._replace(
            hyperparams={**ts.enc_opt[1].hyperparams, "learning_rate": lr}))
        u, enc_opt = self.opt_enc.update(g_enc, enc_opt, ts.enc_params)
        enc_params = optax.apply_updates(ts.enc_params, u)
        actor_opt = (ts.actor_opt[0], ts.actor_opt[1]._replace(
            hyperparams={**ts.actor_opt[1].hyperparams, "learning_rate": lr}))
        u, actor_opt = self.opt_actor.update(g_actor, actor_opt, ts.actor_params)
        actor_params = optax.apply_updates(ts.actor_params, u)

        # --- BYOL minibatches over the collected depth images ---
        imgs = data["depth"].reshape((-1,) + data["depth"].shape[2:])
        n = imgs.shape[0]
        mb = max(1, n // cfg.byol_minibatches)
        key = ts.key
        byol_state, byol_opt = ts.byol_state, ts.byol_opt

        def byol_step(carry, k):
            st, opt = carry
            k1, k2, k3 = jax.random.split(k, 3)
            idx = jax.random.randint(k1, (mb,), 0, n)
            batch = imgs[idx]
            a1 = jax.vmap(depth_mod.augment_depth)(jax.random.split(k2, mb), batch)
            a2 = jax.vmap(depth_mod.augment_depth)(jax.random.split(k3, mb), batch)
            l, g = jax.value_and_grad(
                lambda p: depth_mod.byol_loss(self.byol_net, p, st.target, a1, a2)
            )(st.online)
            bo = opt._replace(hyperparams={**opt.hyperparams, "learning_rate": lr_byol})
            u, bo = self.opt_byol.update(g, bo, st.online)
            online = optax.apply_updates(st.online, u)
            st = depth_mod.byol_ema_update(st._replace(online=online))
            return (st, bo), l

        key, sub = jax.random.split(key)
        (byol_state, byol_opt), byol_losses = jax.lax.scan(
            byol_step, (byol_state, byol_opt),
            jax.random.split(sub, cfg.byol_minibatches))

        ts = ts._replace(
            enc_params=enc_params, enc_opt=enc_opt,
            actor_params=actor_params, actor_opt=actor_opt,
            byol_state=byol_state, byol_opt=byol_opt,
            it=ts.it + 1, key=key)
        return ts, {**{f"vision/{k}": v for k, v in aux.items()},
                    "vision/byol": jnp.mean(byol_losses), "vision/lr": lr}

    # ------------------------------------------------------------------

    def train_iteration(self, ts: VisionTrainState, es: AgilityState, grid=None):
        ts, es, data, hidden, roll_m = self.rollout(ts, es, grid)
        ts, up_m = self.update(ts, data)
        # GRU hidden detach between iterations (runner :425)
        ts = ts._replace(hidden=jax.lax.stop_gradient(hidden))
        return ts, es, {**{f"rollout/{k}": v for k, v in roll_m.items()}, **up_m}
