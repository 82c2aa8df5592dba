"""SSInfoGAIL: PPO + semi-supervised InfoGAIL mocap imitation, as pure JAX.

Functional re-design of the reference algorithm (bbc/rsl_rl/algorithms/
gail.py + discriminator.py + rollout_storage.py + the runner rollout loop,
bbc/rsl_rl/runners/on_policy_runner.py:120-236): one `train_iteration` is a
single jitted program — a 24-step `lax.scan` rollout through the env,
GAE, 5x4 PPO minibatch updates with adaptive-KL learning rate, and 80
discriminator minibatch updates zipping policy-replay / labeled-expert /
unlabeled-expert streams.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from agility_tpu.envs import mocap as mocap_mod
from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv, LocoState
from agility_tpu.learn import networks as nets
from agility_tpu.learn import replay


@dataclasses.dataclass(frozen=True)
class AlgoCfg:
    # go2_locomotion_config.py:196-225 + base LeggedRobotCfgAlgo
    lr_ac: float = 1e-3
    lr_disc: float = 5e-4
    lr_q: float = 1e-3
    lr_estimator: float = 1e-4
    surrogate_loss_coef: float = 2.0
    value_loss_coef: float = 5.0
    entropy_coef: float = 0.01
    bounds_loss_coef: float = 0.0
    disc_coef: float = 1.0
    disc_logit_reg: float = 0.05
    disc_grad_penalty: float = 0.1
    disc_weight_decay: float = 0.0001
    disc_adam_weight_decay: float = 1e-3
    disc_replay_buffer_size: int = 1_000_000
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    clip_param: float = 0.2
    gamma: float = 0.99
    lam: float = 0.95
    desired_kl: float = 0.01
    lr_schedule: str = "adaptive"   # "adaptive" (KL-tracking LR, gail.py:367-379)
    #                                 | "fixed" (constant lr_ac; reference
    #                                 schedule option — adaptive KL collapses
    #                                 the LR on small noisy batches)
    max_grad_norm: float = 1.0
    use_clipped_value_loss: bool = True
    us_coef: float = 1.0
    ss_coef: float = 1.0
    prior_soft_coef: float = 1e-3
    info_max_coef: float = 1.0
    begin_rim: int = 200
    disc_loss_function: str = "MSELoss"
    priv_reg_coef_schedule: Tuple[float, float, float, float] = (0, 0.1, 1000, 2000)
    num_steps_per_env: int = 24
    dagger_update_freq: int = 20
    num_preload_transitions: int = 200_000
    # reward mix (runner cfg :238-241)
    reward_i_coef: float = 1.0
    reward_us_coef: float = 0.01
    reward_ss_coef: float = 0.2
    reward_t_coef: float = 0.2
    min_normalized_std: Tuple[float, ...] = (0.05, 0.02, 0.05) * 4


class TrainState(NamedTuple):
    ac_params: Any
    ac_opt: Any
    lr_ac: jnp.ndarray
    hist_opt: Any                 # Adam over history_encoder only
    est_params: Any
    est_opt: Any
    disc_params: Any
    disc_opt_d: Any
    disc_opt_qe: Any
    disc_opt_qc: Any
    disc_norm: Dict[str, jnp.ndarray]
    ring: replay.Ring
    prior_parameters: jnp.ndarray   # (C,)
    task_obs_weight: jnp.ndarray    # () — decays 1 -> 0 (runner :224-225)
    learning_steps: jnp.ndarray     # () int32 (disc update counter)
    priv_reg_counter: jnp.ndarray   # () int32
    key: jnp.ndarray


class Transition(NamedTuple):
    obs: jnp.ndarray
    critic_obs: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    dones: jnp.ndarray
    values: jnp.ndarray
    log_prob: jnp.ndarray
    mean: jnp.ndarray
    std: jnp.ndarray


class SSInfoGAIL:
    def __init__(self, env: Go2LocomotionEnv, cfg: AlgoCfg = AlgoCfg(), seed: int = 1):
        self.env = env
        self.cfg = cfg
        ecfg = env.cfg.env
        self.slices = nets.ObsSlices(
            ecfg.num_prop, ecfg.num_explicit, ecfg.num_latent, ecfg.history_len,
            ecfg.num_command)
        self.dim_c = env.dim_c
        self.num_disc_obs = ecfg.num_obs_disc
        self.disc_obs_len = ecfg.disc_obs_len
        self.disc_in = self.num_disc_obs * self.disc_obs_len

        self.ac = nets.ActorCritic(num_actions=ecfg.num_actions, slices=self.slices)
        self.estimator = nets.Estimator(output_dim=ecfg.num_explicit)
        self.disc = nets.Discriminator(dim_c=self.dim_c)

        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        obs0 = jnp.zeros((1, self.slices.total))
        ac_params = self.ac.init(k1, obs0, obs0)
        est_params = self.estimator.init(k2, jnp.zeros((1, ecfg.num_prop)))
        disc_params = self.disc.init(k3, jnp.zeros((1, self.disc_in)))

        # optimizers
        self.opt_ac = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr_ac),
        )
        self.opt_hist = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr_estimator),
        )
        self.opt_est = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr_estimator),
        )
        # disc: three optimizers sharing the trunk (reference gail.py:113-132);
        # leaves outside each optimizer's scope receive zero updates
        awd = cfg.disc_adam_weight_decay

        def disc_opt(lr, names):
            labels = self._disc_labels(disc_params, names)
            return optax.multi_transform(
                {"on": optax.adamw(lr, weight_decay=awd), "off": optax.set_to_zero()},
                labels)

        self.opt_d = disc_opt(cfg.lr_disc, ("Dense_0", "Dense_1", "head_logit"))
        self.opt_qe = disc_opt(cfg.lr_q, ("Dense_0", "Dense_1", "head_eps"))
        self.opt_qc = disc_opt(cfg.lr_q, ("Dense_0", "Dense_1", "head_classifier"))

        # min-std clamp vector (runner :99-101)
        lo, hi = env.soft_dof_lower, env.soft_dof_upper
        self.min_std = jnp.asarray(cfg.min_normalized_std) * jnp.abs(hi - lo)

        # expert preload tables (runner MotionLoader(num_preload=200k))
        P = cfg.num_preload_transitions
        osc = env.cfg.normalization.obs_scales
        ddp = env.mc.default_dof_pos

        def preload(k, labeled):
            frames, labels = env.motion.sample_transition_frames(
                k, P, env.dt, labeled, self.disc_obs_len)
            feats = jnp.concatenate(
                [mocap_mod.disc_obs_from_frames(frames[i], ddp, osc)
                 for i in range(self.disc_obs_len)], axis=-1)
            return feats, labels

        self.expert_lb, self.expert_labels = jax.jit(
            preload, static_argnums=1)(k4, True)
        self.expert_ulb, _ = jax.jit(preload, static_argnums=1)(
            jax.random.fold_in(k4, 1), False)

        self._ac_params0 = ac_params
        self._est_params0 = est_params
        self._disc_params0 = disc_params

    @staticmethod
    def _disc_labels(params, names):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "on"
            if any(n == getattr(p, "key", None) for p in path for n in names)
            else "off",
            params)

    # ------------------------------------------------------------------

    def init_train_state(self, key) -> TrainState:
        cfg = self.cfg
        N = self.env.num_envs
        T = cfg.num_steps_per_env
        cap = (cfg.disc_replay_buffer_size // N) * N
        return TrainState(
            ac_params=self._ac_params0,
            ac_opt=self.opt_ac.init(self._ac_params0),
            lr_ac=jnp.asarray(cfg.lr_ac, jnp.float32),
            hist_opt=self.opt_hist.init(self._hist_subset(self._ac_params0)),
            est_params=self._est_params0,
            est_opt=self.opt_est.init(self._est_params0),
            disc_params=self._disc_params0,
            disc_opt_d=self.opt_d.init(self._disc_params0),
            disc_opt_qe=self.opt_qe.init(self._disc_params0),
            disc_opt_qc=self.opt_qc.init(self._disc_params0),
            disc_norm=nets.RunningNormalizer.init(self.disc_in),
            ring=replay.init(cap, self.disc_in + 1 + self.dim_c),
            prior_parameters=jnp.full((self.dim_c,), 1.0 / self.dim_c, jnp.float32),
            task_obs_weight=jnp.asarray(1.0, jnp.float32),
            learning_steps=jnp.zeros((), jnp.int32),
            priv_reg_counter=jnp.zeros((), jnp.int32),
            key=key,
        )

    @staticmethod
    def _hist_subset(ac_params):
        return ac_params["params"]["history_encoder"]

    # ------------------------------------------------------------------
    # discriminator reward (reference discriminator.py:71-118)
    # ------------------------------------------------------------------

    def _apply_task_weight(self, x_frames, w):
        """Decay velocity/key-pos/contact feature groups of disc obs (cols
        3:9 and 33:) by the task-obs weight (discriminator.py:79-82).
        x_frames: (B, L, 49)."""
        if not self.env.cfg.normalization.task_obs_weight_decay:
            return x_frames
        scale = jnp.ones((self.num_disc_obs,))
        scale = scale.at[3:9].set(w).at[33:].set(w)
        return x_frames * scale

    def disc_reward(self, disc_params, disc_norm, obs, disc_hist, task_reward, task_w):
        cfg = self.cfg
        label_eps = obs[:, -self.dim_c - 1 : -self.dim_c]
        label_c = obs[:, -self.dim_c :]
        label_c = jax.nn.one_hot(jnp.argmax(label_c, -1), self.dim_c)
        disc_hist = self._apply_task_weight(disc_hist, task_w)
        x = disc_hist.reshape(disc_hist.shape[0], -1)
        x = nets.RunningNormalizer.normalize(disc_norm, x)
        d, eps, c = self.disc.apply(disc_params, x)
        if cfg.disc_loss_function == "MSELoss":
            r_i = jnp.maximum(1.0 - 0.25 * jnp.square(d[:, 0] - 1.0), 0.0)
        elif cfg.disc_loss_function == "BCEWithLogitsLoss":
            r_i = -jnp.log(jnp.maximum(1.0 - jax.nn.sigmoid(d[:, 0]), 1e-4))
        else:  # Wasserstein
            r_i = d[:, 0]
        r_us = -jnp.abs(eps[:, 0] - label_eps[:, 0])
        r_ss = jnp.sum(label_c * jnp.log(c), axis=-1)   # -CE
        dt = self.env.dt
        r_i = r_i * dt
        r_us = r_us * dt
        r_ss = r_ss * dt
        total = (cfg.reward_i_coef * r_i + cfg.reward_us_coef * r_us
                 + cfg.reward_ss_coef * r_ss + cfg.reward_t_coef * task_reward)
        return total, r_i, r_us, r_ss

    # ------------------------------------------------------------------
    # rollout
    # ------------------------------------------------------------------

    def rollout(self, ts: TrainState, es: LocoState, disc_hist, hist_encoding,
                grid=None):
        """T-step on-policy rollout; returns stacked transitions."""
        cfg = self.cfg
        s = self.slices

        def step(carry, _):
            es, disc_hist, ring, key = carry
            key, k_act = jax.random.split(key)
            obs = es.obs_buf
            critic_obs = obs
            # estimator swap-in for acting (gail.py:182-186)
            est = self.estimator.apply(ts.est_params, obs[:, s.prop])
            obs_est = obs.at[:, s.explicit].set(est)
            mean = self.ac.apply(ts.ac_params, obs_est, hist_encoding,
                                 method="action_mean_switch")
            std = ts.ac_params["params"]["std"]
            actions = mean + std * jax.random.normal(k_act, mean.shape)
            logp = nets.gaussian_log_prob(mean, std, actions)
            values = self.ac.apply(ts.ac_params, critic_obs, method="value")

            es2, out = self.env.step(es, actions, grid=grid)

            # disc-obs two-frame window w/ terminal patching (runner :166-181)
            patched = jnp.where(out.reset[:, None], out.terminal_disc_obs, out.disc_obs)
            disc_hist2 = jnp.concatenate([disc_hist[:, 1:], patched[:, None]], axis=1)
            total_r, r_i, r_us, r_ss = self.disc_reward(
                ts.disc_params, ts.disc_norm, obs, disc_hist2, out.rew,
                ts.task_obs_weight)
            # timeout bootstrap (gail.py:203-205)
            total_r = total_r + cfg.gamma * values * out.time_out

            # replay insert (policy side)
            rows = jnp.concatenate(
                [disc_hist2.reshape(disc_hist2.shape[0], -1), es2.latent_eps, es2.latent_c],
                axis=-1)
            ring = replay.insert(ring, rows)

            # post-store: reset envs restart the window from the fresh obs
            disc_hist3 = jnp.where(
                out.reset[:, None, None],
                jnp.repeat(out.disc_obs[:, None], self.disc_obs_len, axis=1),
                disc_hist2)

            tr = Transition(
                obs=obs, critic_obs=critic_obs, actions=actions, rewards=total_r,
                dones=out.reset, values=values, log_prob=logp, mean=mean,
                std=jnp.broadcast_to(std, mean.shape))
            # exploit detector (physics/debug.py speed_gate): sustained
            # overspeed means an energy leak, not locomotion
            speed = jnp.linalg.norm(es2.sim.u[:, :3], axis=-1)
            metrics = dict(r_i=jnp.mean(r_i), r_us=jnp.mean(r_us), r_ss=jnp.mean(r_ss),
                           r_t=jnp.mean(out.rew), r_total=jnp.mean(total_r),
                           ep_done=jnp.sum(out.reset),
                           overspeed=jnp.mean((speed > 8.0).astype(jnp.float32)),
                           max_speed=jnp.max(speed))
            return (es2, disc_hist3, ring, key), (tr, metrics)

        (es, disc_hist, ring, key), (trs, ms) = jax.lax.scan(
            step, (es, disc_hist, ts.ring, ts.key), None, length=cfg.num_steps_per_env)
        ts = ts._replace(ring=ring, key=key)
        metrics = {k: jnp.mean(v) for k, v in ms.items()}
        metrics["ep_done"] = jnp.sum(ms["ep_done"])
        metrics["max_speed"] = jnp.max(ms["max_speed"])
        return ts, es, disc_hist, trs, metrics

    # ------------------------------------------------------------------
    # GAE (rollout_storage.py:97-111)
    # ------------------------------------------------------------------

    def compute_gae(self, trs: Transition, last_values):
        cfg = self.cfg

        def scan_fn(adv_next, tr_and_next_value):
            tr, next_value = tr_and_next_value
            not_done = 1.0 - tr.dones.astype(jnp.float32)
            delta = tr.rewards + not_done * cfg.gamma * next_value - tr.values
            adv = delta + not_done * cfg.gamma * cfg.lam * adv_next
            return adv, adv

        next_values = jnp.concatenate([trs.values[1:], last_values[None]], axis=0)
        _, advantages = jax.lax.scan(
            scan_fn, jnp.zeros_like(last_values), (trs, next_values), reverse=True)
        returns = advantages + trs.values
        advantages = (advantages - jnp.mean(advantages)) / (jnp.std(advantages) + 1e-8)
        return advantages, returns

    # ------------------------------------------------------------------
    # PPO update (gail.py:328-413)
    # ------------------------------------------------------------------

    def ppo_update(self, ts: TrainState, trs: Transition, advantages, returns, key):
        cfg = self.cfg
        s = self.slices
        T, N = trs.rewards.shape
        B = T * N
        n_mb = cfg.num_mini_batches
        mb = B // n_mb
        flat = jax.tree.map(lambda x: x.reshape((B,) + x.shape[2:]), trs)
        adv_f = advantages.reshape(B)
        ret_f = returns.reshape(B)
        perm = jax.random.permutation(key, B)
        gather = lambda x: x[perm].reshape((n_mb, mb) + x.shape[1:])
        batches = jax.tree.map(gather, flat)
        adv_b = gather(adv_f)
        ret_b = gather(ret_f)

        # priv reg coefficient (gail.py:350-357)
        sch = cfg.priv_reg_coef_schedule
        stage = jnp.minimum(
            jnp.maximum(ts.priv_reg_counter.astype(jnp.float32) - sch[2], 0.0) / sch[3], 1.0)
        priv_reg_coef = stage * (sch[1] - sch[0]) + sch[0]

        def loss_fn(ac_params, mbt, mb_adv, mb_ret):
            mean = self.ac.apply(ac_params, mbt.obs, method="action_mean",
                                 hist_encoding=False)
            std = ac_params["params"]["std"]
            logp = nets.gaussian_log_prob(mean, std, mbt.actions)
            value = self.ac.apply(ac_params, mbt.critic_obs, method="value")
            entropy = nets.gaussian_entropy(jnp.broadcast_to(std, mean.shape))

            ratio = jnp.exp(logp - mbt.log_prob)
            surr = -mb_adv * ratio
            surr_cl = -mb_adv * jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param)
            surrogate_loss = jnp.mean(jnp.maximum(surr, surr_cl))

            if cfg.use_clipped_value_loss:
                v_cl = mbt.values + jnp.clip(value - mbt.values, -cfg.clip_param, cfg.clip_param)
                value_loss = jnp.mean(jnp.maximum(
                    jnp.square(value - mb_ret), jnp.square(v_cl - mb_ret)))
            else:
                value_loss = jnp.mean(jnp.square(mb_ret - value))

            # bound loss (soft bound 1.0)
            b_loss = jnp.sum(
                jnp.square(jnp.maximum(mean - 1.0, 0.0))
                + jnp.square(jnp.minimum(mean + 1.0, 0.0)), axis=-1)

            # priv-reg latent regularization
            priv_lat = self.ac.apply(ac_params, mbt.obs, method="priv_latent")
            hist_lat = jax.lax.stop_gradient(
                self.ac.apply(ac_params, mbt.obs, method="hist_latent"))
            priv_reg_loss = jnp.mean(
                jnp.linalg.norm(priv_lat - hist_lat, axis=-1))

            total = (cfg.surrogate_loss_coef * surrogate_loss
                     + cfg.value_loss_coef * value_loss
                     + cfg.bounds_loss_coef * jnp.mean(b_loss)
                     - cfg.entropy_coef * jnp.mean(entropy)
                     + priv_reg_coef * priv_reg_loss)
            aux = dict(surrogate=surrogate_loss, value=value_loss,
                       entropy=jnp.mean(entropy), priv_reg=priv_reg_loss,
                       mean=mean, std=std)
            return total, aux

        def est_loss_fn(est_params, mbt):
            pred = self.estimator.apply(est_params, mbt.obs[:, s.prop])
            return jnp.mean(jnp.square(pred - mbt.obs[:, s.explicit]))

        def mb_step(carry, i):
            ac_params, ac_opt, lr, est_params, est_opt = carry
            j = i % n_mb
            mbt = jax.tree.map(lambda x: x[j], batches)
            mb_adv = adv_b[j]
            mb_ret = ret_b[j]

            # estimator update (independent Adam)
            el, eg = jax.value_and_grad(est_loss_fn)(est_params, mbt)
            eu, est_opt = self.opt_est.update(eg, est_opt, est_params)
            est_params = optax.apply_updates(est_params, eu)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ac_params, mbt, mb_adv, mb_ret)

            # adaptive KL LR (gail.py:367-379) — computed on the pre-update
            # policy of this minibatch vs the rollout policy
            kl = jnp.sum(
                jnp.log(aux["std"] / mbt.std + 1e-5)
                + (jnp.square(mbt.std) + jnp.square(mbt.mean - aux["mean"]))
                / (2.0 * jnp.square(aux["std"])) - 0.5, axis=-1)
            kl_mean = jnp.mean(kl)
            if cfg.lr_schedule == "adaptive":   # static branch under jit
                lr = jnp.where(kl_mean > cfg.desired_kl * 2.0,
                               jnp.maximum(1e-5, lr / 1.5), lr)
                lr = jnp.where((kl_mean < cfg.desired_kl / 2.0) & (kl_mean > 0.0),
                               jnp.minimum(1e-2, lr * 1.5), lr)
            inj = ac_opt[1]._replace(
                hyperparams={**ac_opt[1].hyperparams, "learning_rate": lr})
            ac_opt = (ac_opt[0], inj)

            updates, ac_opt = self.opt_ac.update(grads, ac_opt, ac_params)
            ac_params = optax.apply_updates(ac_params, updates)
            out = dict(loss=loss, est=el, kl=kl_mean,
                       **{k: aux[k] for k in ("surrogate", "value", "entropy", "priv_reg")})
            return (ac_params, ac_opt, lr, est_params, est_opt), out

        n_steps = cfg.num_learning_epochs * n_mb
        carry = (ts.ac_params, ts.ac_opt, ts.lr_ac, ts.est_params, ts.est_opt)
        carry, outs = jax.lax.scan(mb_step, carry, jnp.arange(n_steps))
        ac_params, ac_opt, lr, est_params, est_opt = carry
        ts = ts._replace(ac_params=ac_params, ac_opt=ac_opt, lr_ac=lr,
                         est_params=est_params, est_opt=est_opt)
        metrics = {f"ppo/{k}": jnp.mean(v) for k, v in outs.items()}
        metrics["ppo/lr"] = lr
        return ts, metrics

    # ------------------------------------------------------------------
    # discriminator update (gail.py:415-541)
    # ------------------------------------------------------------------

    def disc_update(self, ts: TrainState, key):
        cfg = self.cfg
        T = cfg.num_steps_per_env
        N = self.env.num_envs
        n_mb = cfg.num_learning_epochs * cfg.num_mini_batches * 4
        mb = max(1, T * N // n_mb)

        info_max_on = jnp.minimum(
            cfg.info_max_coef
            * jnp.maximum(ts.learning_steps.astype(jnp.float32) + 1 - cfg.begin_rim, 0.0)
            / 10000.0,
            cfg.info_max_coef)

        def loss_fn(disc_params, pol_x, pol_eps, pol_c, exp_lb_x, exp_lb_label, exp_ulb_x):
            d_apply = lambda x: self.disc.apply(disc_params, x)
            _, _, pred_c_lb = d_apply(exp_lb_x)
            ss_loss = -jnp.mean(jnp.sum(
                jax.nn.one_hot(exp_lb_label, self.dim_c) * jnp.log(pred_c_lb), -1))

            logits_pi, eps, pred_c = d_apply(pol_x)
            logits_exp, _, pred_c_ulb = d_apply(exp_ulb_x)

            pred_c_ulb_mean = jnp.mean(pred_c_ulb, axis=0)
            info_max_loss = jnp.mean(-jnp.sum(pred_c_ulb * jnp.log(pred_c_ulb + 1e-20), -1))

            if cfg.disc_loss_function == "MSELoss":
                disc_exp_loss = jnp.mean(jnp.square(logits_exp - 1.0))
                disc_pi_loss = jnp.mean(jnp.square(logits_pi + 1.0))
            elif cfg.disc_loss_function == "BCEWithLogitsLoss":
                disc_exp_loss = jnp.mean(
                    optax.sigmoid_binary_cross_entropy(logits_exp, jnp.ones_like(logits_exp)))
                disc_pi_loss = jnp.mean(
                    optax.sigmoid_binary_cross_entropy(logits_pi, jnp.zeros_like(logits_pi)))
            else:  # Wasserstein
                disc_exp_loss = -jnp.mean(logits_exp)
                disc_pi_loss = jnp.mean(logits_pi)
            disc_loss = 0.5 * (disc_pi_loss + disc_exp_loss)

            us_loss = jnp.mean(jnp.abs(eps - pol_eps))

            logit_w = disc_params["params"]["head_logit"]["kernel"]
            disc_logit_loss = jnp.sum(jnp.square(logit_w))

            # R1-style gradient penalty on unlabeled expert samples
            def d_scalar(x):
                return jnp.sum(self.disc.apply(disc_params, x)[0])

            g = jax.grad(d_scalar)(exp_ulb_x)
            grad_pen = jnp.mean(jnp.sum(jnp.square(g), axis=-1))

            trunk_w = jnp.concatenate(
                [disc_params["params"]["Dense_0"]["kernel"].ravel(),
                 disc_params["params"]["Dense_1"]["kernel"].ravel(),
                 logit_w.ravel()])
            weight_decay = jnp.sum(jnp.square(trunk_w))

            total = (cfg.ss_coef * ss_loss + info_max_on * info_max_loss
                     + cfg.disc_coef * disc_loss + cfg.us_coef * us_loss
                     + cfg.disc_grad_penalty * grad_pen
                     + cfg.disc_logit_reg * disc_logit_loss
                     + cfg.disc_weight_decay * weight_decay)
            acc = dict(
                acc_lb=jnp.mean((jnp.argmax(pred_c_lb, -1) == exp_lb_label).astype(jnp.float32)),
                acc_pi=jnp.mean((logits_pi < 0).astype(jnp.float32)),
                acc_exp=jnp.mean((logits_exp > 0).astype(jnp.float32)),
                acc_ulb=jnp.mean(
                    (jnp.argmax(pred_c, -1) == jnp.argmax(pol_c, -1)).astype(jnp.float32)),
            )
            aux = dict(ss=ss_loss, info_max=info_max_loss, disc=disc_loss, us=us_loss,
                       grad_pen=grad_pen, logit=disc_logit_loss, wd=weight_decay,
                       prior=pred_c_ulb_mean, **acc)
            return total, aux

        P = self.expert_lb.shape[0]

        def mb_step(carry, k):
            disc_params, od, oqe, oqc, norm, prior = carry
            k1, k2, k3 = jax.random.split(k, 3)
            pol_rows = replay.sample(ts.ring, k1, mb)
            pol_x = pol_rows[:, : self.disc_in]
            pol_eps = pol_rows[:, self.disc_in : self.disc_in + 1]
            pol_c = pol_rows[:, self.disc_in + 1 :]
            lb_idx = jax.random.randint(k2, (mb,), 0, P)
            ulb_idx = jax.random.randint(k3, (mb,), 0, self.expert_ulb.shape[0])
            exp_lb_x = self.expert_lb[lb_idx]
            exp_lb_label = self.expert_labels[lb_idx]
            exp_ulb_x = self.expert_ulb[ulb_idx]

            tw = lambda x: self._apply_task_weight(
                x.reshape(mb, self.disc_obs_len, self.num_disc_obs),
                ts.task_obs_weight).reshape(mb, -1)
            pol_x, exp_lb_x, exp_ulb_x = tw(pol_x), tw(exp_lb_x), tw(exp_ulb_x)

            norm_fn = lambda x: nets.RunningNormalizer.normalize(norm, x)
            pol_xn, exp_lb_xn, exp_ulb_xn = norm_fn(pol_x), norm_fn(exp_lb_x), norm_fn(exp_ulb_x)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                disc_params, pol_xn, pol_eps, pol_c, exp_lb_xn, exp_lb_label, exp_ulb_xn)

            u, od = self.opt_d.update(grads, od, disc_params)
            disc_params = optax.apply_updates(disc_params, u)
            u, oqe = self.opt_qe.update(grads, oqe, disc_params)
            disc_params = optax.apply_updates(disc_params, u)
            u, oqc = self.opt_qc.update(grads, oqc, disc_params)
            disc_params = optax.apply_updates(disc_params, u)

            prior = aux["prior"] * cfg.prior_soft_coef + prior * (1 - cfg.prior_soft_coef)

            # running-stat update with the raw (pre-normalized) features
            norm = nets.RunningNormalizer.update(norm, pol_x)
            norm = nets.RunningNormalizer.update(norm, exp_lb_x)
            norm = nets.RunningNormalizer.update(norm, exp_ulb_x)

            out = {k_: v for k_, v in aux.items() if k_ != "prior"}
            out["loss"] = loss
            return (disc_params, od, oqe, oqc, norm, prior), out

        keys = jax.random.split(key, n_mb)
        carry = (ts.disc_params, ts.disc_opt_d, ts.disc_opt_qe, ts.disc_opt_qc,
                 ts.disc_norm, ts.prior_parameters)
        carry, outs = jax.lax.scan(mb_step, carry, keys)
        disc_params, od, oqe, oqc, norm, prior = carry

        # min-std clamp (gail.py:522-523)
        std = jnp.maximum(ts.ac_params["params"]["std"], self.min_std)
        ac_params = jax.tree_util.tree_map(lambda x: x, ts.ac_params)
        ac_params["params"]["std"] = std

        ts = ts._replace(
            ac_params=ac_params, disc_params=disc_params, disc_opt_d=od,
            disc_opt_qe=oqe, disc_opt_qc=oqc, disc_norm=norm,
            prior_parameters=prior,
            learning_steps=ts.learning_steps + 1,
            priv_reg_counter=ts.priv_reg_counter + 1)
        metrics = {f"disc/{k}": jnp.mean(v) for k, v in outs.items()}
        return ts, metrics

    # ------------------------------------------------------------------
    # DAgger hist-encoder update (gail.py:543-575)
    # ------------------------------------------------------------------

    def dagger_update(self, ts: TrainState, trs: Transition, key):
        cfg = self.cfg
        T, N = trs.rewards.shape
        B = T * N
        n_mb = cfg.num_mini_batches
        mb = B // n_mb
        obs_flat = trs.obs.reshape(B, -1)
        perm = jax.random.permutation(key, B)
        obs_b = obs_flat[perm].reshape(n_mb, mb, -1)

        def loss_fn(hist_params, full_ac_params, obs_mb):
            params = jax.tree_util.tree_map(lambda x: x, full_ac_params)
            params["params"]["history_encoder"] = hist_params
            hist_lat = self.ac.apply(params, obs_mb, method="hist_latent")
            priv_lat = jax.lax.stop_gradient(
                self.ac.apply(params, obs_mb, method="priv_latent"))
            return jnp.mean(jnp.linalg.norm(priv_lat - hist_lat, axis=-1))

        def mb_step(carry, i):
            ac_params, hopt = carry
            j = i % n_mb
            hist_params = ac_params["params"]["history_encoder"]
            l, g = jax.value_and_grad(loss_fn)(hist_params, ac_params, obs_b[j])
            u, hopt = self.opt_hist.update(g, hopt, hist_params)
            hist_params = optax.apply_updates(hist_params, u)
            ac_params = jax.tree_util.tree_map(lambda x: x, ac_params)
            ac_params["params"]["history_encoder"] = hist_params
            return (ac_params, hopt), l

        carry, losses = jax.lax.scan(
            mb_step, (ts.ac_params, ts.hist_opt),
            jnp.arange(cfg.num_learning_epochs * n_mb))
        ac_params, hopt = carry
        ts = ts._replace(ac_params=ac_params, hist_opt=hopt,
                         priv_reg_counter=ts.priv_reg_counter + 1)
        return ts, {"dagger/hist_latent": jnp.mean(losses)}

    # ------------------------------------------------------------------
    # one full training iteration
    # ------------------------------------------------------------------

    def train_iteration(self, ts: TrainState, es: LocoState, disc_hist, it,
                        grid=None):
        """One iteration: rollout -> GAE -> PPO -> disc -> (DAgger).
        `grid`: jit-argument world carrying the band stacks (jitwrap)."""
        hist_encoding = (it % self.cfg.dagger_update_freq) == 0
        # the env's prior follows the learner's EMA
        es = es._replace(prior_parameters=ts.prior_parameters)
        ts, es, disc_hist, trs, roll_m = self.rollout(
            ts, es, disc_hist, hist_encoding, grid)

        last_values = self.ac.apply(ts.ac_params, es.obs_buf, method="value")
        advantages, returns = self.compute_gae(trs, last_values)

        key = ts.key
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ts = ts._replace(key=k4)
        ts, ppo_m = self.ppo_update(ts, trs, advantages, returns, k1)
        ts, disc_m = self.disc_update(ts, k2)

        def do_dagger(args):
            ts_, = args
            ts2, _ = self.dagger_update(ts_, trs, k3)
            return ts2

        ts = jax.lax.cond(hist_encoding, lambda a: do_dagger(a), lambda a: a[0], (ts,))
        # task-obs weight decay (runner :224-225)
        ncfg = self.env.cfg.normalization
        if ncfg.task_obs_weight_decay and ncfg.task_obs_weight_decay_steps:
            ts = ts._replace(task_obs_weight=jnp.maximum(
                0.0, ts.task_obs_weight - 1.0 / ncfg.task_obs_weight_decay_steps))
        metrics = {**{f"rollout/{k}": v for k, v in roll_m.items()}, **ppo_m, **disc_m}
        return ts, es, disc_hist, metrics
