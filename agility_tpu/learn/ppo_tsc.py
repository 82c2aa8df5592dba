"""TSC teacher training: hybrid-action PPO over the hierarchical env with a
frozen BBC low-level policy and frozen BBC discriminator style reward.

Functional re-design of tsc/rsl_rl/algorithms/ppo.py + the learn_RL loop in
tsc/rsl_rl/runners/on_policy_runner.py:149-276: one jitted train iteration =
24-step scanned rollout (TSC act -> set_commands -> frozen BBC act ->
env.step -> frozen-disc reward mix) + GAE + PPO minibatch scan (separate
discrete/continuous surrogates) + estimator update + DAgger pass.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from agility_tpu.envs.go2_agility import AgilityState, Go2AgilityEnv
from agility_tpu.learn import networks as nets
from agility_tpu.learn import networks_tsc as tnets


@dataclasses.dataclass(frozen=True)
class TscAlgoCfg:
    # tsc config LeggedRobotCfgPPO :388-449
    learning_rate: float = 5e-4
    lr_estimator: float = 1e-4
    value_loss_coef: float = 1.0
    entropy_coef: float = 0.01
    clip_param: float = 0.2
    gamma: float = 0.99
    lam: float = 0.95
    desired_kl: float = 0.01
    max_grad_norm: float = 1.0
    use_clipped_value_loss: bool = True
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    num_steps_per_env: int = 24
    dagger_update_freq: int = 20
    priv_reg_coef_schedule: Tuple[float, float, float, float] = (0, 0.1, 500, 1000)
    # continuous-head exploration floor: the hybrid policy's learned std
    # collapses under the course's harshly negative advantage tail
    # (termination -50, collision -20 — observed round 4: entropy 2.1 ->
    # negative within 6k iterations, success EMA 0.055 -> 0.008).  The
    # reference manages this manually via reset_std on resume
    # (tsc task_registry.py:130, policy.continue_from_last_std); the BBC
    # stack's min-std clamp (gail.py:522-523) is the same mechanism —
    # applied here after each PPO update.  0 disables.
    min_std: float = 0.15
    # frozen-disc reward mix (runner cfg :443-449)
    reward_i_coef: float = 0.05
    reward_t_coef: float = 2.0
    disc_loss_function: str = "MSELoss"


class BBCFrozen(NamedTuple):
    """Frozen BBC artifacts (the BBC->TSC weight handoff; reference
    task_registry.py:134-135 + runner.load_bbc :610-661)."""
    ac_params: Any
    est_params: Any
    disc_params: Any
    disc_norm: Any


class TscTrainState(NamedTuple):
    ac_params: Any
    ac_opt: Any
    lr: jnp.ndarray
    hist_opt: Any
    est_params: Any
    est_opt: Any
    priv_reg_counter: jnp.ndarray
    key: jnp.ndarray


class TscTransition(NamedTuple):
    obs: jnp.ndarray
    actions: jnp.ndarray         # (N, 1 + D*C)
    rewards: jnp.ndarray
    dones: jnp.ndarray
    values: jnp.ndarray
    logp_d: jnp.ndarray
    logp_c: jnp.ndarray
    mean: jnp.ndarray
    std: jnp.ndarray


class TscPPO:
    def __init__(self, env: Go2AgilityEnv, bbc: BBCFrozen,
                 cfg: TscAlgoCfg = TscAlgoCfg(), seed: int = 1):
        self.env = env
        self.cfg = cfg
        self.bbc = bbc
        ecfg = env.cfg.env
        self.slices = tnets.TscObsSlices(
            ecfg.n_proprio, ecfg.n_scan, ecfg.n_priv, ecfg.n_priv_latent,
            ecfg.history_len, ecfg.n_auxiliary)
        self.ac = tnets.ActorCriticTSC(
            num_actions_d=ecfg.num_actions_d, num_actions_c=ecfg.num_actions_c,
            slices=self.slices)
        self.estimator = nets.Estimator(output_dim=ecfg.n_priv)
        # the frozen BBC actor reads the 671-d obs_bbc layout
        self.bbc_slices = nets.ObsSlices(57, 4, 29, 10, 11)
        self.bbc_ac = nets.ActorCritic(num_actions=12, slices=self.bbc_slices)
        self.bbc_disc = nets.Discriminator(dim_c=env.dim_c)

        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        obs0 = jnp.zeros((1, self.slices.total))
        ac_params = self.ac.init(k1, obs0, obs0)
        # estimator: initialized from the BBC's (load_estimator_bbc=True)
        est_params = bbc.est_params if bbc.est_params is not None else \
            self.estimator.init(k2, jnp.zeros((1, 57)))

        self.opt_ac = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate))
        self.opt_hist = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr_estimator))
        self.opt_est = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr_estimator))
        self._ac_params0 = ac_params
        self._est_params0 = est_params

    def init_train_state(self, key) -> TscTrainState:
        return TscTrainState(
            ac_params=self._ac_params0,
            ac_opt=self.opt_ac.init(self._ac_params0),
            lr=jnp.asarray(self.cfg.learning_rate, jnp.float32),
            hist_opt=self.opt_hist.init(self._ac_params0["params"]["history_encoder"]),
            est_params=self._est_params0,
            est_opt=self.opt_est.init(self._est_params0),
            priv_reg_counter=jnp.zeros((), jnp.int32),
            key=key)

    # ------------------------------------------------------------------

    def disc_reward(self, obs_bbc, disc_hist, task_reward):
        """Frozen-disc style reward mix (tsc discriminator.py:13-108):
        r = 0.05 * r_i + 2.0 * r_t."""
        cfg = self.cfg
        x = disc_hist.reshape(disc_hist.shape[0], -1)
        x = nets.RunningNormalizer.normalize(self.bbc.disc_norm, x)
        d, _, _ = self.bbc_disc.apply(self.bbc.disc_params, x)
        if cfg.disc_loss_function == "MSELoss":
            r_i = jnp.maximum(1.0 - 0.25 * jnp.square(d[:, 0] - 1.0), 0.0)
        else:
            r_i = -jnp.log(jnp.maximum(1.0 - jax.nn.sigmoid(d[:, 0]), 1e-4))
        r_i = r_i * self.env.dt
        total = cfg.reward_i_coef * r_i + cfg.reward_t_coef * task_reward
        return total, r_i

    def bbc_act(self, obs_bbc, next_commands):
        """Frozen BBC inference with the HL's fresh commands swapped in
        (runner :205-207)."""
        obs = obs_bbc.at[:, -next_commands.shape[1]:].set(next_commands)
        return self.bbc_ac.apply(self.bbc.ac_params, obs, method="action_mean",
                                 hist_encoding=True)

    # ------------------------------------------------------------------

    def rollout(self, ts: TscTrainState, es: AgilityState, disc_hist, hist_encoding,
                grid=None):
        cfg = self.cfg
        s = self.slices

        def step(carry, _):
            es, disc_hist, key = carry
            key, k_act = jax.random.split(key)
            obs = es.obs_buf
            obs_bbc = es.obs_bbc_buf
            est = self.estimator.apply(ts.est_params, obs[:, :57])
            obs_est = obs.at[:, s.explicit].set(est)
            logits_d, mean_c, std = self.ac.apply(
                ts.ac_params, obs_est, hist_encoding, method="heads_switch")
            actions = tnets.hybrid_sample(k_act, logits_d, mean_c, std)
            logp_d, logp_c = tnets.hybrid_log_prob(logits_d, mean_c, std, actions)
            values = self.ac.apply(ts.ac_params, obs, method="value")

            es2, next_commands = self.env.set_commands(es, actions)
            actions_bbc = self.bbc_act(obs_bbc, next_commands)
            es3, out = self.env.step(es2, actions_bbc, grid=grid)

            patched = jnp.where(out.reset[:, None], out.terminal_disc_obs, out.disc_obs)
            disc_hist2 = jnp.concatenate([disc_hist[:, 1:], patched[:, None]], axis=1)
            total_r, r_i = self.disc_reward(obs_bbc, disc_hist2, out.rew)
            total_r = total_r + cfg.gamma * values * out.time_out
            disc_hist3 = jnp.where(
                out.reset[:, None, None],
                jnp.repeat(out.disc_obs[:, None], disc_hist.shape[1], axis=1),
                disc_hist2)

            tr = TscTransition(
                obs=obs, actions=actions, rewards=total_r, dones=out.reset,
                values=values, logp_d=logp_d, logp_c=logp_c,
                mean=mean_c, std=jnp.broadcast_to(std, mean_c.shape))
            speed = jnp.linalg.norm(es3.sim.u[:, :3], axis=-1)
            m = dict(r_total=jnp.mean(total_r), r_t=jnp.mean(out.rew),
                     r_i=jnp.mean(r_i), done=jnp.sum(out.reset),
                     success=jnp.sum(out.reach_goal_cutoff),
                     goal_idx=jnp.mean(es3.cur_goal_idx.astype(jnp.float32)),
                     overspeed=jnp.mean((speed > 8.0).astype(jnp.float32)))
            return (es3, disc_hist3, key), (tr, m)

        (es, disc_hist, key), (trs, ms) = jax.lax.scan(
            step, (es, disc_hist, ts.key), None, length=cfg.num_steps_per_env)
        ts = ts._replace(key=key)
        metrics = {k: jnp.mean(v) for k, v in ms.items()}
        metrics["done"] = jnp.sum(ms["done"])
        metrics["success"] = jnp.sum(ms["success"])
        return ts, es, disc_hist, trs, metrics

    # ------------------------------------------------------------------

    def compute_gae(self, trs, last_values):
        cfg = self.cfg

        def scan_fn(adv_next, x):
            tr, next_value = x
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

    def ppo_update(self, ts: TscTrainState, trs, advantages, returns, key):
        cfg = self.cfg
        s = self.slices
        T, N = trs.rewards.shape
        B = T * N
        n_mb = cfg.num_mini_batches
        mb = B // n_mb
        flat = jax.tree.map(lambda x: x.reshape((B,) + x.shape[2:]), trs)
        perm = jax.random.permutation(key, B)
        gather = lambda x: x[perm].reshape((n_mb, mb) + x.shape[1:])
        batches = jax.tree.map(gather, flat)
        adv_b = gather(advantages.reshape(B))
        ret_b = gather(returns.reshape(B))

        sch = cfg.priv_reg_coef_schedule
        stage = jnp.minimum(jnp.maximum(
            ts.priv_reg_counter.astype(jnp.float32) - sch[2], 0.0) / sch[3], 1.0)
        priv_reg_coef = stage * (sch[1] - sch[0]) + sch[0]

        def loss_fn(ac_params, mbt, mb_adv, mb_ret):
            logits_d, mean_c, std = self.ac.apply(ac_params, mbt.obs, method="heads",
                                                  hist_encoding=False)
            logp_d, logp_c = tnets.hybrid_log_prob(logits_d, mean_c, std, mbt.actions)
            value = self.ac.apply(ac_params, mbt.obs, method="value")
            ent_d, ent_c = tnets.hybrid_entropy(logits_d, std, mean_c.shape)

            ratio_d = jnp.exp(logp_d - mbt.logp_d)
            ratio_c = jnp.exp(logp_c - mbt.logp_c)
            surr = 0.0
            for ratio in (ratio_d, ratio_c):
                a = -mb_adv * ratio
                b = -mb_adv * jnp.clip(ratio, 1 - cfg.clip_param, 1 + cfg.clip_param)
                surr = surr + jnp.mean(jnp.maximum(a, b))

            if cfg.use_clipped_value_loss:
                v_cl = mbt.values + jnp.clip(value - mbt.values, -cfg.clip_param, cfg.clip_param)
                value_loss = jnp.mean(jnp.maximum(
                    jnp.square(value - mb_ret), jnp.square(v_cl - mb_ret)))
            else:
                value_loss = jnp.mean(jnp.square(mb_ret - value))

            priv_lat = self.ac.apply(ac_params, mbt.obs, method="priv_latent")
            hist_lat = jax.lax.stop_gradient(
                self.ac.apply(ac_params, mbt.obs, method="hist_latent"))
            priv_reg = jnp.mean(jnp.linalg.norm(priv_lat - hist_lat, axis=-1))

            total = (surr + cfg.value_loss_coef * value_loss
                     - cfg.entropy_coef * jnp.mean(ent_d + ent_c)
                     + priv_reg_coef * priv_reg)
            aux = dict(surrogate=surr, value=value_loss,
                       entropy=jnp.mean(ent_d + ent_c), priv_reg=priv_reg,
                       mean=mean_c, std=std)
            return total, aux

        def est_loss_fn(est_params, mbt):
            pred = self.estimator.apply(est_params, mbt.obs[:, :57])
            return jnp.mean(jnp.square(pred - mbt.obs[:, s.explicit]))

        def mb_step(carry, i):
            ac_params, ac_opt, lr, est_params, est_opt = carry
            j = i % n_mb
            mbt = jax.tree.map(lambda x: x[j], batches)
            el, eg = jax.value_and_grad(est_loss_fn)(est_params, mbt)
            eu, est_opt = self.opt_est.update(eg, est_opt, est_params)
            est_params = optax.apply_updates(est_params, eu)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                ac_params, mbt, adv_b[j], ret_b[j])
            kl = jnp.sum(
                jnp.log(aux["std"] / mbt.std + 1e-5)
                + (jnp.square(mbt.std) + jnp.square(mbt.mean - aux["mean"]))
                / (2.0 * jnp.square(aux["std"])) - 0.5, axis=-1)
            kl_mean = jnp.mean(kl)
            lr = jnp.where(kl_mean > cfg.desired_kl * 2.0,
                           jnp.maximum(1e-5, lr / 1.5), lr)
            lr = jnp.where((kl_mean < cfg.desired_kl / 2.0) & (kl_mean > 0.0),
                           jnp.minimum(1e-2, lr * 1.5), lr)
            inj = ac_opt[1]._replace(
                hyperparams={**ac_opt[1].hyperparams, "learning_rate": lr})
            ac_opt = (ac_opt[0], inj)
            u, ac_opt = self.opt_ac.update(grads, ac_opt, ac_params)
            ac_params = optax.apply_updates(ac_params, u)
            out = dict(loss=loss, est=el, kl=kl_mean,
                       **{k: aux[k] for k in ("surrogate", "value", "entropy", "priv_reg")})
            return (ac_params, ac_opt, lr, est_params, est_opt), out

        carry = (ts.ac_params, ts.ac_opt, ts.lr, ts.est_params, ts.est_opt)
        carry, outs = jax.lax.scan(
            mb_step, carry, jnp.arange(cfg.num_learning_epochs * n_mb))
        ac_params, ac_opt, lr, est_params, est_opt = carry
        if cfg.min_std > 0:
            std = jnp.maximum(ac_params["params"]["std"], cfg.min_std)
            ac_params = jax.tree_util.tree_map(lambda x: x, ac_params)
            ac_params["params"]["std"] = std
        ts = ts._replace(ac_params=ac_params, ac_opt=ac_opt, lr=lr,
                         est_params=est_params, est_opt=est_opt,
                         priv_reg_counter=ts.priv_reg_counter + 1)
        return ts, {f"ppo/{k}": jnp.mean(v) for k, v in outs.items()}

    # ------------------------------------------------------------------

    def dagger_update(self, ts: TscTrainState, trs, key):
        cfg = self.cfg
        T, N = trs.rewards.shape
        B = T * N
        n_mb = cfg.num_mini_batches
        mb = B // n_mb
        obs_b = trs.obs.reshape(B, -1)[jax.random.permutation(key, B)].reshape(n_mb, mb, -1)

        def loss_fn(hist_params, full, obs_mb):
            params = jax.tree_util.tree_map(lambda x: x, full)
            params["params"]["history_encoder"] = hist_params
            hist_lat = self.ac.apply(params, obs_mb, method="hist_latent")
            priv_lat = jax.lax.stop_gradient(
                self.ac.apply(params, obs_mb, method="priv_latent"))
            return jnp.mean(jnp.linalg.norm(priv_lat - hist_lat, axis=-1))

        def mb_step(carry, i):
            ac_params, hopt = carry
            hist_params = ac_params["params"]["history_encoder"]
            l, g = jax.value_and_grad(loss_fn)(hist_params, ac_params, obs_b[i % n_mb])
            u, hopt = self.opt_hist.update(g, hopt, hist_params)
            hist_params = optax.apply_updates(hist_params, u)
            ac_params = jax.tree_util.tree_map(lambda x: x, ac_params)
            ac_params["params"]["history_encoder"] = hist_params
            return (ac_params, hopt), l

        carry, losses = jax.lax.scan(
            mb_step, (ts.ac_params, ts.hist_opt),
            jnp.arange(cfg.num_learning_epochs * n_mb))
        ac_params, hopt = carry
        return ts._replace(ac_params=ac_params, hist_opt=hopt,
                           priv_reg_counter=ts.priv_reg_counter + 1), jnp.mean(losses)

    # ------------------------------------------------------------------

    def train_iteration(self, ts: TscTrainState, es: AgilityState, disc_hist, it,
                        grid=None):
        """`grid`: jit-argument world carrying the band stacks (jitwrap)."""
        hist_encoding = (it % self.cfg.dagger_update_freq) == 0
        ts, es, disc_hist, trs, roll_m = self.rollout(
            ts, es, disc_hist, hist_encoding, grid)
        last_values = self.ac.apply(ts.ac_params, es.obs_buf, method="value")
        advantages, returns = self.compute_gae(trs, last_values)
        k1, k2, k3 = jax.random.split(ts.key, 3)
        ts = ts._replace(key=k3)
        ts, ppo_m = self.ppo_update(ts, trs, advantages, returns, k1)
        ts = jax.lax.cond(
            hist_encoding,
            lambda a: self.dagger_update(a[0], trs, k2)[0],
            lambda a: a[0], (ts,))
        metrics = {**{f"rollout/{k}": v for k, v in roll_m.items()}, **ppo_m}
        return ts, es, disc_hist, metrics
