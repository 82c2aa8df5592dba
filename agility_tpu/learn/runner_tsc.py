"""TSC teacher training runner (reference tsc/rsl_rl/runners/
on_policy_runner.py learn_RL) plus the BBC->TSC frozen-weight handoff."""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp

from agility_tpu.envs.go2_agility import Go2AgilityEnv
from agility_tpu.io import checkpoint as ckpt
from agility_tpu.io.metrics import MetricWriter
from agility_tpu.learn.jitwrap import jit_with_world
from agility_tpu.learn import networks as nets
from agility_tpu.learn.ppo_tsc import BBCFrozen, TscAlgoCfg, TscPPO


def load_bbc_frozen(path: Optional[str], seed: int = 0) -> BBCFrozen:
    """Load the frozen BBC policy/estimator/discriminator/normalizer from a
    BBC checkpoint (the analogue of tsc runner.load_bbc :610-661 reading
    weights/bbc/model.pt).  With no path, fresh-initialized weights are used
    (untrained low-level controller — for tests/smoke only)."""
    slices = nets.ObsSlices(57, 4, 29, 10, 11)
    ac = nets.ActorCritic(num_actions=12, slices=slices)
    est = nets.Estimator(output_dim=4)
    disc = nets.Discriminator(dim_c=5)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    obs0 = jnp.zeros((1, slices.total))
    template = {
        "ac_params": ac.init(k1, obs0, obs0),
        "est_params": est.init(k2, jnp.zeros((1, 57))),
        "disc_params": disc.init(k3, jnp.zeros((1, 98))),
        "disc_norm": nets.RunningNormalizer.init(98),
        "prior_parameters": jnp.full((5,), 0.2),
        "lr_ac": jnp.asarray(1e-3),
        "iteration": jnp.asarray(0),
    }
    if path:
        template = ckpt.load_into(path, jax.device_get(template))
    return BBCFrozen(
        ac_params=template["ac_params"],
        est_params=template["est_params"],
        disc_params=template["disc_params"],
        disc_norm=jax.tree.map(jnp.asarray, template["disc_norm"]),
    )


class TscOnPolicyRunner:
    def __init__(self, env: Go2AgilityEnv, bbc: BBCFrozen,
                 algo_cfg: TscAlgoCfg = TscAlgoCfg(),
                 log_dir: Optional[str] = None, seed: int = 1, mesh=None):
        """`mesh`: optional ("env",) jax.sharding.Mesh — env-axis data
        parallelism as in OnPolicyRunner (cli/train_tsc.py --multihost)."""
        self.env = env
        self.alg = TscPPO(env, bbc, algo_cfg, seed=seed)
        self.cfg = algo_cfg
        self.log_dir = log_dir
        self.writer = MetricWriter(log_dir) if log_dir else None
        self.save_interval = 100        # slim model checkpoint
        self.full_save_interval = 1000  # full exact-resume state (big)
        self.current_iteration = 0
        self.mesh = mesh

        key = jax.random.PRNGKey(seed)
        k_env, k_train = jax.random.split(key)
        # jitted init: eager construction dispatches thousands of tiny ops
        # (minutes over a remote-device tunnel); one compiled program is
        # cacheable and fast
        self.env_state = jit_with_world(env.init_state, env)(k_env)
        self.train_state = jax.jit(self.alg.init_train_state)(k_train)
        self.disc_hist = jnp.repeat(
            self.env_state.disc_obs[:, None], env.cfg.env.disc_obs_len, axis=1)
        if mesh is not None:
            from agility_tpu.dist import mesh as dist_mesh

            n = env.num_envs
            self.env_state = dist_mesh.shard_env_tree(self.env_state, mesh, n)
            self.disc_hist = jax.device_put(
                self.disc_hist, dist_mesh.env_sharding(mesh))
            self.train_state = dist_mesh.replicate_tree(self.train_state, mesh)
        self._iter = jit_with_world(self.alg.train_iteration, env)

    def learn(self, num_iterations: int, log_every: int = 10):
        steps_per_iter = self.cfg.num_steps_per_env * self.env.num_envs
        t_start = time.time()
        t_window = time.time()
        start_iter = self.current_iteration
        it_window = start_iter
        for it in range(start_iter, start_iter + num_iterations):
            self.train_state, self.env_state, self.disc_hist, metrics = self._iter(
                self.train_state, self.env_state, self.disc_hist, jnp.asarray(it))
            # mid-run checkpoints must carry the TRUE iteration (crash
            # resume; see runner.py)
            self.current_iteration = it + 1
            if (it + 1) % log_every == 0 or it == start_iter:
                metrics = jax.device_get(metrics)
                now = time.time()
                fps = (it + 1 - it_window) * steps_per_iter / max(now - t_window, 1e-9)
                t_window, it_window = now, it + 1
                if self.writer:
                    self.writer.scalars(metrics, it)
                    self.writer.scalar("perf/fps", fps, it)
                    self.writer.scalar(
                        "Train/mean_success_rate",
                        float(self.env_state.success_rate), it)
                    # from-station-0 scoreboard (r5): spawn-luck-free
                    self.writer.scalar(
                        "Train/success_rate_from_start",
                        float(self.env_state.success_rate_s0), it)
                    self.writer.scalar(
                        "Train/goal_progress",
                        float(self.env_state.goal_progress), it)
                    self.writer.flush()
                print(f"it {it:6d} | r {metrics['rollout/r_total']:+.4f} "
                      f"| r_t {metrics['rollout/r_t']:+.4f} "
                      f"| goal {metrics['rollout/goal_idx']:.2f} "
                      f"| succ {float(self.env_state.success_rate):.3f} "
                      f"| succ0 {float(self.env_state.success_rate_s0):.3f} "
                      f"| prog {float(self.env_state.goal_progress):.2f} "
                      f"| fps {fps:,.0f}", flush=True)
            if self.log_dir and (it + 1) % self.save_interval == 0:
                self.save(it + 1,
                          full=(it + 1) % self.full_save_interval == 0)
        if self.log_dir:
            self.save(self.current_iteration)   # final save: exact-resume
        total = time.time() - t_start
        print(f"trained {num_iterations} iters in {total:.1f}s "
              f"({num_iterations * steps_per_iter / total:,.0f} env-steps/s)")

    def checkpoint_tree(self):
        """Slim eval artifact (teacher policy + estimator)."""
        ts = self.train_state
        return {
            "ac_params": ts.ac_params,
            "est_params": ts.est_params,
            "lr": ts.lr,
            "iteration": jnp.asarray(self.current_iteration),
        }

    def full_state_tree(self):
        """Exact-resume artifact: full TrainState (optimizers, counters) +
        env state + disc window — tsc on_policy_runner.py:610-661 contents
        plus sim continuity."""
        return {
            "train_state": self.train_state,
            "env_state": self.env_state,
            "disc_hist": self.disc_hist,
            "iteration": jnp.asarray(self.current_iteration),
        }

    def save(self, step: int, full: bool = True):
        """Slim model checkpoint every call; the full exact-resume state
        (disc window + env state + optimizers) only when `full` — the
        synchronous device pull is seconds-expensive on a remote-attached
        accelerator (see runner.py:save)."""
        path = ckpt.save(os.path.join(self.log_dir, "model.msgpack"),
                         jax.device_get(self.checkpoint_tree()), step=step)
        ckpt.prune(self.log_dir, "model", keep_latest=5, keep_every=5000)
        if full:
            ckpt.save(os.path.join(self.log_dir, "state.msgpack"),
                      jax.device_get(self.full_state_tree()), step=step)
            ckpt.prune(self.log_dir, "state", keep_latest=2)
        return path

    def load(self, path: str):
        state_path = ckpt.sibling_state(path)
        if state_path:
            try:
                restored = ckpt.load_into_strict(
                    state_path, jax.device_get(self.full_state_tree()))
                dev = lambda t: jax.tree.map(jnp.asarray, t)
                self.train_state = dev(restored["train_state"])
                self.env_state = dev(restored["env_state"])
                self.disc_hist = jnp.asarray(restored["disc_hist"])
                self.current_iteration = max(
                    int(restored["iteration"]), ckpt.step_of(path) or 0)
                return
            except (ValueError, KeyError) as e:
                print(f"full-state restore mismatch ({e}); loading weights only")
        restored = ckpt.load_into(path, jax.device_get(self.checkpoint_tree()))
        self.train_state = self.train_state._replace(
            ac_params=restored["ac_params"],
            est_params=restored["est_params"],
            lr=jnp.asarray(restored["lr"]))
        self.current_iteration = max(
            int(restored["iteration"]), ckpt.step_of(path) or 0)
