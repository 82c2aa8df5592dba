"""On-policy training runner for the BBC stack.

Python-side orchestration around the fully-jitted `train_iteration`
(reference: bbc/rsl_rl/runners/on_policy_runner.py).  Keeps wall-clock
collection/learn counters, TensorBoard scalars, periodic checkpoints, and
episode-statistic ring buffers — everything else runs on device.
"""
from __future__ import annotations

import os
import time
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv
from agility_tpu.io import checkpoint as ckpt
from agility_tpu.io.metrics import MetricWriter
from agility_tpu.learn.jitwrap import jit_with_world
from agility_tpu.learn.ssinfogail import AlgoCfg, SSInfoGAIL


class OnPolicyRunner:
    def __init__(self, env: Go2LocomotionEnv, algo_cfg: AlgoCfg = AlgoCfg(),
                 log_dir: Optional[str] = None, seed: int = 1, mesh=None):
        """`mesh`: optional jax.sharding.Mesh with an ("env",) axis — envs
        are sharded along it and parameters replicated (pure data
        parallelism; SURVEY §5 distributed backend).  Build it with
        dist.mesh.make_mesh(); on a multi-host slice call
        jax.distributed.initialize() first (cli/train_bbc.py --multihost)."""
        self.env = env
        self.alg = SSInfoGAIL(env, algo_cfg, seed=seed)
        self.cfg = algo_cfg
        self.log_dir = log_dir
        self.writer = MetricWriter(log_dir) if log_dir else None
        self.save_interval = 100        # slim model checkpoint (reference cadence)
        self.full_save_interval = 1000  # full exact-resume state (big: ring + env)
        # rotation for long campaigns: keep the newest few of each artifact
        # plus slim milestones every keep_every steps (io/checkpoint.prune)
        self.keep_latest_slim = 5
        self.keep_every_slim = 5000
        self.keep_latest_full = 2
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
            self._shard_states()
        self._iter = jit_with_world(self.alg.train_iteration, env)

    def _shard_states(self):
        """Place env state on the ("env",) mesh axis, replicate the train
        state; GSPMD propagates the layout through train_iteration and
        inserts the cross-device reductions (advantage normalization,
        metric means) over ICI."""
        from agility_tpu.dist import mesh as dist_mesh

        n = self.env.num_envs
        self.env_state = dist_mesh.shard_env_tree(self.env_state, self.mesh, n)
        self.disc_hist = jax.device_put(
            self.disc_hist, dist_mesh.env_sharding(self.mesh))
        self.train_state = dist_mesh.replicate_tree(self.train_state, self.mesh)

    def learn(self, num_iterations: int, init_at_random_ep_len: bool = True,
              log_every: int = 10):
        if init_at_random_ep_len:
            key = jax.random.PRNGKey(0)
            self.env_state = self.env_state._replace(
                episode_length=jax.random.randint(
                    key, (self.env.num_envs,), 0, self.env.max_episode_length))

        rew_buf = deque(maxlen=100)
        t_start = time.time()
        steps_per_iter = self.cfg.num_steps_per_env * self.env.num_envs
        profile_dir = os.environ.get("AGILITY_PROFILE_DIR")

        t_window = time.time()
        start_iter = self.current_iteration
        it_window = start_iter
        for it in range(start_iter, start_iter + num_iterations):
            if profile_dir and it == start_iter + 2:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and it == start_iter + 4:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {profile_dir}")
            self.train_state, self.env_state, self.disc_hist, metrics = self._iter(
                self.train_state, self.env_state, self.disc_hist, jnp.asarray(it))
            # track progress as we go so mid-run checkpoints carry the TRUE
            # iteration (a crash-resume must not renumber from 0 — rotation
            # and the watchdog's resume step math depend on it)
            self.current_iteration = it + 1
            if (it + 1) % log_every == 0 or it == start_iter:
                metrics = jax.device_get(metrics)   # drains the async queue
                now = time.time()
                fps = (it + 1 - it_window) * steps_per_iter / max(now - t_window, 1e-9)
                t_window, it_window = now, it + 1
                rew_buf.append(float(metrics["rollout/r_total"]))
                if self.writer:
                    self.writer.scalars(metrics, it)
                    self.writer.scalar("perf/fps", fps, it)
                    self.writer.flush()
                print(f"it {it:6d} | r_total {metrics['rollout/r_total']:+.4f} "
                      f"| r_t {metrics['rollout/r_t']:+.4f} "
                      f"| surr {metrics['ppo/surrogate']:+.4f} "
                      f"| disc {metrics['disc/disc']:.4f} "
                      f"| fps {fps:,.0f}", flush=True)
            if self.log_dir and (it + 1) % self.save_interval == 0:
                self.save(it + 1,
                          full=(it + 1) % self.full_save_interval == 0)
        if self.log_dir:
            self.save(self.current_iteration)   # final save: exact-resume
        total = time.time() - t_start
        print(f"trained {num_iterations} iters in {total:.1f}s "
              f"({num_iterations * steps_per_iter / total:,.0f} env-steps/s)")

    # ------------------------------------------------------------------

    def checkpoint_tree(self):
        """Slim eval/handoff artifact: what play + the BBC->TSC frozen-weight
        handoff need (tsc task_registry loads policy/disc/normalizer only)."""
        ts = self.train_state
        return {
            "ac_params": ts.ac_params,
            "est_params": ts.est_params,
            "disc_params": ts.disc_params,
            "disc_norm": ts.disc_norm,
            "prior_parameters": ts.prior_parameters,
            "lr_ac": ts.lr_ac,
            "iteration": jnp.asarray(self.current_iteration),
        }

    def full_state_tree(self):
        """Everything needed for exact resume — the analogue of the
        reference's 6-optimizer checkpoint dict (bbc/rsl_rl/runners/
        on_policy_runner.py:306-339), plus env state and the disc window so
        a restart continues bit-identically: TrainState carries all optimizer
        states, the disc replay ring, learning/priv-reg counters,
        task_obs_weight, and the PRNG key."""
        return {
            "train_state": self.train_state,
            "env_state": self.env_state,
            "disc_hist": self.disc_hist,
            "iteration": jnp.asarray(self.current_iteration),
        }

    def save(self, step: int, full: bool = True):
        """Slim model checkpoint (the reference's dict contents) every call;
        the full exact-resume state (which includes the ~N*ring-sized disc
        replay ring and env state) only when `full` — pulling it from the
        device synchronously costs seconds per save on a remote-attached
        accelerator (measured: sustained fps halved at 4096 envs with
        full-state saves every 100 iters)."""
        path = ckpt.save(os.path.join(self.log_dir, "model.msgpack"),
                         jax.device_get(self.checkpoint_tree()), step=step)
        ckpt.prune(self.log_dir, "model", keep_latest=self.keep_latest_slim,
                   keep_every=self.keep_every_slim)
        if full:
            ckpt.save(os.path.join(self.log_dir, "state.msgpack"),
                      jax.device_get(self.full_state_tree()), step=step)
            ckpt.prune(self.log_dir, "state",
                       keep_latest=self.keep_latest_full)
        return path

    def load(self, path: str):
        """Restore from a model checkpoint path; prefers the sibling full
        TrainState artifact (exact resume), falls back to the slim tree."""
        state_path = ckpt.sibling_state(path)
        if state_path:
            # exact resume requires matching config (env count, buffer sizes);
            # eval-time loads with different shapes fall through to the slim
            # artifact, like the reference's weights-only load
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
        ts = self.train_state
        self.train_state = ts._replace(
            ac_params=restored["ac_params"],
            est_params=restored["est_params"],
            disc_params=restored["disc_params"],
            disc_norm=restored["disc_norm"],
            prior_parameters=jnp.asarray(restored["prior_parameters"]),
            lr_ac=jnp.asarray(restored["lr_ac"]),
        )
        self.current_iteration = max(
            int(restored["iteration"]), ckpt.step_of(path) or 0)
        # Slim checkpoints don't carry task_obs_weight; it is a pure function
        # of the iteration count (1 -> 0 over task_obs_weight_decay_steps,
        # bbc on_policy_runner.py:224-225), so derive it rather than letting
        # a weights-only resume restart the decay from 1.0 — at >50k iters
        # that would re-feed the velocity channels to a discriminator that
        # already finished the decay.
        ncfg = self.env.cfg.normalization
        if ncfg.task_obs_weight_decay and ncfg.task_obs_weight_decay_steps:
            w = max(0.0, 1.0 - self.current_iteration
                    / ncfg.task_obs_weight_decay_steps)
            self.train_state = self.train_state._replace(
                task_obs_weight=jnp.asarray(w, jnp.float32))

    def get_inference_policy(self):
        """Deterministic policy (hist-encoded latent), like the reference's
        get_inference_policy -> act_inference."""
        ac = self.alg.ac
        params = self.train_state.ac_params
        est = self.alg.estimator
        est_params = self.train_state.est_params
        s = self.alg.slices

        @jax.jit
        def policy(obs):
            pred = est.apply(est_params, obs[:, s.prop])
            obs = obs.at[:, s.explicit].set(pred)
            return ac.apply(params, obs, method="action_mean", hist_encoding=True)

        return policy
