"""GAE vs a naive O(T^2) reference implementation (SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp

from agility_tpu.envs.config import smoke_cfg
from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv
from agility_tpu.learn.ssinfogail import AlgoCfg, SSInfoGAIL, Transition


def naive_gae(rew, done, val, last_val, gamma, lam):
    T, N = rew.shape
    adv = np.zeros((T, N))
    vals = np.concatenate([val, last_val[None]], axis=0)
    for t in range(T):
        acc = np.zeros(N)
        coeff = np.ones(N)
        for k in range(t, T):
            not_done = 1.0 - done[k]
            delta = rew[k] + gamma * vals[k + 1] * not_done - vals[k]
            acc += coeff * delta
            coeff *= gamma * lam * not_done
            # episode boundary: later deltas don't propagate back
            if (not_done == 0).all():
                break
        adv[t] = acc
    return adv


def test_gae_matches_naive(rng):
    env = Go2LocomotionEnv(smoke_cfg(num_envs=4))
    alg = SSInfoGAIL(env, AlgoCfg(num_preload_transitions=32,
                                  disc_replay_buffer_size=64))
    T, N = 12, 4
    rew = rng.normal(size=(T, N)).astype(np.float32)
    done = (rng.random((T, N)) < 0.15)
    val = rng.normal(size=(T, N)).astype(np.float32)
    last_val = rng.normal(size=N).astype(np.float32)
    z = jnp.zeros((T, N, 1))
    trs = Transition(obs=z, critic_obs=z, actions=z, rewards=jnp.asarray(rew),
                     dones=jnp.asarray(done), values=jnp.asarray(val),
                     log_prob=z[..., 0], mean=z, std=z)
    adv, ret = alg.compute_gae(trs, jnp.asarray(last_val))
    want = naive_gae(rew, done.astype(np.float32), val, last_val,
                     alg.cfg.gamma, alg.cfg.lam)
    # compute_gae returns normalized advantages; compare after normalizing
    want_n = (want - want.mean()) / (want.std() + 1e-8)
    np.testing.assert_allclose(np.asarray(adv), want_n, rtol=1e-3, atol=1e-4)
    # returns are unnormalized advantage + value
    np.testing.assert_allclose(np.asarray(ret), want + val, rtol=1e-3, atol=1e-4)
