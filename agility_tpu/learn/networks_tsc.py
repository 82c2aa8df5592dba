"""TSC policy networks (flax): hybrid discrete x continuous actor with scan
encoder (reference tsc/rsl_rl/modules/actor_critic.py: Actor :102-155,
ActorCriticTSC :252-275)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from agility_tpu.learn.networks import MLP, StateHistoryEncoder


class TscObsSlices:
    """[prop 65 | scan 132 | explicit 4 | latent 29 | hist 570]"""

    def __init__(self, n_proprio=65, n_scan=132, n_priv=4, n_priv_latent=29,
                 num_hist=10, n_auxiliary=8):
        self.n_proprio = n_proprio
        self.n_scan = n_scan
        self.n_priv = n_priv
        self.n_priv_latent = n_priv_latent
        self.num_hist = num_hist
        self.n_prop_hist = n_proprio - n_auxiliary       # 57
        o = 0
        self.prop = slice(o, o + n_proprio); o += n_proprio
        self.scan = slice(o, o + n_scan); o += n_scan
        self.explicit = slice(o, o + n_priv); o += n_priv
        self.latent = slice(o, o + n_priv_latent); o += n_priv_latent
        self.hist = slice(o, o + num_hist * self.n_prop_hist); o += num_hist * self.n_prop_hist
        self.total = o


class ActorCriticTSC(nn.Module):
    num_actions_d: int = 3
    num_actions_c: int = 6
    slices: TscObsSlices = None
    scan_encoder_dims: Sequence[int] = (128, 64, 32)
    actor_hidden: Sequence[int] = (512, 256, 128)
    critic_hidden: Sequence[int] = (512, 256, 128)
    priv_encoder_dims: Sequence[int] = (64,)
    init_noise_std: float = 1.0

    def setup(self):
        s = self.slices
        self.priv_encoder = MLP(tuple(self.priv_encoder_dims) + (s.n_priv_latent,),
                                activate_last=True, name="priv_encoder")
        self.history_encoder = StateHistoryEncoder(
            s.n_prop_hist, s.num_hist, s.n_priv_latent, name="history_encoder")
        self.scan_encoder = ScanEncoder(self.scan_encoder_dims, name="scan_encoder")
        self.actor_trunk = MLP(self.actor_hidden, activate_last=True, name="actor_trunk")
        self.actor_d = nn.Dense(self.num_actions_d, name="actor_d")
        self.actor_c = nn.Dense(self.num_actions_d * self.num_actions_c, name="actor_c")
        self.critic_trunk = MLP(self.critic_hidden, activate_last=True, name="critic_trunk")
        self.critic_head = nn.Dense(1, name="critic_head")
        self.std_param = self.param(
            "std", lambda k: jnp.full((self.num_actions_d * self.num_actions_c,),
                                      self.init_noise_std, jnp.float32))

    def _latent(self, obs, hist_encoding):
        s = self.slices
        if hist_encoding:
            hist = obs[..., s.hist].reshape(
                obs.shape[:-1] + (s.num_hist, s.n_prop_hist))
            return self.history_encoder(hist)
        return self.priv_encoder(obs[..., s.latent])

    def embed(self, obs, hist_encoding: bool = False, scandots_latent=None):
        s = self.slices
        scan_latent = (self.scan_encoder(obs[..., s.scan])
                       if scandots_latent is None else scandots_latent)
        latent = self._latent(obs, hist_encoding)
        x = jnp.concatenate(
            [obs[..., s.prop], scan_latent, obs[..., s.explicit], latent], -1)
        return self.actor_trunk(x)

    def heads(self, obs, hist_encoding: bool = False, scandots_latent=None):
        """Returns (logits_d (.., D), mean_c (.., D*C), std (D*C,))."""
        emb = self.embed(obs, hist_encoding, scandots_latent)
        return self.actor_d(emb), self.actor_c(emb), self.std_param

    def heads_switch(self, obs, hist_flag, scandots_latent=None):
        """heads() with the DAgger latent switch as a TRACED scalar: both
        (small) latent encoders run, the scan encoder + trunk + heads run
        once — bit-identical to jnp.where over the two heads() variants at
        ~half the actor FLOPs (see networks.ActorCritic.action_mean_switch)."""
        s = self.slices
        scan_latent = (self.scan_encoder(obs[..., s.scan])
                       if scandots_latent is None else scandots_latent)
        latent = jnp.where(hist_flag, self._latent(obs, True),
                           self._latent(obs, False))
        x = jnp.concatenate(
            [obs[..., s.prop], scan_latent, obs[..., s.explicit], latent], -1)
        emb = self.actor_trunk(x)
        return self.actor_d(emb), self.actor_c(emb), self.std_param

    def scan_latent(self, obs):
        return self.scan_encoder(obs[..., self.slices.scan])

    def hist_latent(self, obs):
        return self._latent(obs, True)

    def priv_latent(self, obs):
        return self._latent(obs, False)

    def value(self, critic_obs):
        return self.critic_head(self.critic_trunk(critic_obs))[..., 0]

    def __call__(self, obs, critic_obs):
        self._latent(obs, True)
        self._latent(obs, False)
        d, c, std = self.heads(obs, False)
        return d, c, std, self.value(critic_obs)


class ScanEncoder(nn.Module):
    dims: Sequence[int] = (128, 64, 32)

    @nn.compact
    def __call__(self, x):
        for i, dim in enumerate(self.dims):
            x = nn.Dense(dim)(x)
            x = jnp.tanh(x) if i == len(self.dims) - 1 else nn.elu(x)
        return x


def hybrid_sample(key, logits_d, mean_c, std):
    kd, kc = jax.random.split(key)
    d = jax.random.categorical(kd, logits_d, axis=-1)
    c = mean_c + std * jax.random.normal(kc, mean_c.shape)
    return jnp.concatenate([d[..., None].astype(mean_c.dtype), c], axis=-1)


def hybrid_log_prob(logits_d, mean_c, std, actions):
    """(logp_d, logp_c) for actions [d | c...] (reference ppo.py:221-234:
    the continuous log-prob sums over the full D*C head)."""
    d = actions[..., 0].astype(jnp.int32)
    c = actions[..., 1:]
    logp_all = jax.nn.log_softmax(logits_d, axis=-1)
    logp_d = jnp.take_along_axis(logp_all, d[..., None], axis=-1)[..., 0]
    var = std**2
    logp_c = jnp.sum(
        -0.5 * jnp.square(c - mean_c) / var - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1)
    return logp_d, logp_c


def hybrid_entropy(logits_d, std, mean_shape):
    p = jax.nn.softmax(logits_d, axis=-1)
    ent_d = -jnp.sum(p * jnp.log(p + 1e-20), axis=-1)
    # reference entropy_c is the MEAN over dims (actor_critic.py:231)
    ent_c = jnp.mean(
        (0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std)) * jnp.ones(mean_shape), axis=-1)
    return ent_d, ent_c
