"""Policy / value / estimator / discriminator networks (flax.linen).

Architectures mirror the reference modules (bbc/rsl_rl/modules/
actor_critic.py, estimator.py; bbc/rsl_rl/algorithms/discriminator.py) so
hyperparameters and checkpoint shapes carry over; implementation is idiomatic
flax with explicit parameter pytrees.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MLP(nn.Module):
    dims: Sequence[int]
    activation: str = "elu"
    activate_last: bool = False

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        for i, d in enumerate(self.dims):
            x = nn.Dense(d)(x)
            if i < len(self.dims) - 1 or self.activate_last:
                x = act(x)
        return x


class StateHistoryEncoder(nn.Module):
    """Per-step projection -> temporal 1D conv stack -> latent (reference
    actor_critic.py:9-59, tsteps=10 variant)."""
    num_prop: int
    tsteps: int = 10
    output_size: int = 29
    channels: int = 10

    @nn.compact
    def __call__(self, hist):  # (..., tsteps, num_prop)
        ch = self.channels
        x = nn.elu(nn.Dense(3 * ch)(hist))                     # (..., T, 30)
        if self.tsteps == 10:
            conv_spec = [(2 * ch, 4, 2), (ch, 2, 1)]
        elif self.tsteps == 20:
            conv_spec = [(2 * ch, 6, 2), (ch, 4, 2)]
        elif self.tsteps == 50:
            conv_spec = [(2 * ch, 8, 4), (ch, 5, 1), (ch, 5, 1)]
        else:
            raise ValueError("tsteps must be 10, 20 or 50")
        for feat, k, s in conv_spec:
            x = nn.elu(nn.Conv(feat, (k,), strides=(s,), padding="VALID")(x))
        x = x.reshape(x.shape[:-2] + (-1,))                    # flatten time x ch
        return nn.elu(nn.Dense(self.output_size)(x))


class ObsSlices:
    """Actor-obs layout bookkeeping: [prop | explicit | latent | hist | cmd]."""

    def __init__(self, num_prop=57, num_explicit=4, num_latent=29, num_hist=10, num_command=11):
        self.num_prop = num_prop
        self.num_explicit = num_explicit
        self.num_latent = num_latent
        self.num_hist = num_hist
        self.num_command = num_command
        o = 0
        self.prop = slice(o, o + num_prop); o += num_prop
        self.explicit = slice(o, o + num_explicit); o += num_explicit
        self.latent = slice(o, o + num_latent); o += num_latent
        self.hist = slice(o, o + num_hist * num_prop); o += num_hist * num_prop
        self.command = slice(o, o + num_command); o += num_command
        self.total = o


class ActorCritic(nn.Module):
    """BBC actor-critic (reference actor_critic.py:63-233): actor consumes
    [prop, explicit, latent*, command] where latent* is re-encoded from
    either the privileged latent or the proprio history (DAgger switch);
    critic consumes the full observation."""
    num_actions: int = 12
    slices: ObsSlices = None
    actor_hidden: Sequence[int] = (512, 256, 128)
    critic_hidden: Sequence[int] = (512, 256, 128)
    priv_encoder_dims: Sequence[int] = (64,)
    init_noise_std: float = 1.0

    def setup(self):
        s = self.slices
        self.priv_encoder = MLP(tuple(self.priv_encoder_dims) + (s.num_latent,),
                                activate_last=True, name="priv_encoder")
        self.history_encoder = StateHistoryEncoder(
            s.num_prop, s.num_hist, s.num_latent, name="history_encoder")
        self.actor_trunk = MLP(self.actor_hidden, activate_last=True, name="actor_trunk")
        self.actor_head = nn.Dense(self.num_actions, name="actor_head")
        self.critic_trunk = MLP(self.critic_hidden, activate_last=True, name="critic_trunk")
        self.critic_head = nn.Dense(1, name="critic_head")
        self.std_param = self.param(
            "std",
            lambda k: jnp.full((self.num_actions,), self.init_noise_std, jnp.float32))

    def _latent(self, obs, hist_encoding: bool):
        s = self.slices
        if hist_encoding:
            hist = obs[..., s.hist].reshape(obs.shape[:-1] + (s.num_hist, s.num_prop))
            return self.history_encoder(hist)
        return self.priv_encoder(obs[..., s.latent])

    def action_mean(self, obs, hist_encoding: bool = False):
        s = self.slices
        latent = self._latent(obs, hist_encoding)
        x = jnp.concatenate(
            [obs[..., s.prop], obs[..., s.explicit], latent, obs[..., s.command]], -1)
        return self.actor_head(self.actor_trunk(x))

    def action_mean_switch(self, obs, hist_flag):
        """action_mean with the DAgger latent switch as a TRACED scalar
        (`hist_flag`): both latent encoders run (small), the trunk runs
        once.  Bit-identical to selecting between the two action_mean
        variants, at ~half the actor FLOPs — the rollout previously ran
        the full actor twice per step and jnp.where'd the outputs."""
        s = self.slices
        latent = jnp.where(hist_flag, self._latent(obs, True),
                           self._latent(obs, False))
        x = jnp.concatenate(
            [obs[..., s.prop], obs[..., s.explicit], latent, obs[..., s.command]], -1)
        return self.actor_head(self.actor_trunk(x))

    def __call__(self, obs, critic_obs, hist_encoding: bool = False):
        # touch both latent paths so init materializes every submodule
        self._latent(obs, True)
        self._latent(obs, False)
        mean = self.action_mean(obs, hist_encoding)
        value = self.value(critic_obs)
        return mean, self.std_param, value

    def value(self, critic_obs):
        return self.critic_head(self.critic_trunk(critic_obs))[..., 0]

    def hist_latent(self, obs):
        return self._latent(obs, True)

    def priv_latent(self, obs):
        return self._latent(obs, False)


class Estimator(nn.Module):
    """prop (57) -> explicit priv state (4) (reference estimator.py)."""
    output_dim: int = 4
    hidden: Sequence[int] = (128, 64)

    @nn.compact
    def __call__(self, prop):
        return MLP(tuple(self.hidden) + (self.output_dim,))(prop)


class Discriminator(nn.Module):
    """SSInfoGAIL discriminator: shared ReLU trunk + 3 heads — real/fake
    logit, eps encoder, mode classifier (reference discriminator.py:36-69)."""
    dim_c: int = 5
    hidden: Sequence[int] = (512, 256)

    @nn.compact
    def __call__(self, x):
        for d in self.hidden:
            x = nn.relu(nn.Dense(d)(x))
        logit = nn.Dense(
            1,
            kernel_init=lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d, -1.0, 1.0),
            name="head_logit")(x)
        eps = nn.Dense(1, name="head_eps")(x)
        c = jax.nn.softmax(nn.Dense(self.dim_c, name="head_classifier")(x), axis=-1)
        return logit, eps, jnp.clip(c, 1e-20, jnp.inf)


# ---------------------------------------------------------------------------


def gaussian_log_prob(mean, std, actions):
    var = std**2
    return jnp.sum(
        -0.5 * jnp.square(actions - mean) / var - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1)


def gaussian_entropy(std):
    return jnp.sum(0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std), axis=-1)


class RunningNormalizer:
    """Running mean/std feature normalizer as a pytree (replaces the
    reference's numpy Welford Normalizer, bbc/rsl_rl/utils/utils.py:51-113).

    All leaves are strong-typed device scalars/arrays so the state's jit
    signature is a fixed point (weak types would force recompilation)."""

    CLIP = 10.0

    @staticmethod
    def init(dim):
        return {
            "mean": jnp.zeros(dim, jnp.float32),
            "var": jnp.ones(dim, jnp.float32),
            "count": jnp.asarray(1e-4, jnp.float32),
        }

    @staticmethod
    def update(state, batch):
        bmean = jnp.mean(batch, axis=0)
        bvar = jnp.var(batch, axis=0)
        bcount = batch.shape[0]
        delta = bmean - state["mean"]
        tot = state["count"] + bcount
        mean = state["mean"] + delta * bcount / tot
        m_a = state["var"] * state["count"]
        m_b = bvar * bcount
        M2 = m_a + m_b + jnp.square(delta) * state["count"] * bcount / tot
        return {**state, "mean": mean, "var": M2 / tot, "count": tot}

    @staticmethod
    def normalize(state, x):
        out = (x - state["mean"]) / jnp.sqrt(state["var"] + 1e-8)
        return jnp.clip(out, -RunningNormalizer.CLIP, RunningNormalizer.CLIP)
