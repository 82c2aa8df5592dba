"""Recurrent actor-critic variant (reference bbc/rsl_rl/modules/
actor_critic_recurrent.py — registered but unused by the go2 tasks; provided
for capability parity).  Wraps the BBC ActorCritic behind an LSTM/GRU memory
over observations."""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from agility_tpu.learn.networks import MLP, ObsSlices


class Memory(nn.Module):
    """Single-layer recurrent memory (reference Memory :60-89)."""
    hidden_size: int = 256
    rnn_type: str = "lstm"    # "lstm" | "gru"

    @nn.compact
    def __call__(self, x, carry):
        cell = (nn.OptimizedLSTMCell(self.hidden_size) if self.rnn_type == "lstm"
                else nn.GRUCell(self.hidden_size))
        carry, y = cell(carry, x)
        return y, carry

    def initialize_carry(self, batch: int):
        if self.rnn_type == "lstm":
            return (jnp.zeros((batch, self.hidden_size)),
                    jnp.zeros((batch, self.hidden_size)))
        return jnp.zeros((batch, self.hidden_size))


class ActorCriticRecurrent(nn.Module):
    """Memory-augmented actor-critic: obs -> RNN -> MLP heads."""
    num_actions: int = 12
    num_obs: int = 671
    hidden_size: int = 256
    rnn_type: str = "lstm"
    actor_hidden: Sequence[int] = (256, 128)
    critic_hidden: Sequence[int] = (256, 128)
    init_noise_std: float = 1.0

    def setup(self):
        self.memory_a = Memory(self.hidden_size, self.rnn_type, name="memory_a")
        self.memory_c = Memory(self.hidden_size, self.rnn_type, name="memory_c")
        self.actor = MLP(tuple(self.actor_hidden) + (self.num_actions,), name="actor")
        self.critic = MLP(tuple(self.critic_hidden) + (1,), name="critic")
        self.std_param = self.param(
            "std", lambda k: jnp.full((self.num_actions,), self.init_noise_std))

    def __call__(self, obs, critic_obs, carry_a, carry_c):
        ya, carry_a = self.memory_a(obs, carry_a)
        yc, carry_c = self.memory_c(critic_obs, carry_c)
        mean = self.actor(ya)
        value = self.critic(yc)[..., 0]
        return mean, self.std_param, value, carry_a, carry_c

    def init_carries(self, batch: int):
        return (self.memory_a.initialize_carry(batch),
                self.memory_c.initialize_carry(batch))


def reset_carry(carry, dones):
    """Zero recurrent state for done envs (reference reset(dones))."""
    mask = 1.0 - dones.astype(jnp.float32)[:, None]
    return jax.tree.map(lambda c: c * mask, carry)
