"""Vectorized-environment interface (the reference's VecEnv ABC,
bbc/rsl_rl/env/vec_env.py:7-36, re-expressed functionally).

Envs here are static objects with pure state-transition methods; runners
depend only on this protocol:

  init_state(key) -> State                       (full reset)
  step(state, actions) -> (State, StepOutput)    (masked resets inside)

with `StepOutput` carrying at least obs / rew / reset / time_out, and the
env exposing `num_envs`, `dt`, and `max_episode_length`.
"""
from __future__ import annotations

from typing import Any, Protocol, Tuple, runtime_checkable


@runtime_checkable
class VectorEnv(Protocol):
    num_envs: int
    dt: float
    max_episode_length: int

    def init_state(self, key) -> Any: ...

    def step(self, state, actions) -> Tuple[Any, Any]: ...
