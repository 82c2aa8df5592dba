"""agility_tpu — a TPU-native quadruped agility learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
NJU-RLC/quadrupedal-agility (see SURVEY.md): batched Go2 rigid-body physics,
legged-gym-style environments (BBC locomotion + TSC agility course), and the
rsl_rl-style PPO / SSInfoGAIL / distillation learning stack, built for SPMD
execution over TPU device meshes.

Layers (bottom-up):
  core     — quaternion/spatial math, URDF parsing, robot model constants
  physics  — batched articulated rigid-body engine + contact solver
  terrain  — heightfield / obstacle-course world generation
  envs     — pure-functional vectorized environments
  learn    — networks, PPO, SSInfoGAIL, distillation, runners
  render   — heightfield/primitive depth ray-caster (student observations)
  dist     — device-mesh sharding helpers (DP over the env axis)
  io       — checkpoints, metrics (TensorBoard-compatible event files)
  cli      — train/play entry points and the task registry
"""

__version__ = "0.1.0"
