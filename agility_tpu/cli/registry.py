"""Task registry: name -> (env builder, env cfg, algo cfg).

Same role and task names as the reference's task_registry
(bbc/legged_gym/utils/task_registry.py:15-148): "go2_locomotion" for the BBC
stack; the TSC task ("go2") registers from its own module.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

from agility_tpu.envs import config as bbc_config
from agility_tpu.learn.ssinfogail import AlgoCfg

_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {}


def register(name: str, make_env_cfg: Callable, make_algo_cfg: Callable):
    _REGISTRY[name] = (make_env_cfg, make_algo_cfg)


def get(name: str):
    if name not in _REGISTRY:
        raise KeyError(f"unknown task {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def names():
    return sorted(_REGISTRY)


def _tsc_cfg():
    from agility_tpu.envs.tsc_config import Go2AgilityCfg

    return Go2AgilityCfg()


def _tsc_algo_cfg():
    from agility_tpu.learn.ppo_tsc import TscAlgoCfg

    return TscAlgoCfg()


def _bbc_32k_cfg():
    """BASELINE configs[4]: 32k envs sharded across a multi-host slice.
    Envs are pure data parallelism, so the preset widens the batch and the
    terrain grid; pair with --shard/--multihost (cli/train_bbc.py)."""
    cfg = bbc_config.Go2LocomotionCfg()
    return dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, num_envs=32768),
        terrain=dataclasses.replace(cfg.terrain, num_rows=8, num_cols=8))


def _tsc_32k_cfg():
    from agility_tpu.envs.tsc_config import Go2AgilityCfg

    cfg = Go2AgilityCfg()
    return dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, num_envs=32768),
        obstacle=dataclasses.replace(cfg.obstacle, courses=256))


register("go2_locomotion", bbc_config.Go2LocomotionCfg, AlgoCfg)
register("go2_locomotion_smoke", lambda: bbc_config.smoke_cfg(64), AlgoCfg)
register("go2_locomotion_32k", _bbc_32k_cfg, AlgoCfg)
register("go2", _tsc_cfg, _tsc_algo_cfg)   # TSC agility task (reference name)
register("go2_32k", _tsc_32k_cfg, _tsc_algo_cfg)


def apply_overrides(cfg, **kv):
    """CLI-flag overrides onto the frozen config tree (the counterpart of
    update_cfg_from_args, bbc/legged_gym/utils/helpers.py:102-168)."""
    for key, val in kv.items():
        if val is None:
            continue
        parts = key.split(".")
        def set_in(node, parts, val):
            if len(parts) == 1:
                return dataclasses.replace(node, **{parts[0]: val})
            child = getattr(node, parts[0])
            return dataclasses.replace(node, **{parts[0]: set_in(child, parts[1:], val)})
        cfg = set_in(cfg, parts, val)
    return cfg
