"""Batched control step with the Pallas contact path vs the vmap path
(interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agility_tpu.core.urdf import build_go2_model
from agility_tpu.physics import engine as eng
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics.constants import ModelConsts

MODEL = build_go2_model()
MC = ModelConsts.from_model(MODEL)
GRID = hf.flat_grid()


@pytest.mark.slow
def test_pallas_control_step_matches_vmap(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    N = 8
    s = eng.EnvState(
        base_pos=jnp.tile(jnp.array([0.0, 0.0, 0.30]), (N, 1)),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (N, 1)),
        dof_pos=jnp.tile(MC.default_dof_pos, (N, 1)),
        u=jnp.zeros((N, 18)).at[:, 0].set(0.3),
    )
    ctrl = eng.Control(jnp.tile(MC.default_dof_pos, (N, 1)),
                       jnp.full((N, 12), 40.0), jnp.full((N, 12), 1.0))
    par = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape),
                       eng.EnvParams.nominal())

    cfg_ref = eng.EngineConfig()
    cfg_pal = eng.EngineConfig(pallas_contact=True, pallas_env_block=8)
    for _ in range(5):
        out_ref = eng.control_step_batched(MC, cfg_ref, GRID, s, ctrl, par)
        out_pal = eng.control_step_batched(MC, cfg_pal, GRID, s, ctrl, par)
        np.testing.assert_allclose(np.asarray(out_pal[0].base_pos),
                                   np.asarray(out_ref[0].base_pos), atol=5e-4)
        np.testing.assert_allclose(np.asarray(out_pal[0].u),
                                   np.asarray(out_ref[0].u), atol=5e-2)
        s = out_pal[0]
    assert np.isfinite(np.asarray(s.base_pos)).all()
    assert (np.asarray(s.base_pos[:, 2]) > 0.15).all()
