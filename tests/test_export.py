"""Policy export/load roundtrip."""
import numpy as np
import jax
import jax.numpy as jnp

from agility_tpu.io import export as pexport
from agility_tpu.learn import networks as nets


def test_stablehlo_roundtrip(tmp_path):
    s = nets.ObsSlices()
    ac = nets.ActorCritic(num_actions=12, slices=s)
    obs0 = jnp.zeros((4, s.total))
    params = ac.init(jax.random.PRNGKey(0), obs0, obs0)

    def policy(obs):
        return ac.apply(params, obs, method="action_mean", hist_encoding=True)

    path = pexport.export_policy(policy, (obs0,), str(tmp_path / "policy"))
    loaded = pexport.load_policy(path)
    obs = jax.random.normal(jax.random.PRNGKey(1), (4, s.total)) * 0.1
    np.testing.assert_allclose(
        np.asarray(loaded(obs)), np.asarray(policy(obs)), atol=1e-6)


def test_params_npz(tmp_path):
    s = nets.ObsSlices()
    ac = nets.ActorCritic(num_actions=12, slices=s)
    obs0 = jnp.zeros((1, s.total))
    params = ac.init(jax.random.PRNGKey(0), obs0, obs0)
    path = pexport.export_params_npz(params, str(tmp_path / "params"))
    loaded = np.load(path)
    assert any("actor_head" in k for k in loaded.files)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    assert len(loaded.files) == n_leaves
