"""Hybrid data x model parallelism: the train step under a (data=4, model=2) mesh
must reproduce the single-device loss, with wide kernels actually sharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stedm_tpu.core.schedules import DiffusionSchedule
from stedm_tpu.parallel.sharding_rules import shard_state, state_shardings
from stedm_tpu.train.optim import make_optimizer
from stedm_tpu.train.steps import create_train_state, make_train_step
from tests.test_train_steps import tiny_batch, tiny_model

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_dp_mp_matches_single_device():
    model = tiny_model()
    batch = tiny_batch(b=4, seed=5)
    params = model.init(jax.random.PRNGKey(0), batch["image"], batch["segmentation"],
                        batch["style_imgs"], jnp.zeros((4,), jnp.int32))["params"]
    schedule = DiffusionSchedule.create("linear", 1000, 0.0015, 0.0205)
    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx)
    step_fn = make_train_step(model, schedule, tx)

    _, m_ref = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(1))

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    # low threshold so the tiny test model actually shards something
    sharded_state = shard_state(mesh, state, min_size=64)
    spec_tree = state_shardings(mesh, state, min_size=64)
    dp = NamedSharding(mesh, P("data"))
    batch_sharded = jax.tree_util.tree_map(lambda x: jax.device_put(x, dp), batch)

    # at least one kernel must be model-sharded
    flat = jax.tree_util.tree_leaves(spec_tree)
    assert any("model" in str(s.spec) for s in flat)

    step_mp = jax.jit(step_fn, in_shardings=(spec_tree, dp, None),
                      out_shardings=(spec_tree, NamedSharding(mesh, P())))
    new_state, m_mp = step_mp(sharded_state, batch_sharded, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_mp["loss"]),
                               rtol=1e-4, atol=1e-5)
    # params remain model-sharded after the update
    leaf = jax.tree_util.tree_leaves(new_state.params["unet"])[0]
    assert leaf.sharding is not None
