"""End-to-end smoke: tiny model trains (loss drops / changes), samples decode,
and the data-parallel sharded step matches the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from stedm_tpu.core.schedules import DiffusionSchedule
from stedm_tpu.models.stedm import STEDM
from stedm_tpu.parallel.mesh import build_mesh, shard_batch
from stedm_tpu.train.optim import make_optimizer, scaled_lr
from stedm_tpu.train.steps import (
    SamplerConfig,
    TrainState,
    create_train_state,
    make_sample_fn,
    make_train_step,
)

PATCH = 32  # image size; latent 8x8 under VQ-f4


def tiny_model(style_agg="mean", style_sampling="nearby"):
    return STEDM(
        unet_config=dict(in_channels=6, out_channels=3, model_channels=32,
                         num_res_blocks=1, channel_mult=(1, 2), num_heads=4,
                         attention_resolutions=(32, 16, 8)),
        first_stage_config=dict(embed_dim=3, n_embed=64, ddconfig=dict(
            double_z=False, z_channels=3, resolution=PATCH, in_channels=3, out_ch=3,
            ch=32, ch_mult=[1, 2, 4], num_res_blocks=1, attn_resolutions=[],
            dropout=0.0)),
        cond_stage_config=dict(n_stages=2, in_channels=2, out_channels=3),
        style_agg=style_agg,
        style_sampling=style_sampling,
        patch_size=PATCH,
        svit_config=dict(patch_size=8, dim=32, depth=1, heads=2, mlp_dim=32,
                         pool="mean", channels=3, dropout=0.0, emb_dropout=0.0,
                         t_dim=16),
    )


def tiny_batch(b=2, n_style=1, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(-1, 1, (b, PATCH, PATCH, 3)).astype(np.float32)
    seg_cls = (rng.uniform(size=(b, PATCH, PATCH)) > 0.5).astype(np.int32)
    seg = np.stack([1 - seg_cls, seg_cls], axis=-1).astype(np.float32)
    style = rng.uniform(-1, 1, (b, n_style, PATCH, PATCH, 3)).astype(np.float32)
    return {"image": jnp.asarray(img), "segmentation": jnp.asarray(seg),
            "style_imgs": jnp.asarray(style)}


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    batch = tiny_batch()
    params = model.init(jax.random.PRNGKey(0), batch["image"], batch["segmentation"],
                        batch["style_imgs"], jnp.zeros((2,), jnp.int32))["params"]
    schedule = DiffusionSchedule.create("linear", 1000, 0.0015, 0.0205)
    return model, params, schedule, batch


def test_swin_embedder_is_small_enough_to_smoke(setup):
    model, params, schedule, batch = setup
    assert set(params.keys()) == {"unet", "first_stage", "cond_stage", "agg"}


def test_train_steps_decrease_loss(setup):
    model, params, schedule, batch = setup
    tx = make_optimizer(1e-3, accumulate_grad_batches=1)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, schedule, tx))
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # same batch, same rng-per-step pattern: the model must fit the batch
    assert losses[-1] < losses[0]


def test_frozen_first_stage_never_updates(setup):
    model, params, schedule, batch = setup
    tx = make_optimizer(1e-2, accumulate_grad_batches=1)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, schedule, tx))
    state2, _ = step(state, batch, jax.random.PRNGKey(0))
    before = jax.tree_util.tree_leaves(state.params["first_stage"])
    after = jax.tree_util.tree_leaves(state2.params["first_stage"])
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # the unet must have moved
    moved = jax.tree_util.tree_map(
        lambda b, a: float(jnp.abs(b - a).max()),
        state.params["unet"], state2.params["unet"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_style_encoder_frozen_parity_mode(setup):
    """SURVEY.md Q1: style encoder out of the optimizer in parity mode."""
    model, params, schedule, batch = setup
    tx = make_optimizer(1e-2, style_encoder_trainable=False)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, schedule, tx))
    state2, _ = step(state, batch, jax.random.PRNGKey(0))
    for b, a in zip(jax.tree_util.tree_leaves(state.params["agg"]),
                    jax.tree_util.tree_leaves(state2.params["agg"])):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_grad_accumulation_applies_every_k(setup):
    model, params, schedule, batch = setup
    tx = make_optimizer(1e-2, accumulate_grad_batches=2)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, schedule, tx))
    s1, _ = step(state, batch, jax.random.PRNGKey(0))
    # after 1 micro-batch nothing is applied yet
    for b, a in zip(jax.tree_util.tree_leaves(state.params["unet"]),
                    jax.tree_util.tree_leaves(s1.params["unet"])):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    s2, _ = step(s1, batch, jax.random.PRNGKey(0))
    moved = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda b, a: float(jnp.abs(b - a).max()), state.params["unet"],
        s2.params["unet"])))
    assert moved > 0


def test_sampler_shapes_cfg_batched_vs_two_call(setup):
    model, params, schedule, batch = setup
    # zero-init output convs make an untrained model emit eps == 0 exactly, and
    # rescaled CFG divides by std(eps); nudge params like a trained model
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params)
    common = dict(ddim_steps=4, cfg_scale=1.5, downsample=4)
    sample_b = jax.jit(make_sample_fn(model, schedule, SamplerConfig(**common)))
    sample_2 = jax.jit(make_sample_fn(model, schedule,
                                      SamplerConfig(batched_cfg=False, **common)))
    rng = jax.random.PRNGKey(7)
    img_b = sample_b(params, batch, rng)
    img_2 = sample_2(params, batch, rng)
    assert img_b.shape == (2, PATCH, PATCH, 3)
    assert float(jnp.abs(img_b).max()) <= 1.0
    # one batched call and two separate calls are the same math
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_2),
                               rtol=2e-4, atol=2e-4)


def test_data_parallel_step_matches_single_device(setup):
    """1-vs-N device equivalence on the virtual CPU mesh (SURVEY.md §4)."""
    model, params, schedule, _ = setup
    batch = tiny_batch(b=8, seed=3)
    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx)
    step_fn = make_train_step(model, schedule, tx)

    _, m_single = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(1))

    mesh = build_mesh({"data": 8})
    rep = NamedSharding(mesh, P())
    state_sharded = jax.device_put(state, rep)
    batch_sharded = shard_batch(mesh, batch)
    step_dp = jax.jit(step_fn, in_shardings=(rep, NamedSharding(mesh, P("data")), rep),
                      out_shardings=rep)
    s2, m_dp = step_dp(state_sharded, batch_sharded, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]),
                               rtol=1e-5, atol=1e-6)


def test_learn_logvar_trains_and_checkpoints(setup):
    """Reference ddpm.py:113-117 + ldm_diffusion.py:228-229: the per-timestep
    logvar buffer is trainable and included in the optimizer when learn_logvar."""
    from stedm_tpu.train.steps import init_logvar

    model, params, schedule, batch = setup
    params_lv = init_logvar(dict(params), schedule.num_timesteps, logvar_init=0.0)
    assert params_lv["logvar"].shape == (schedule.num_timesteps,)

    tx = make_optimizer(1e-2, accumulate_grad_batches=1)
    state = create_train_state(params_lv, tx)
    step = jax.jit(make_train_step(model, schedule, tx, learn_logvar=True))
    for _ in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    delta = np.abs(np.asarray(state.params["logvar"])).max()
    assert delta > 0.0, "logvar received no updates"
    # sampling strips the loss-only logvar group
    cfg = SamplerConfig(ddim_steps=2, cfg_scale=1.0, use_cfg=False, downsample=4)
    img = jax.jit(make_sample_fn(model, schedule, cfg))(
        state.params, batch, jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(img)))


def test_static_logvar_init_shifts_loss(setup):
    """A non-zero static logvar_init changes the weighted loss but not
    loss_simple (reference p_losses, ddpm.py:1030-1035)."""
    model, params, schedule, batch = setup
    tx = make_optimizer(1e-3, accumulate_grad_batches=1)
    s0 = create_train_state(params, tx)
    step0 = jax.jit(make_train_step(model, schedule, tx))
    step1 = jax.jit(make_train_step(model, schedule, tx, logvar_init=0.5))
    _, m0 = step0(s0, batch, jax.random.PRNGKey(3))
    s1 = create_train_state(params, tx)
    _, m1 = step1(s1, batch, jax.random.PRNGKey(3))
    assert np.isclose(float(m0["loss_simple"]), float(m1["loss_simple"]), rtol=1e-5)
    assert not np.isclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-4)


def test_scale_by_std(setup):
    """First-batch std rescale (reference ddpm.py:480-494): after cloning with
    the computed factor, encodings have unit std; a non-1 preset factor raises."""
    from stedm_tpu.train.steps import compute_scale_by_std

    model, params, schedule, batch = setup
    sf = compute_scale_by_std(model, params, batch["image"])
    assert np.isfinite(sf) and sf > 0
    scaled = model.clone(scale_factor=sf)
    z = scaled.apply({"params": params}, batch["image"],
                     method=scaled.encode_first_stage)
    assert abs(float(jnp.std(z)) - 1.0) < 1e-3
    # round trip through decode still works at the rescaled factor
    img = scaled.apply({"params": params}, z, method=scaled.decode_first_stage)
    assert np.all(np.isfinite(np.asarray(img)))
    with pytest.raises(ValueError):
        compute_scale_by_std(scaled, params, batch["image"])
