"""Subprocess worker for tests/test_distributed.py.

Runs ONE process of an N-process `jax.distributed` CPU cluster: initializes via
the repo's `maybe_initialize_distributed` (env-var contract), loads its rank's
rows with `Loader.process_shard`, assembles the global batch with
`shard_batch`/`host_to_global` (`jax.make_array_from_process_local_data` on the
multi-process path), runs one tiny data-parallel train step (XLA inserts the
cross-process grad psum), and prints a JSON result line.

Invoked as:  python _dist_worker.py  (all topology comes from env vars)
"""

import json
import os
import sys

# topology from env (set by the test): cpu backend, 2 local devices per process
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from stedm_tpu.parallel.mesh import (  # noqa: E402
    build_mesh,
    local_rows,
    maybe_initialize_distributed,
    shard_batch,
)


def predict_mode() -> None:
    """Sharded-generation contract (the reference's DDP predict sampler,
    reference predict_diff.py:84-89): a tiny STEDM sampler jitted over the
    2-process mesh with the batch sharded on `data`; every process reports its
    `local_rows` plus summary stats of the replicated-global output so the test
    can check cross-process agreement and coverage."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stedm_tpu.core.schedules import DiffusionSchedule
    from stedm_tpu.models.stedm import STEDM
    from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

    pi, pc = jax.process_index(), jax.process_count()
    patch = 32
    model = STEDM(
        unet_config=dict(in_channels=6, out_channels=3, model_channels=32,
                         num_res_blocks=1, channel_mult=(1, 2), num_heads=4,
                         attention_resolutions=(32, 16, 8)),
        first_stage_config=dict(embed_dim=3, n_embed=64, ddconfig=dict(
            double_z=False, z_channels=3, resolution=patch, in_channels=3,
            out_ch=3, ch=32, ch_mult=[1, 2, 4], num_res_blocks=1,
            attn_resolutions=[], dropout=0.0)),
        cond_stage_config=dict(n_stages=2, in_channels=2, out_channels=3),
        style_agg="mean", style_sampling="nearby", patch_size=patch,
    )
    mesh = build_mesh({"data": -1})
    n_dev = mesh.devices.size
    b_global = max(4, n_dev)  # same global batch for 1-proc and 2-proc runs
    b_local = b_global // pc

    rng_np = np.random.default_rng(7)
    local = {
        "segmentation": np.zeros((b_local, patch, patch, 2),
                                 np.float32),
        "style_imgs": rng_np.uniform(
            -1, 1, (b_global, 1, patch, patch, 3)).astype(np.float32)[
            pi * b_local:(pi + 1) * b_local],
    }
    local["segmentation"][..., 0] = 1.0

    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, patch, patch, 3)),
                        jnp.zeros((1, patch, patch, 2)),
                        jnp.zeros((1, 1, patch, patch, 3)),
                        jnp.zeros((1,), jnp.int32))["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params)

    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, rep)
    batch = shard_batch(mesh, local)

    schedule = DiffusionSchedule.create("linear", 1000, 0.0015, 0.0205)
    # ddim_steps=3 hits the reference's ragged-stride OOB quirk (kept faithfully
    # in schedules.py); 4 divides T=1000 cleanly.
    cfg = SamplerConfig(ddim_steps=4, eta=0.0, cfg_scale=1.5, rescale_phi=0.7,
                        batched_cfg=True, downsample=4)
    sample = jax.jit(make_sample_fn(model, schedule, cfg),
                     in_shardings=(rep, dp, None), out_shardings=dp)
    imgs = sample(params, batch, jax.random.PRNGKey(3))
    rows = local_rows(imgs)
    print(json.dumps({
        "process_index": pi,
        "process_count": pc,
        "global_shape": list(imgs.shape),
        "local_rows_shape": list(rows.shape),
        "local_rows_mean": float(np.mean(rows)),
        "local_rows_std": float(np.std(rows)),
        "finite": bool(np.all(np.isfinite(rows))),
        # row fingerprints let the test stitch + compare across topologies
        "row_means": np.mean(np.asarray(rows), axis=(1, 2, 3)).tolist(),
    }), flush=True)


def main() -> None:
    # MUST be the first jax call (the round-2 bug was a backend-touching call
    # before initialize; this worker would crash here if it regressed)
    maybe_initialize_distributed()

    if os.environ.get("STEDM_DIST_MODE") == "predict":
        return predict_mode()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stedm_tpu.data.loader import Loader

    pi, pc = jax.process_index(), jax.process_count()

    class RangeDS:
        """Deterministic toy dataset: item i -> float32 row [i, i+1, i+2]."""

        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.arange(3, dtype=np.float32) + i,)

    ld = Loader(RangeDS(), batch_size=2, shuffle=True, seed=7, drop_last=False,
                num_workers=1)
    ld.epoch = 0
    ld.process_shard = (pi, pc)
    local_batch = next(iter(ld))[0]          # this rank's rows of global batch 0

    mesh = build_mesh({"data": -1})
    batch = shard_batch(mesh, {"x": local_batch})

    w = jnp.full((3,), 0.5, jnp.float32)     # tiny DP model: loss = mean((x@w)^2)
    rep = NamedSharding(mesh, P())

    @lambda f: jax.jit(f, in_shardings=(rep, NamedSharding(mesh, P("data"))),
                       out_shardings=(rep, rep))
    def train_step(w, x):
        def loss_fn(w):
            return jnp.mean((x @ w) ** 2)

        loss, grad = jax.value_and_grad(loss_fn)(w)
        return loss, w - 0.01 * grad         # grad carries the implicit psum

    loss, w_new = train_step(w, batch["x"])
    roundtrip = bool(np.allclose(local_rows(batch["x"]), np.asarray(local_batch)))
    print(json.dumps({
        "process_index": pi,
        "process_count": pc,
        "global_devices": len(jax.devices()),
        "global_batch_shape": list(batch["x"].shape),
        "loss": float(loss),
        "w_new": np.asarray(w_new).tolist(),
        "local_rows_roundtrip": roundtrip,
    }), flush=True)


if __name__ == "__main__":
    main()
