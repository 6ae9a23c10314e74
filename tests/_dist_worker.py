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


def main() -> None:
    # MUST be the first jax call (the round-2 bug was a backend-touching call
    # before initialize; this worker would crash here if it regressed)
    maybe_initialize_distributed()

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
