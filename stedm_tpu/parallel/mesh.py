"""Device mesh construction and sharding policy.

The reference's only distribution strategy is Lightning DDP over NCCL/Gloo
(reference `train_diff.py:75`, SURVEY.md §2.8) with all collectives implicit. The
TPU-native equivalent: a `jax.sharding.Mesh` with a ``data`` axis; batches are
sharded over it, parameters are replicated, and the gradient all-reduce is inserted
by XLA when the jitted train step is given these shardings — riding ICI within a
slice and DCN across hosts.

Reference semantics reproduced explicitly by callers:
* lr scaled by total batch (= per-device batch x data-parallel size,
  reference train_diff.py:36-39),
* gradient accumulation x4 (train_diff.py:76) via `optax.MultiSteps`,
* predict-time sharding of the generation grid across devices
  (reference predict_diff.py:84-89) by sharding the sample batch on ``data``.

Multi-host: call :func:`maybe_initialize_distributed` before building the mesh.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """Initialize multi-host JAX when a cluster environment is present.

    ORDERING MATTERS: `jax.distributed.initialize()` must run before *any*
    backend-touching call (`jax.devices()`, `jax.process_count()`, any jit), so
    the env-var gate comes first and nothing else here touches jax until after
    init. (Round-2 bug: consulting ``jax.process_count()`` first initialized the
    XLA backend and every multi-host launch then died with "must be called before
    any JAX calls"; regression-covered by tests/test_distributed.py.)

    Cluster contract (the DDP-init counterpart of reference train_diff.py:72-76):
    ``JAX_COORDINATOR_ADDRESS`` gates init; JAX reads the address itself, and on
    environments without cluster auto-detection (SLURM / Cloud TPU metadata)
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` supply the remaining topology.
    """
    if not (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
        return
    if jax.distributed.is_initialized():
        return
    kwargs: dict = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ.get("JAX_PROCESS_ID", 0))
    jax.distributed.initialize(**kwargs)


def build_mesh(spec: dict[str, int] | None = None) -> Mesh:
    """Build a mesh from an ``{axis: size}`` spec; size -1 takes all remaining
    devices. Default: 1-D data parallelism over every device."""
    spec = dict(spec or {"data": -1})
    devices = np.array(jax.devices())
    total = devices.size
    fixed = int(np.prod([s for s in spec.values() if s > 0])) if spec else 1
    sizes = []
    for axis, size in spec.items():
        if size == -1:
            size = total // max(fixed, 1)
        sizes.append(size)
    assert int(np.prod(sizes)) <= total, f"mesh {spec} needs more than {total} devices"
    used = int(np.prod(sizes))
    mesh_devices = devices[:used].reshape(sizes)
    return Mesh(mesh_devices, tuple(spec.keys()))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(axis))


def local_batch_size(global_batch: int) -> int:
    """Per-process share of the global batch (multi-host data contract: every
    process loads only its own rows; `host_to_global` assembles the global array)."""
    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{pc} processes")
    return global_batch // pc


def host_to_global(sharding: NamedSharding, x) -> jax.Array:
    """Process-local host rows -> global device array sharded over the batch axis.

    Single-process: a plain `device_put`. Multi-host: each process contributes its
    local rows via `jax.make_array_from_process_local_data` (the global shape is
    inferred; rows are laid out process-contiguously in mesh-device order), the
    JAX counterpart of DDP's per-rank batches.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Host batch pytree (process-local rows) -> global arrays sharded over
    ``axis``. Single-process: local == global."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: host_to_global(sharding, x), batch)


def local_rows(global_array: jax.Array) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in global row order
    (single-process: the whole array). Inverse of `host_to_global` for outputs
    that keep the batch sharding — replicated minor axes are deduplicated."""
    shards = {}
    for s in global_array.addressable_shards:
        start = s.index[0].start or 0
        shards.setdefault(start, np.asarray(s.data))
    return np.concatenate([shards[k] for k in sorted(shards)])
