"""Parameter sharding rules for hybrid data x model parallelism.

The reference only has DDP (SURVEY.md §2.8); at 234M params the model fits one
chip, but serving/training economics still benefit from sharding the wide conv /
dense kernels over a ``model`` mesh axis: XLA GSPMD then partitions the matmuls
and inserts the reduce-scatter/all-gather collectives over ICI.

Rule (leaf-wise, applied uniformly to params, optimizer moments and EMA shadows so
one tree-map covers the whole train state): shard the **last** axis (output
features for both Dense [in, out] and Conv HWIO kernels) over ``model`` when it is
divisible by the axis size and at least ``min_size`` wide; everything else is
replicated over ``model``. Batch tensors shard over ``data`` as usual.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def leaf_sharding(mesh: Mesh, leaf, *, axis: str = "model",
                  min_size: int = 512) -> NamedSharding:
    if axis not in mesh.axis_names:
        return NamedSharding(mesh, P())
    size = mesh.shape[axis]
    if size > 1 and hasattr(leaf, "ndim") and leaf.ndim >= 1 \
            and leaf.shape[-1] >= min_size and leaf.shape[-1] % size == 0:
        return NamedSharding(mesh, P(*((None,) * (leaf.ndim - 1)), axis))
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, state: Any, *, axis: str = "model",
                    min_size: int = 512) -> Any:
    """Sharding tree matching ``state`` (TrainState or any param pytree)."""
    return jax.tree_util.tree_map(
        lambda leaf: leaf_sharding(mesh, leaf, axis=axis, min_size=min_size), state)


def shard_state(mesh: Mesh, state: Any, *, axis: str = "model",
                min_size: int = 512) -> Any:
    return jax.device_put(state, state_shardings(mesh, state, axis=axis,
                                                 min_size=min_size))
