"""Host -> device prefetch: overlap input-pipeline work with device compute.

Wraps a host batch iterator so the next batch's device transfer (and any host
transform) happens while the current step runs — the torch
``pin_memory + prefetch_factor`` pattern (reference dm.py:57) expressed with JAX's
async dispatch. With a mesh, batches land pre-sharded on the ``data`` axis.
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator

import jax


def prefetch_to_device(iterator: Iterable, *, size: int = 2,
                       transform: Callable | None = None,
                       sharding=None) -> Iterator:
    """Yield device-resident batches ``size`` steps ahead of consumption."""
    queue: collections.deque = collections.deque()

    def put(batch):
        if transform is not None:
            batch = transform(batch)
        if sharding is not None:
            # multi-host aware: local rows -> global sharded array
            from stedm_tpu.parallel.mesh import host_to_global

            batch = jax.tree_util.tree_map(
                lambda x: host_to_global(sharding, x), batch)
        else:
            batch = jax.tree_util.tree_map(jax.device_put, batch)
        queue.append(batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out
