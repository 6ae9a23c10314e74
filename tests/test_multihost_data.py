"""Multi-host data contract, tested at the slicing/assembly level on the virtual
8-device CPU mesh (SURVEY.md §2.8: the reference delegates this to Lightning DDP's
DistributedSampler + per-rank loaders; here it's explicit and testable):

* `Loader.process_shard` — same permutation on every rank, wrap-padded,
  rank-interleaved, lockstep batch counts;
* `host_to_global` / `local_rows` — per-process rows <-> global sharded array.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stedm_tpu.data.loader import Loader
from stedm_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    host_to_global,
    local_batch_size,
    local_rows,
)


class _RangeDS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (np.array([i], np.int64),)


def _rank_indices(n, pc, shuffle=False, seed=3, epoch=0):
    per_rank = []
    for pi in range(pc):
        ld = Loader(_RangeDS(n), batch_size=2, shuffle=shuffle, seed=seed,
                    drop_last=False, num_workers=1)
        ld.epoch = epoch
        ld.process_shard = (pi, pc)
        per_rank.append(ld._indices())
    return per_rank


def test_rank_shards_partition_and_lockstep():
    n, pc = 10, 4  # ragged: 10 % 4 != 0 -> wrap-padded to 12
    shards = _rank_indices(n, pc)
    lengths = {len(s) for s in shards}
    assert lengths == {3}, "ranks must run in lockstep"
    union = np.concatenate(shards)
    assert set(union.tolist()) == set(range(n))
    # wrap padding duplicates the first (pad) indices, like DistributedSampler
    assert len(union) == 12


def test_rank_shards_same_permutation_when_shuffled():
    n, pc = 16, 4
    shards = _rank_indices(n, pc, shuffle=True, seed=9, epoch=2)
    # reassemble by interleaving: must equal the single full permutation
    full = Loader(_RangeDS(n), batch_size=2, shuffle=True, seed=9,
                  drop_last=False, num_workers=1)
    full.epoch = 2
    perm = full._indices()
    rebuilt = np.empty(n, np.int64)
    for pi, s in enumerate(shards):
        rebuilt[pi::pc] = s
    np.testing.assert_array_equal(rebuilt, perm)


def test_loader_iterates_only_its_shard():
    ld = Loader(_RangeDS(8), batch_size=2, shuffle=False, drop_last=False,
                num_workers=1)
    ld.process_shard = (1, 2)
    got = np.concatenate([b[0].ravel() for b in ld])
    np.testing.assert_array_equal(got, [1, 3, 5, 7])
    assert len(ld) == 2


def test_local_batch_size_single_process():
    assert local_batch_size(16) == 16  # process_count == 1 in tests


def test_host_to_global_local_rows_roundtrip():
    mesh = build_mesh({"data": 8})
    sharding = batch_sharding(mesh)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = host_to_global(sharding, x)
    assert g.shape == (16, 3)
    np.testing.assert_array_equal(local_rows(g), x)
    # and a computation over it keeps the row order
    y = jax.jit(lambda a: a * 2, in_shardings=sharding, out_shardings=sharding)(g)
    np.testing.assert_array_equal(local_rows(y), x * 2)


def test_local_rows_dedupes_replicated_axes():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = build_mesh({"data": 4, "model": 2})
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    g = jax.device_put(x, NamedSharding(mesh, P("data")))  # replicated over model
    np.testing.assert_array_equal(local_rows(g), x)
