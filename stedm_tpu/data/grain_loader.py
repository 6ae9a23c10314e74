"""grain-backed multiprocess input pipeline (optional alternative to
`stedm_tpu.data.loader.Loader`).

The threaded Loader scales while decode releases the GIL (cv2/PIL/the native
patch kernel); pure-python-heavy datasets want real processes — the reference
gets them from torch DataLoader's forked workers (reference data/dm.py:49-87).
This adapter runs the same datasets under `grain.python.DataLoader`
(google/grain): forked worker processes, shared-memory numpy transfer,
deterministic per-record RNG identical to the threaded Loader's
``(seed, epoch, idx)`` derivation.

Select with ``location.loader=grain`` (location yaml or CLI override); surface
matches Loader (``batch_size`` / ``epoch`` / ``process_shard`` attributes,
iterates collated tuple batches), so entry points don't change. Differences,
both documented DDP-legal: grain shards the index space contiguously (not
rank-interleaved) and draws its own shuffle permutation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from stedm_tpu.data.loader import collate


class _Source:
    """grain RandomAccessDataSource over our datasets, reproducing the threaded
    Loader's per-(seed, epoch, idx) child-generator RNG contract."""

    def __init__(self, dataset, seed: int, epoch: int, takes_rng: bool):
        self._dataset = dataset
        self._seed = seed
        self._epoch = epoch
        self._takes_rng = takes_rng

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx: int):
        if self._takes_rng:
            rng = np.random.default_rng((self._seed, self._epoch, int(idx)))
            return self._dataset.__getitem__(int(idx), rng=rng)
        return self._dataset[int(idx)]


class GrainLoader:
    """Loader-compatible iterable backed by grain's multiprocess DataLoader."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 num_workers: int = 4, prefetch: int = 2, seed: int = 0,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.process_shard: tuple[int, int] | None = None

    def __len__(self) -> int:
        pi, pc = self.process_shard or (0, 1)
        n = len(self.dataset) // pc if pc > 1 else len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[tuple]:
        import inspect

        import grain.python as pg

        takes_rng = False
        try:
            takes_rng = "rng" in inspect.signature(
                type(self.dataset).__getitem__).parameters
        except (TypeError, ValueError):
            pass

        pi, pc = self.process_shard or (0, 1)
        epoch = self.epoch
        self.epoch += 1
        source = _Source(self.dataset, self.seed, epoch, takes_rng)
        sampler = pg.IndexSampler(
            num_records=len(source),
            shuffle=self.shuffle,
            seed=self.seed + epoch,
            num_epochs=1,
            shard_options=pg.ShardOptions(shard_index=pi, shard_count=pc,
                                          drop_remainder=False))
        loader = pg.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[],
            worker_count=self.num_workers,
            worker_buffer_size=max(1, self.prefetch),
        )
        # collate on the consumer side with our own rules (nested tuples etc.)
        items: list[tuple] = []
        for item in loader:
            items.append(item)
            if len(items) == self.batch_size:
                yield collate(items)
                items = []
        if items and not self.drop_last:
            yield collate(items)
