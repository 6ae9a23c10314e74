"""grain-backed multiprocess loader option: same record contract as the
threaded Loader (per-(seed, epoch, idx) RNG, collation, drop_last), real worker
processes, and picklable slide/h5 caches."""

import numpy as np
import pytest

pytest.importorskip("grain")

from stedm_tpu.data.grain_loader import GrainLoader
from stedm_tpu.data.loader import Loader


class _DS:
    def __init__(self, n=12):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng: np.random.Generator | None = None):
        noise = rng.normal() if rng is not None else 0.0
        return (np.full((4, 4), i, np.float32), np.float32(noise))


def test_matches_threaded_loader_records():
    """shuffle=False: identical batches (incl. the per-(seed,epoch,idx) RNG
    values) to the threaded Loader, in the same order."""
    a = Loader(_DS(), batch_size=4, shuffle=False, seed=5, num_workers=2,
               drop_last=False)
    b = GrainLoader(_DS(), batch_size=4, shuffle=False, seed=5, num_workers=0,
                    drop_last=False)
    batches_a, batches_b = list(a), list(b)
    assert len(batches_a) == len(batches_b) == 3
    for (xa, na), (xb, nb) in zip(batches_a, batches_b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(na, nb)


def test_worker_processes():
    ld = GrainLoader(_DS(8), batch_size=2, shuffle=True, seed=1, num_workers=2,
                     drop_last=True)
    got = sorted(int(x[0, 0]) for batch in ld for x in batch[0])
    assert got == list(range(8))
    # next epoch: a different permutation (seed + epoch), same coverage
    order1 = [int(x[0, 0]) for b in GrainLoader(_DS(8), 8, shuffle=True, seed=1,
                                                num_workers=0, drop_last=False)
              for x in b[0]]
    ld2 = GrainLoader(_DS(8), 8, shuffle=True, seed=1, num_workers=0,
                      drop_last=False)
    ld2.epoch = 1
    order2 = [int(x[0, 0]) for b in ld2 for x in b[0]]
    assert sorted(order1) == sorted(order2) == list(range(8))
    assert order1 != order2


def test_drop_last_and_len():
    ld = GrainLoader(_DS(10), batch_size=4, shuffle=False, drop_last=True,
                     num_workers=0)
    assert len(ld) == 2
    assert len(list(ld)) == 2
    ld = GrainLoader(_DS(10), batch_size=4, shuffle=False, drop_last=False,
                     num_workers=0)
    assert len(ld) == 3


def test_caches_are_picklable():
    import pickle

    from stedm_tpu.data.catch import _H5Cache
    from stedm_tpu.data.her2 import _SlideCache

    sc = pickle.loads(pickle.dumps(_SlideCache()))
    assert sc.get.__name__ == "get"
    hc = pickle.loads(pickle.dumps(_H5Cache("/tmp/x.h5")))
    assert hc._path == "/tmp/x.h5"
