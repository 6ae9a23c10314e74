"""Unit tests for the host loader, mesh construction, and small utilities."""

import numpy as np
import pytest

from stedm_tpu.data.loader import ConcatDataset, Loader, collate
from stedm_tpu.parallel.mesh import batch_sharding, build_mesh, replicated
from stedm_tpu.utils.exact import parse_vector


class _Counting:
    """Dataset recording which rng each index was served with."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx, rng: np.random.Generator | None = None):
        noise = float(rng.uniform()) if rng is not None else -1.0
        return np.full((2, 2), idx, np.float32), np.float32(noise)


def test_concat_dataset_indexing():
    a, b = _Counting(3), _Counting(2)
    ds = ConcatDataset([a, b, _Counting(0)])
    assert len(ds) == 5
    assert ds[0][0][0, 0] == 0 and ds[3][0][0, 0] == 0  # second dataset idx 0
    assert ds[2][0][0, 0] == 2


def test_collate_stacks_and_tuples():
    items = [(np.ones((2,)), (1, 2), 5), (np.zeros((2,)), (3, 4), 6)]
    arr, tup, scalar = collate(items)
    assert arr.shape == (2, 2)
    np.testing.assert_array_equal(tup[0], [1, 3])
    np.testing.assert_array_equal(scalar, [5, 6])


def test_loader_determinism_and_epochs():
    ds = _Counting(8)
    loader = Loader(ds, batch_size=4, shuffle=True, num_workers=2, seed=7)
    e0 = [b for b in loader]
    loader2 = Loader(ds, batch_size=4, shuffle=True, num_workers=2, seed=7)
    e0b = [b for b in loader2]
    # same seed+epoch -> identical order and identical per-item rng draws
    for (a1, n1), (a2, n2) in zip(e0, e0b):
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(n1, n2)
    # next epoch differs
    e1 = [b for b in loader2]
    assert any(not np.array_equal(a, b) for (a, _), (b, _) in zip(e0, e1))


def test_loader_drop_last():
    ds = _Counting(5)
    assert len(Loader(ds, 2, drop_last=True)) == 2
    assert len(Loader(ds, 2, drop_last=False)) == 3
    batches = list(Loader(ds, 2, drop_last=False, num_workers=1))
    assert sum(b[0].shape[0] for b in batches) == 5


def test_build_mesh_variants():
    mesh = build_mesh({"data": -1})
    assert mesh.devices.size == 8  # conftest forces 8 virtual devices
    mesh2 = build_mesh({"data": -1, "model": 2})
    assert mesh2.shape["model"] == 2 and mesh2.shape["data"] == 4
    assert replicated(mesh).spec == ()
    assert batch_sharding(mesh).spec[0] == "data"


def test_parse_vector():
    v = {"x1": 1.0, "y1": 2.0, "x2": 3.0, "y2": 4.0}
    assert parse_vector(v) == [[1.0, 2.0], [3.0, 4.0]]
