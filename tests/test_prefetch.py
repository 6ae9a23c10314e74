"""Device-prefetch iterator tests."""

import numpy as np

from stedm_tpu.data.prefetch import prefetch_to_device


def test_prefetch_preserves_order_and_count():
    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2, 2), i))


def test_prefetch_transform_and_short_iterators():
    batches = [np.ones((2,)) * i for i in range(2)]
    out = list(prefetch_to_device(iter(batches), size=4,
                                  transform=lambda x: x + 1))
    assert len(out) == 2
    np.testing.assert_array_equal(np.asarray(out[1]), np.full((2,), 2.0))
    assert list(prefetch_to_device(iter([]), size=2)) == []
