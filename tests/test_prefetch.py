"""Input-pipeline overlap (data/prefetch.py): the DataLoader(num_workers,
pin_memory) equivalent. Determinism, ordering, exception propagation, and
on-device placement."""

import time

import numpy as np
import pytest

from rsvldm_tpu.data.prefetch import (make_loader, prefetch_to_device,
                                      worker_map)


class FakeDS:
    """Two-column dataset: (hr, sr) arrays derived from the index."""

    def __init__(self, n=10, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        return (np.full((4, 4, 3), i, np.float32),
                np.full((2, 2, 3), -i, np.float32))


def test_worker_map_order_matches_inline():
    items = list(range(23))
    inline = [i * i for i in worker_map(lambda x: x, items, num_workers=0)]
    threaded = [i * i for i in worker_map(lambda x: x, items, num_workers=4)]
    assert inline == threaded == [i * i for i in items]


def test_worker_map_propagates_exception():
    def boom(i):
        if i == 3:
            raise ValueError("bad record")
        return i

    it = worker_map(boom, range(6), num_workers=2)
    assert next(it) == 0
    with pytest.raises(ValueError, match="bad record"):
        list(it)


def test_prefetch_to_device_stream_and_placement():
    import jax
    batches = [(np.ones((2, 3)) * i, np.zeros((2,)) + i) for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, (a, b) in enumerate(out):
        assert isinstance(a, jax.Array) and isinstance(b, jax.Array)
        np.testing.assert_allclose(np.asarray(a), batches[i][0])
        np.testing.assert_allclose(np.asarray(b), batches[i][1])


def test_prefetch_to_device_propagates_exception():
    def gen():
        yield (np.ones(3),)
        raise RuntimeError("loader died")

    it = prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="loader died"):
        next(it)


def test_prefetch_close_stops_producer():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield (np.ones(2) * i,)

    it = prefetch_to_device(gen(), size=2)
    next(it)
    it.close()
    time.sleep(0.3)
    n = len(produced)
    time.sleep(0.2)
    assert len(produced) == n  # producer thread stopped filling


def test_make_loader_deterministic_in_seed_not_workers():
    ds = FakeDS(n=11, delay=0.002)

    def first_batches(num_workers):
        it = make_loader(ds, 4, num_workers=num_workers, prefetch=2, seed=7)
        out = [tuple(np.asarray(c) for c in next(it)) for _ in range(4)]
        it.close()
        return out

    a, b = first_batches(0), first_batches(3)
    for (ha, sa), (hb, sb) in zip(a, b):
        assert ha.shape == (4, 4, 4, 3) and sa.shape == (4, 2, 2, 3)
        np.testing.assert_array_equal(ha, hb)
        np.testing.assert_array_equal(sa, sb)


def test_make_loader_epochs_and_drop_last():
    ds = FakeDS(n=5)
    it = make_loader(ds, 2, num_workers=2, epochs=1, drop_last=False, seed=0)
    sizes = [np.asarray(h).shape[0] for h, _ in it]
    assert sorted(sizes) == [1, 2, 2]
