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


def test_make_loader_batches_never_span_epochs():
    # 5 items / batch 2: each epoch yields 2 full batches and DROPS its
    # remainder — the leftover must not be carried into the next epoch's
    # first batch (which could duplicate a sample within one batch)
    ds = FakeDS(n=5)
    it = make_loader(ds, 2, num_workers=2, epochs=2, drop_last=True, seed=3)
    batches = [np.asarray(h)[:, 0, 0, 0].astype(int).tolist() for h, _ in it]
    assert len(batches) == 4  # 2 per epoch, not 5 spanning the reshuffle
    for b in batches:
        assert len(set(b)) == len(b)  # no duplicate sample inside a batch


class FakeAugDS:
    """Dataset whose augmentation draw comes from the loader-provided rng
    (the getitem_rng protocol LRHRDataset implements for hflip)."""

    def __len__(self):
        return 9

    def getitem_rng(self, i, rng):
        return (np.array([i, rng.random()], np.float64),)


def test_make_loader_seeded_augmentation_deterministic():
    def stream(num_workers, seed):
        it = make_loader(FakeAugDS(), 3, num_workers=num_workers,
                         epochs=2, seed=seed)
        return [np.asarray(b[0]).tolist() for b in it]

    assert stream(0, 5) == stream(4, 5)  # worker count invisible
    assert stream(0, 5) != stream(0, 6)  # seed reaches the aug rng
    # same index re-drawn in epoch 2 gets a fresh aug decision
    e1, e2 = np.asarray(stream(0, 5))[:3], np.asarray(stream(0, 5))[3:]
    i1 = {int(r[0]): r[1] for b in e1 for r in b}
    i2 = {int(r[0]): r[1] for b in e2 for r in b}
    assert any(i1[k] != i2[k] for k in i1)


def test_make_loader_mesh_sharding():
    """sharding= places batches over the mesh ahead of the step (the
    pin_memory + distributed-sampler pairing)."""
    import jax
    from rsvldm_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh(tile=1)
    ds = FakeDS(n=16)
    it = make_loader(ds, 8, num_workers=2, prefetch=2,
                     sharding=batch_sharding(mesh, 4), seed=1, epochs=1)
    batches = list(it)
    assert len(batches) == 2
    hr = batches[0][0]
    assert hr.shape == (8, 4, 4, 3)
    assert hr.sharding.is_equivalent_to(batch_sharding(mesh, 4), hr.ndim)
