"""Input-pipeline overlap: the torch DataLoader(num_workers, pin_memory,
prefetch_factor) equivalent, TPU-style.

Parity target: the reference trains through
torch.utils.data.DataLoader(batch_size, shuffle, num_workers=16/8,
pin_memory=True) (/root/reference/llava/train/train.py dataloader args,
models/sr3_model usage via Lightning); without it every train step pays the
full host-side decode + H2D transfer serially.

TPU design: two small composable pieces instead of a process pool —
  * worker_map: a bounded ThreadPoolExecutor over dataset.__getitem__.
    PIL decode/resize and NumPy copies release the GIL, so threads give
    DataLoader-num_workers-style overlap without pickling datasets across
    processes (the torch design exists because CUDA tensors + Python
    transforms don't thread; host NumPy here does).
  * prefetch_to_device: a background thread that stages the next `size`
    batches on the accelerator with jax.device_put (optionally with a
    Sharding, so dp batches land already laid out over the mesh). The
    device_put for batch N+1 overlaps the dispatched train step N — the
    pin_memory + non_blocking copy equivalent.

Both propagate worker exceptions to the consumer and shut their threads
down on close()/GC; iteration order is deterministic (futures are consumed
in submission order, so num_workers changes throughput, never the stream).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator


class _Closed(Exception):
    pass


def worker_map(fn: Callable[[Any], Any], items: Iterable[Any],
               num_workers: int = 4, inflight: int | None = None) -> Iterator[Any]:
    """Map fn over items with a thread pool, yielding IN ORDER with at most
    `inflight` (default 2*num_workers) items being computed ahead of the
    consumer. The DataLoader(num_workers=N) analogue for __getitem__ work."""
    if num_workers <= 0:
        for it in items:
            yield fn(it)
        return
    inflight = inflight or 2 * num_workers
    it = iter(items)
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        pending: "queue.SimpleQueue[Any]" = queue.SimpleQueue()
        n_pending = 0
        exhausted = False
        while True:
            while not exhausted and n_pending < inflight:
                try:
                    pending.put(pool.submit(fn, next(it)))
                    n_pending += 1
                except StopIteration:
                    exhausted = True
            if n_pending == 0:
                return
            yield pending.get().result()
            n_pending -= 1


class prefetch_to_device:
    """Wrap a host batch iterator so the next `size` batches are already on
    the accelerator when the consumer asks for them.

    Each yielded element is jax.tree-mapped through jax.device_put (arrays
    pass through as-is if already committed); `sharding` places dp batches
    directly into their mesh layout. A daemon thread keeps the bounded
    queue full, so the H2D copy of batch N+1 runs while step N computes."""

    _SENTINEL = object()

    def __init__(self, it: Iterable[Any], size: int = 2, sharding=None):
        import jax
        self._jax = jax
        self._sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=max(1, size))
        self._err: BaseException | None = None
        self._closed = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(iter(it),), daemon=True)
        self._thread.start()

    def _put(self, batch) -> None:
        # bounded put that aborts promptly when the consumer closes
        while True:
            try:
                self._q.put(batch, timeout=0.1)
                return
            except queue.Full:
                if self._closed.is_set():
                    raise _Closed

    def _run(self, it: Iterator[Any]) -> None:
        # device_put takes the whole pytree (one batched transfer); a single
        # Sharding applies to every leaf
        dev = (lambda b: self._jax.device_put(b, self._sharding)) \
            if self._sharding is not None else self._jax.device_put
        try:
            for batch in it:
                if self._closed.is_set():
                    return
                self._put(dev(batch))
        except _Closed:
            return
        except BaseException as e:  # propagated to the consumer
            self._err = e
        try:
            self._put(self._SENTINEL)
        except _Closed:
            pass

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                batch = self._q.get(timeout=0.1)
                break
            except queue.Empty:
                if not self._thread.is_alive() and self._q.empty():
                    batch = self._SENTINEL
                    break
        if batch is self._SENTINEL:
            self.close()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return batch

    def close(self):
        self._closed.set()

    def __del__(self):
        self.close()


def make_loader(dataset, batch_size: int, *, num_workers: int = 4,
                prefetch: int = 2, sharding=None, seed: int = 0,
                drop_last: bool = True, epochs: int | None = None):
    """Shuffled epoch loader over an indexable dataset: parallel item fetch
    (worker_map) -> host stack -> device prefetch. Yields tuples of stacked
    device arrays, one per dataset column. epochs=None streams forever.

    Epoch semantics match LRHRDataset.batches: batches never span a
    reshuffle boundary, and with drop_last each epoch's remainder is
    dropped (not carried into the next epoch's first batch, which could
    duplicate a sample within one batch).

    Deterministic in `seed` regardless of num_workers — including
    augmentation: when the dataset exposes `getitem_rng(idx, rng)` (the
    LRHR datasets do), each fetch gets a random.Random keyed on
    (seed, epoch, idx), so flip decisions no longer race on the global
    `random` module across worker threads."""
    import random

    import numpy as np

    seeded = getattr(dataset, "getitem_rng", None)

    def fetch(key):
        epoch, idx = key
        if seeded is not None:
            # str seed: process-stable (tuple seeds are rejected by 3.12)
            return seeded(idx, random.Random(f"{seed}/{epoch}/{idx}"))
        return dataset[idx]

    def indices():
        rng = random.Random(seed)
        order = list(range(len(dataset)))
        epoch = 0
        while epochs is None or epoch < epochs:
            rng.shuffle(order)
            yield from ((epoch, i) for i in order)
            epoch += 1

    per_epoch = len(dataset)

    def batches():
        buf = []
        for pos, item in enumerate(worker_map(fetch, indices(),
                                              num_workers=num_workers)):
            buf.append(item)
            if len(buf) == batch_size:
                yield tuple(np.stack(col) for col in zip(*buf))
                buf = []
            if (pos + 1) % per_epoch == 0:  # reshuffle boundary
                if buf and not drop_last:
                    yield tuple(np.stack(col) for col in zip(*buf))
                buf = []

    return prefetch_to_device(batches(), size=prefetch, sharding=sharding)
