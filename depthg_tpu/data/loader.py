"""Host-side batching + prefetch: the TPU replacement for DataLoader workers.

The reference leans on torch DataLoader worker *processes*
(``src/train_segmentation.py:651``); here decode/transform runs in a thread
pool (PIL releases the GIL during JPEG decode) and finished batches are staged
into a small queue so the accelerator never waits on the host. Determinism is
explicit: each index gets its own ``np.random.Generator`` seeded from
(base_seed, epoch, index), so results are identical regardless of thread
interleaving — a property the reference's global-seed dance can't offer.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def default_collate(items: list) -> dict:
    """Stack a list of dicts of numpy arrays/scalars into batch arrays."""
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        first = vals[0]
        if isinstance(first, np.ndarray):
            try:
                out[key] = np.stack(vals)
            except ValueError:  # ragged (reference flexible_collate tolerance)
                out[key] = vals
        elif isinstance(first, (int, np.integer)):
            out[key] = np.asarray(vals, np.int64)
        elif isinstance(first, (float, np.floating)):
            out[key] = np.asarray(vals, np.float64)
        elif isinstance(first, (bool, np.bool_)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


def device_prefetch(iterator, place_fn, depth: int = 2):
    """Double-buffer host->HBM: keep ``depth`` batches placed on device ahead
    of the consumer, so the transfer of batch k+1 runs while step k computes
    (``jax.device_put`` is asynchronous). ``place_fn(host_batch)`` does the
    device placement (e.g. ``mesh.shard_batch`` after dtype fixes).

    The staging runs on a thread: even when the runtime serializes transfers
    with compute (observed on tunneled single-chip setups), the host-side
    work — dtype casts, ndarray assembly, dispatch bookkeeping — still
    overlaps the device step.
    """
    import queue as _queue
    import threading as _threading

    q: _queue.Queue = _queue.Queue(maxsize=depth)
    stop = _threading.Event()

    def stage():
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                q.put(place_fn(batch))
        finally:
            q.put(None)

    t = _threading.Thread(target=stage, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            yield item
    finally:
        stop.set()
        while t.is_alive():
            try:
                q.get_nowait()
            except _queue.Empty:
                break


class DataLoader:
    """Iterable over collated batches with threaded prefetch.

    Shuffling reshuffles each epoch from ``seed``; ``__iter__`` may be called
    repeatedly (epoch counter advances). Batches are numpy; feed to device
    with ``parallel.mesh.shard_batch``.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = False, seed: int = 0,
                 prefetch: int = 2, collate_fn=default_collate):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.collate_fn = collate_fn
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self, epoch: int):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        limit = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, limit, self.batch_size):
            yield order[start:start + self.batch_size]

    def _fetch(self, epoch: int, idx: int):
        rng = np.random.default_rng((self.seed, epoch, int(idx)))
        getitem = self.dataset.__getitem__
        try:
            return getitem(int(idx), rng)
        except TypeError:
            return getitem(int(idx))

    def __iter__(self):
        epoch = self._epoch
        self._epoch += 1
        batches = list(self._index_batches(epoch))
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_idx in batches:
                    if stop.is_set():
                        break
                    items = list(pool.map(lambda i: self._fetch(epoch, i), batch_idx))
                    out_q.put(self.collate_fn(items))
            out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
