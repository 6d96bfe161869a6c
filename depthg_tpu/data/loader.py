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


# image-valued keys whose floats are EXACTLY (u/255 - mean)/std of the
# original uint8 pixels (transforms normalize as the last host step), so
# they round-trip through uint8 losslessly — 4x less transfer volume
_IMAGENET_KEYS = ("img", "img_pos", "img_aug")


def pack_batch(batch: dict, keys) -> tuple:
    """Fuse a batch dict into TWO host buffers (u8 + f32) + a static spec.

    Rationale: every ``device_put`` carries a fixed per-call latency (on a
    tunneled runtime ~340 ms — five arrays per training batch made the
    transfer, not the 59 ms step, the wall), and bandwidth there is scarce.
    One packed buffer per dtype class pays the latency twice total;
    ImageNet-normalized images invert exactly to their source uint8 pixels
    and are re-normalized on device (``unpack_batch``); integer labels ride
    as f32 (exact for |v| < 2^24) and are cast back on device.
    """
    from depthg_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    mean = np.asarray(IMAGENET_MEAN, np.float32)[:, None, None]
    std = np.asarray(IMAGENET_STD, np.float32)[:, None, None]
    spec, parts_f, parts_u, off_f, off_u = [], [], [], 0, 0

    for k in sorted(keys):
        if k not in batch:
            continue
        v = np.asarray(batch[k])
        u8 = kind = None
        if k in _IMAGENET_KEYS and v.ndim == 4 and v.shape[1] == 3:
            uf = (v * std + mean) * 255.0
            u = np.rint(uf)
            # lossless ONLY if the floats really sit on the uint8 lattice
            # (range alone is not enough: an all-zero padded image maps to
            # in-range but non-integral 123.675 and would be silently
            # quantized); 1e-2 covers f32 normalize/denormalize rounding
            if (v.size and (u >= -0.5).all() and (u <= 255.5).all()
                    and np.abs(uf - u).max() < 1e-2):
                u8, kind = np.clip(u, 0, 255).astype(np.uint8), "imagenet_u8"
        elif np.issubdtype(v.dtype, np.floating):
            # integer-valued floats in [0, 255] (e.g. depth decoded from
            # 8-bit PNGs) ride the u8 buffer exactly
            u = np.rint(v)
            if (v.size and (v >= 0).all() and (v <= 255).all()
                    and np.abs(v - u).max() == 0.0):
                u8, kind = u.astype(np.uint8), "raw_u8"
        elif np.issubdtype(v.dtype, np.integer):
            if v.size and v.min() >= -1 and v.max() <= 254:
                # small ints (labels, -1 = ignore) shifted by +1
                u8, kind = (v + 1).astype(np.uint8), "int_u8_off1"
        elif v.dtype == np.bool_:
            u8, kind = v.astype(np.uint8), "bool_u8"

        if u8 is not None:
            u8 = u8.ravel()
            spec.append((k, kind, tuple(v.shape), off_u, u8.size))
            parts_u.append(u8)
            off_u += u8.size
            continue
        if np.issubdtype(v.dtype, np.integer) and v.size and (
                np.abs(v, dtype=np.int64).max() >= 2 ** 24):
            # the fallback buffer is f32, exact only for |v| < 2^24 — large
            # indices (e.g. KNN ids of >16.7M-row datasets) would silently
            # corrupt; such keys need their own transfer, not the pack
            raise ValueError(
                f"pack_batch: integer key '{k}' has values >= 2^24 that do "
                "not survive the f32 buffer; transfer it separately")
        arr = np.ascontiguousarray(v, np.float32).ravel()
        # jax runs x64-disabled: integer labels come back int32 (all label
        # spaces here are tiny); floats keep f32
        dtype = ("int32" if np.issubdtype(v.dtype, np.integer)
                 else "bool" if v.dtype == np.bool_ else "float32")
        spec.append((k, dtype, tuple(v.shape), off_f, arr.size))
        parts_f.append(arr)
        off_f += arr.size
    buf_f = (np.concatenate(parts_f) if parts_f else np.zeros((0,), np.float32))
    buf_u = (np.concatenate(parts_u) if parts_u else np.zeros((0,), np.uint8))
    return (buf_f, buf_u), tuple(spec)


def unpack_batch(bufs, spec):
    """Device-side inverse of ``pack_batch``; call under jit (spec static)."""
    import jax.lax
    import jax.numpy as jnp

    from depthg_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    buf_f, buf_u = bufs
    out = {}
    for k, dtype, shape, off, size in spec:
        if dtype in ("imagenet_u8", "raw_u8", "int_u8_off1", "bool_u8"):
            x = jax.lax.dynamic_slice(buf_u, (off,), (size,)).reshape(shape)
            if dtype == "imagenet_u8":
                x = x.astype(jnp.float32) / 255.0
                mean = jnp.asarray(IMAGENET_MEAN)[None, :, None, None]
                std = jnp.asarray(IMAGENET_STD)[None, :, None, None]
                out[k] = (x - mean) / std
            elif dtype == "raw_u8":
                out[k] = x.astype(jnp.float32)
            elif dtype == "int_u8_off1":
                out[k] = x.astype(jnp.int32) - 1
            else:
                out[k] = x.astype(jnp.bool_)
        else:
            x = jax.lax.dynamic_slice(buf_f, (off,), (size,)).reshape(shape)
            out[k] = x.astype(dtype)
    return out


def _put_or_stop(q, item, stop, timeout: float = 0.2) -> bool:
    """put() that never deadlocks a daemon producer: when the consumer has
    gone away (generator closed) the bounded queue stays full — poll with a
    timeout and bail once ``stop`` is set instead of blocking forever."""
    import queue as _queue

    while True:
        try:
            q.put(item, timeout=timeout)
            return True
        except _queue.Full:
            if stop.is_set():
                return False


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
                if not _put_or_stop(q, place_fn(batch), stop):
                    return
            _put_or_stop(q, None, stop)
        except BaseException as e:      # forward to the consumer — a swallowed
            _put_or_stop(q, e, stop)    # staging error must not look like a
                                        # clean end-of-epoch
    t = _threading.Thread(target=stage, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
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
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            break
                        items = list(pool.map(lambda i: self._fetch(epoch, i),
                                              batch_idx))
                        if not _put_or_stop(out_q, self.collate_fn(items), stop):
                            return
                _put_or_stop(out_q, None, stop)
            except BaseException as e:  # forward: a dead producer must not
                _put_or_stop(out_q, e, stop)  # leave the consumer blocked

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
