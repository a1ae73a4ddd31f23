"""Fixed-shape batching + host→device prefetch. Replaces torch DataLoader.

TPU-first design: every batch has the exact same shape — videos
(B, frames, feat) batch-first (reference keeps videos batch-first,
dataset/MSVD.py:71) and captions time-major (T, B) (the reference transposes
at dataset/MSVD.py:72). A short final batch is padded by repeating the last
example with vid="PAD" (reference: dataset/MSVD.py:57-61,80-84), so the jitted
step never sees a new shape and never recompiles.

The prefetcher is a daemon thread pushing ready device arrays through a small
queue — the host assembles batch N+1 while the TPU runs batch N (replaces
DataLoader(num_workers=4), reference: config.py:53).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Sequence

import numpy as np


class Batcher:
    """Iterates a CaptionDataset/ScoreDataset in fixed-size batches."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, has_captions: bool = True,
                 index_mode: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.has_captions = has_captions
        # index_mode: yield (vids, video_row_idx (B,) int32, captions)
        # instead of materialized feature arrays — for the device feature
        # cache (config.device_feature_cache). Same shuffle stream as the
        # materializing mode, so the two are batch-for-batch identical.
        self.index_mode = index_mode
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        for start in range(0, n, self.batch_size):
            idxs = order[start:start + self.batch_size]
            yield self._collate(idxs)

    def _collate(self, idxs: Sequence[int]):
        if self.index_mode:
            items = [self.dataset.get_indexed(int(i)) for i in idxs]
            pad_len = self.batch_size - len(items)
            vids = [it[0] for it in items] + ["PAD"] * pad_len
            if pad_len:
                items = items + [items[-1]] * pad_len
            rows = np.asarray([it[1] for it in items], np.int32)
            captions = np.stack([np.asarray(it[2], np.int32)
                                 for it in items])
            return vids, rows, captions.T
        items = [self.dataset.get(int(i)) for i in idxs]
        pad_len = self.batch_size - len(items)
        vids = [it[0] for it in items] + ["PAD"] * pad_len
        if pad_len:
            items = items + [items[-1]] * pad_len

        videos = np.stack([np.asarray(it[1], np.float32) for it in items])
        if not self.has_captions:
            return vids, videos
        captions = np.stack([np.asarray(it[2], np.int32) for it in items])
        captions = captions.T  # (T, B) time-major for lax.scan
        return vids, videos, captions


def cycle(iterable: Iterable) -> Iterator:
    """Infinite epoch loop (reference: utils.py:5-8)."""
    while True:
        for x in iterable:
            yield x


def prefetch_to_device(iterator: Iterator, size: int = 2, sharding=None,
                       device_indices: Optional[Sequence[int]] = None):
    """Overlap host batch assembly + H2D transfer with device compute.

    Array leaves are jax.device_put (optionally with a NamedSharding so
    batches land pre-sharded across the mesh); non-array leaves (vid string
    lists) pass through untouched. ``sharding`` may be a single sharding or
    a tuple with one entry per batch element (e.g. videos batch-first,
    captions time-major).

    Multi-host: when the process group has >1 process, sharded leaves go
    through parallel.distributed.put_global — each process holds the full
    (identical, seed-reproduced) batch and transfers only its own shards.
    """
    import jax

    multihost = jax.process_count() > 1

    q: queue.Queue = queue.Queue(maxsize=size)
    _SENTINEL = object()
    _ERROR = object()

    def put(batch):
        def maybe_put(x, s):
            if isinstance(x, np.ndarray):
                if s is not None and multihost:
                    from recnet_tpu.parallel.distributed import put_global
                    return put_global(x, s)
                return jax.device_put(x, s) if s is not None \
                    else jax.device_put(x)
            return x
        if isinstance(sharding, (tuple, list)):
            return tuple(maybe_put(x, s) for x, s in zip(batch, sharding))
        return tuple(maybe_put(x, sharding) for x in batch)

    stop = threading.Event()

    def worker():
        # A producer failure must surface in the consumer, not end the
        # stream quietly (a swallowed I/O error mid-training would make
        # train() return early as if the run had finished).
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                item = put(batch)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            q.put((_ERROR, e))
        else:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, tuple) and len(item) == 2 \
                    and item[0] is _ERROR:
                raise RuntimeError("prefetch worker failed") from item[1]
            yield item
    finally:
        # Consumer stopped early (train() hit n_iterations): tell the
        # worker to quit so no background device transfers race the
        # interpreter / jax.distributed teardown (a daemon thread mid-
        # device_put during multi-host shutdown can wedge the exit
        # barrier), and drain so a blocked put unblocks promptly.
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5)
