"""Minimal prefetching batch loader with per-host sharding.

Replaces torch DataLoader + accelerate's `split_batches` (SURVEY.md 2.11):
each host slices the index space by (shard_index, num_shards) - the
jax.process_index()-based data sharding of a TPU pod - shuffles its slice
per epoch, collates numpy dicts and prefetches batches on a background
thread so condition building overlaps device step time.

Workers: `num_workers` threads (fine when the per-item work releases the
GIL) or true processes with `use_processes=True` - the torch
`DataLoader(num_workers)` equivalent, needed when numpy-heavy __getitem__
code serializes on the GIL.  Worker processes are forked before any jax
usage in them; they run only numpy/cv2.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

_WORKER_DS = None


def _worker_init(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset
    try:  # avoid cv2-internal thread pools x process pool oversubscription
        import cv2

        cv2.setNumThreads(1)
    except Exception:
        pass


def _worker_get(idx):
    return _WORKER_DS[idx]


def _collate(items):
    first = items[0]
    if isinstance(first, dict):
        return {k: _collate([it[k] for it in items]) for k in first}
    if isinstance(first, (str, bytes)):
        return list(items)
    if isinstance(first, tuple):
        return tuple(_collate([it[i] for it in items]) for i in range(len(first)))
    return np.stack([np.asarray(it) for it in items])


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        prefetch: int = 2,
        num_workers: int = 0,
        use_processes: bool = False,
    ):
        assert 0 <= shard_index < num_shards
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.use_processes = use_processes
        self.epoch = 0
        self._pool = None

    def _get_pool(self):
        if self._pool is None:
            if self.use_processes:
                import multiprocessing as mp
                from concurrent.futures import ProcessPoolExecutor

                self._pool = ProcessPoolExecutor(
                    self.num_workers,
                    mp_context=mp.get_context("fork"),
                    initializer=_worker_init,
                    initargs=(self.dataset,),
                )
            else:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(self.num_workers)
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # contiguous per-host slice of the (shuffled) global order
        return idx[self.shard_index :: self.num_shards]

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> Iterator:
        idx = self._indices()
        nb = len(self)
        if self.num_workers > 0:
            pool = self._get_pool()
            fetch = _worker_get if self.use_processes else self.dataset.__getitem__
            for b in range(nb):
                sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
                yield _collate(list(pool.map(fetch, (int(i) for i in sel))))
        else:
            for b in range(nb):
                sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
                yield _collate([self.dataset[i] for i in sel])

    def __iter__(self):
        self.epoch += 1
        if self.prefetch <= 0:
            yield from self._batches()
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def producer():
            try:
                for b in self._batches():
                    q.put(b)
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if err:
            raise err[0]


def pad_batch(batch: dict, batch_size: int):
    """Pad a ragged tail batch up to `batch_size` by repeating its last
    element, so one jitted eval program serves every batch on any mesh size
    (no recompiles, no non-divisible shardings).  Array values are padded
    along axis 0; list values (names) are extended.  Returns
    (padded_batch, n_valid); slice outputs back to n_valid."""
    n = None
    for v in batch.values():
        n = len(v) if isinstance(v, list) else v.shape[0]
        break
    assert n is not None and n <= batch_size, (n, batch_size)
    if n == batch_size:
        return batch, n
    pad = batch_size - n
    out = {}
    for k, v in batch.items():
        if isinstance(v, list):
            out[k] = v + [v[-1]] * pad
        else:
            reps = np.repeat(v[-1:], pad, axis=0)
            out[k] = np.concatenate([v, reps], axis=0)
    return out, n


def cycle(loader) -> Iterator:
    """Endless batch stream (the reference's `cycle`, train.py:194)."""
    while True:
        yield from loader
