"""Host-side batching + prefetch loader (replaces torch DataLoader workers,
``run_pretrain.py:255`` num_workers=8).

- worker *processes* for sample fetch + collate (``num_workers > 0``;
  the constructor default is 0, every task loop passes
  ``TrainConfig.num_workers`` whose default -1 auto-sizes to
  ``min(8, cores-1)``, threaded on <=2-core hosts) — PIL convert/resize
  and the numpy normalize chain hold the GIL, so a thread pool scales
  NEGATIVELY on multi-core hosts (measured: 1 thread 127 images/s, 8
  threads 51); the reference's torch DataLoader uses processes for the
  same reason.
  Workers inherit the dataset via fork (one-time cost), each builds a
  whole collated batch so IPC is one pickled dict per batch,
- threaded fetch fallback (``num_workers=0``) for cheap/synthetic
  datasets where fork overhead dominates,
- background prefetch queue overlapping host work with device steps,
- per-process index sharding for multi-host DP (each host loads only its
  slice — no reference equivalent, the reference is single-process),
- deterministic order: shuffle is keyed by (seed, epoch), samples by
  (seed, epoch, index) inside the datasets — worker count never changes
  the stream.

Batches are dicts of stacked numpy arrays; non-array fields (ids, raw
strings) are returned as lists under the same key.
"""

from __future__ import annotations

import collections
import multiprocessing
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator

import numpy as np


def _collate(samples) -> Any:
    first = samples[0]
    if isinstance(first, dict):
        return {k: _collate([s[k] for s in samples]) for k in first}
    if isinstance(first, np.ndarray):
        return np.stack(samples)
    if isinstance(first, (np.integer, int, np.floating, float)):
        return np.asarray(samples)
    return list(samples)


# fork-inherited dataset handle for worker processes: passing the dataset
# through initargs pickles it once per worker; per-task pickling would
# resend it with every batch.
_WORKER_DATASET = None


def _pool_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _pool_batch(args):
    chunk, epoch = args
    samples = [_WORKER_DATASET.__getitem__(int(i), epoch) for i in chunk]
    return _collate(samples)


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_threads: int = 8, prefetch: int = 2,
                 process_index: int = 0, process_count: int = 1,
                 num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        if num_workers < 0:
            # auto: leave one core for the device-dispatch loop; on boxes
            # with <=2 cores worker processes are pure IPC overhead
            # (measured on a 1-core host: 8 procs 45 images/s vs
            # single-thread 62) so fall back to the threaded path
            import os
            cpus = os.cpu_count() or 1
            num_workers = 0 if cpus <= 2 else min(8, cpus - 1)
        if num_workers > 0:
            try:
                multiprocessing.get_context("fork")
            except ValueError:
                num_workers = 0      # no fork (non-POSIX): threaded fallback
        self.num_workers = num_workers

    def _indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            from mvlt_tpu.data.transforms import sample_rng
            rng = sample_rng(self.seed, epoch, 0, tag=1)
            rng.shuffle(idx)
        # host shard: truncate to a multiple of process_count FIRST so
        # every host sees exactly the same number of indices (and hence
        # batches) — a bare strided slice gives ceil vs floor counts and
        # desyncs multi-host SPMD steps (collective deadlock)
        n_even = n - n % self.process_count
        return idx[:n_even][self.process_index::self.process_count]

    def batches_per_epoch(self) -> int:
        n = len(self._indices(0))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, Any]]:
        idx = self._indices(epoch)
        nb = self.batches_per_epoch()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that re-checks stop: a consumer that abandons
            # the iterator mid-epoch would otherwise leave the producer
            # blocked in Queue.put forever (leaking the thread, its pool
            # and the prefetched batches)
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce_threads():
            with ThreadPoolExecutor(self.num_threads) as pool:
                for b in range(nb):
                    if stop.is_set():
                        return
                    chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    fetch = lambda i: self.dataset.__getitem__(int(i), epoch)
                    samples = list(pool.map(fetch, chunk))
                    if not put(_collate(samples)):
                        return
            put(None)

        def produce_procs():
            ctx = multiprocessing.get_context("fork")
            with ctx.Pool(self.num_workers, initializer=_pool_init,
                          initargs=(self.dataset,)) as pool:
                # bounded in-order submission: at most workers+prefetch
                # batches in flight so a slow consumer can't make the
                # pool's result buffer hold the whole epoch
                pending: "collections.deque" = collections.deque()
                limit = self.num_workers + self.prefetch
                b = 0
                while b < nb or pending:
                    while b < nb and len(pending) < limit \
                            and not stop.is_set():
                        chunk = idx[b * self.batch_size:
                                    (b + 1) * self.batch_size]
                        pending.append(pool.apply_async(
                            _pool_batch, ((chunk, epoch),)))
                        b += 1
                    if stop.is_set():
                        return
                    if not put(pending.popleft().get()):
                        return
            put(None)

        produce = produce_procs if self.num_workers > 0 else produce_threads

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


def device_prefetch(iterator, *, size: int = 2, sharding=None,
                    transform=None, threads: int = 1):
    """Keep ``size`` batches resident on device ahead of the consumer so
    host->HBM copies overlap the previous step's compute (replaces the
    reference's pinned-memory DataLoader behavior on the TPU side).

    The copies run in dedicated producer THREADS: ``jax.device_put`` is
    nominally async, but transports where it blocks until bytes land
    (e.g. a tunneled runtime) would otherwise serialize transfer with
    step dispatch in the consumer's loop.  The threads also pull the
    HOST iterator, so host-side batch assembly overlaps device compute
    even with an in-process (0-worker) loader.  With ``threads > 1``
    transfers pipeline each other (useful when each put is RTT-bound);
    batches are resequenced so delivery order ALWAYS matches the host
    iterator — epoch determinism is unaffected.

    ``transform`` (optional) maps the host batch (e.g. drop string fields)
    before the copy; ``sharding`` is passed to ``jax.device_put``.
    """
    import heapq
    import queue as _queue
    import threading

    import jax

    def put(batch):
        if transform is not None:
            batch = transform(batch)
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    iterator = iter(iterator)
    q: "_queue.Queue" = _queue.Queue(maxsize=max(size, threads))
    _END = object()
    stop = threading.Event()
    src_lock = threading.Lock()
    seq = [0]

    def next_numbered():
        with src_lock:
            try:
                batch = next(iterator)
            except StopIteration:
                return None
            s = seq[0]
            seq[0] += 1
            return s, batch

    def bounded_put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except _queue.Full:
                continue
        return False

    def produce():
        try:
            while not stop.is_set():
                nb = next_numbered()
                if nb is None:
                    bounded_put((None, _END))
                    return
                s, batch = nb
                if not bounded_put((s, put(batch))):
                    return
        except BaseException as e:        # surface producer errors
            bounded_put((None, e))

    workers = [threading.Thread(target=produce, daemon=True)
               for _ in range(max(1, threads))]
    for t in workers:
        t.start()
    ends = 0
    expect = 0
    held: list = []                        # heap of (seq, batch)
    try:
        while True:
            while held and held[0][0] == expect:
                yield heapq.heappop(held)[1]
                expect += 1
            s, item = q.get()
            if item is _END:
                ends += 1
                if ends == len(workers):
                    while held:            # drain any resequenced tail
                        yield heapq.heappop(held)[1]
                        expect += 1
                    return
                continue
            if isinstance(item, BaseException):
                raise item
            if s == expect:
                yield item
                expect += 1
            else:
                heapq.heappush(held, (s, item))
    finally:
        stop.set()
