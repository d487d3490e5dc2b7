"""Data loader: shuffled, per-host sharded, prefetching batch iterator.

TPU-native replacement for the reference's torch DataLoader +
DistributedSampler (tools/engine.py:56-78): each JAX process loads only its
shard of the global batch (batch_per_host = global / num_processes, epochs
reshuffled by a seeded permutation shared across hosts, drop_last), with a
thread-pool prefetch pipeline feeding pinned numpy batches that the trainer
transfers to device asynchronously.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


def collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        if isinstance(samples[0][k], np.ndarray):
            out[k] = np.stack([s[k] for s in samples])
        else:
            out[k] = [s[k] for s in samples]
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        global_batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        num_hosts: Optional[int] = None,
        host_id: Optional[int] = None,
        drop_last: bool = True,
    ):
        if num_hosts is None:
            try:
                import jax

                num_hosts = jax.process_count()
                host_id = jax.process_index()
            except Exception:
                num_hosts, host_id = 1, 0
        assert global_batch_size % num_hosts == 0, (global_batch_size, num_hosts)
        self.dataset = dataset
        self.batch_per_host = global_batch_size // num_hosts
        self.shuffle = shuffle
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host contiguous shard of the shuffled order
        per = n // self.num_hosts if self.drop_last else -(-n // self.num_hosts)
        start = self.host_id * per
        shard = idx[start: start + per]
        if self.drop_last:
            usable = (len(shard) // self.batch_per_host) * self.batch_per_host
            shard = shard[:usable]
        return shard

    def __len__(self):
        n = len(self.dataset) // self.num_hosts
        return n // self.batch_per_host if self.drop_last else -(-n // self.batch_per_host)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        shard = self._epoch_indices()
        bs = self.batch_per_host
        batches = [shard[i: i + bs] for i in range(0, len(shard), bs)]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            # any dataset error must reach the consumer: a producer dying
            # silently leaves q.get() blocked forever (the round-3 "stalled
            # at iteration 0 for 5.5h" hang — a truncated native .so raised
            # OSError inside __getitem__ and the trainer never noticed)
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for bidx in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, bidx))
                        q.put(collate(samples))
            except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
                q.put(e)
                return
            q.put(None)

        th = threading.Thread(target=produce, daemon=True)
        th.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise RuntimeError("data loader worker failed") from batch
                yield batch
        finally:
            stop.set()


class InfiniteLoader:
    """Epoch-cycling iterator with fold advancement
    (reference helpers/__init__.py:5-27 semantics)."""

    def __init__(self, loader: DataLoader):
        self.loader = loader
        self.epoch = 0
        self._it = iter(loader)

    def next(self):
        try:
            return next(self._it)
        except StopIteration:
            self.epoch += 1
            self.loader.set_epoch(self.epoch)
            ds = self.loader.dataset
            if getattr(ds, "num_folds", None):
                ds.set_fold(ds.fold + 1)
            self._it = iter(self.loader)
            return next(self._it)
