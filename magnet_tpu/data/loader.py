"""Host-side batching / prefetching data pipeline.

Replaces torch DataLoader (reference h5_datamodule.py:66-72 — which notably
shuffles even val/test; we default to the same for behavioral parity, with a
switch).  Batches are collated to numpy; a background thread overlaps
HDF5 reads + graph building with TPU compute (the TPU analog of DataLoader
worker processes).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


def collate(items: list[dict]) -> dict:
    out = {}
    for k in items[0]:
        out[k] = np.stack([np.asarray(it[k]) for it in items])
    return out


class DataLoader:
    """Map-style loader: shuffle, batch, collate, optional transform and
    background prefetch.

    Args:
      dataset: object with __len__/__getitem__-> dict and set_epoch(seed).
      batch_size: fixed batch size; the trailing partial batch is DROPPED
        (fixed shapes for jit; torch's default keeps it — configurable
        upstream by sizing datasets to a multiple).
      transform: optional fn(batch_dict) -> batch_dict applied post-collate
        (e.g. host graph building).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        transform: Optional[Callable[[dict], dict]] = None,
        prefetch: int = 2,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.transform = transform
        self.prefetch = prefetch
        self.drop_last = drop_last
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self.seed * 100003 + epoch)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 7919 + self._epoch)
            rng.shuffle(idx)
        return idx

    def _iter_sync(self) -> Iterator[dict]:
        idx = self._indices()
        nb = len(self)
        for b in range(nb):
            sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
            if len(sel) == 0:
                break
            batch = collate([self.dataset[int(i)] for i in sel])
            if self.transform is not None:
                batch = self.transform(batch)
            yield batch

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            yield from self._iter_sync()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list[BaseException] = []

        def worker():
            try:
                for batch in self._iter_sync():
                    q.put(batch)
            except BaseException as e:  # surface in consumer
                err.append(e)
            finally:
                q.put(sentinel)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
