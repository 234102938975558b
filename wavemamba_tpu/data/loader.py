"""Data loading: sampler + threaded host loader + device prefetch.

TPU-native redesign of the reference's torch DataLoader stack:
  * EnlargedSampler (`basicsr/data/data_sampler.py:6-48`): epoch-seeded
    permutation over an enlarged index space, rank-strided — the
    data-parallel sharding mechanism, reproduced exactly (each JAX process
    takes its process_index stride).
  * ThreadedLoader replaces torch's worker processes + PrefetchDataLoader
    (`prefetch_dataloader.py:7-60`): cv2 decode/augment release the GIL, so
    a thread pool saturates host cores without pickling overhead.
  * device_prefetch replaces CUDAPrefetcher (`prefetch_dataloader.py:84-125`):
    keeps N batches in flight onto HBM (async `jax.device_put`), hiding
    host->device copies behind the train step.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

import jax


class EnlargedSampler:
    def __init__(self, dataset_size: int, num_replicas: int, rank: int, ratio: int = 1):
        self.dataset_size = dataset_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.num_samples = int(np.ceil(dataset_size * ratio / num_replicas))
        self.total_size = self.num_samples * num_replicas

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.RandomState(self.epoch)
        indices = rng.permutation(self.total_size)
        indices = (indices % self.dataset_size).tolist()
        indices = indices[self.rank : self.total_size : self.num_replicas]
        return iter(indices)

    def __len__(self):
        return self.num_samples


def _collate(items: list[dict]):
    """Stack numpy leaves; keep strings/paths as lists."""
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


class ThreadedLoader:
    """Iterate batches of a map-style dataset with background prefetch."""

    def __init__(self, dataset, batch_size=1, sampler=None, shuffle=False,
                 num_workers=4, drop_last=False, seed=None, prefetch=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch):
        self._epoch = epoch
        if self.sampler is not None:
            self.sampler.set_epoch(epoch)

    def _index_batches(self):
        if self.sampler is not None:
            indices = list(iter(self.sampler))
        elif self.shuffle:
            indices = np.random.RandomState(
                None if self.seed is None else self.seed + self._epoch
            ).permutation(len(self.dataset)).tolist()
        else:
            indices = list(range(len(self.dataset)))
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        return batches

    def __iter__(self):
        batches = self._index_batches()
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that re-checks `stop` so an abandoned consumer
            (e.g. train loop break at total_iters) can't leave the worker
            blocked forever on a full queue."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, batch_idx))
                        if not put_or_stop(_collate(items)):
                            return
            except Exception as e:  # surface worker errors to the consumer
                put_or_stop(e)
            finally:
                put_or_stop(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


_EXHAUSTED = object()  # sentinel: upstream iterator finished


def device_prefetch(iterator, sharding=None, depth=2):
    """Keep `depth` batches in flight on device (double-buffering).

    Array leaves are placed on device (optionally with a NamedSharding);
    non-array leaves pass through untouched. With a sharding, each process
    contributes its PROCESS-LOCAL batch and the global array is assembled
    via `jax.make_array_from_process_local_data` — on a single host this
    degenerates to a plain sharded device_put, on multi-host it avoids
    device_put of a local array onto a non-fully-addressable sharding.
    """
    import collections

    multiproc = jax.process_count() > 1

    def put_leaf(v):
        if sharding is None:
            return jax.device_put(v)
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, v)
        return jax.device_put(v, sharding)

    def put(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype != object:
                out[k] = put_leaf(v)
            else:
                out[k] = v
        return out

    # Host->device staging happens on a dedicated thread: device_put through
    # a slow interconnect (or a tunneled device) can block for the whole
    # transfer, and doing it inline would serialize transfers with the train
    # step. One worker preserves batch order.
    import queue
    import threading

    it = iter(iterator)
    # Daemon worker: an in-flight device_put through a slow tunnel must not
    # block interpreter exit after the consumer abandons the generator
    # (non-daemon threads are joined at exit). The bounded queue provides the
    # `depth`-deep double-buffer; `stop` ends the worker when the consumer
    # closes the generator early.
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            for batch in it:
                staged = put(batch)
                while not stop.is_set():
                    try:
                        q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(_EXHAUSTED)
        except BaseException as e:  # surface worker errors to the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _EXHAUSTED:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def build_dataset(opt: dict):
    """`{'type': 'PairedImageDataset'|..., ...}` -> dataset
    (mirrors `basicsr/data/__init__.py:29-52`)."""
    from wavemamba_tpu.data.paired_image_dataset import (
        PairedImageDataset,
        SingleImageDataset,
    )

    dmap = {
        "PairedImageDataset": PairedImageDataset,
        "SingleImageDataset": SingleImageDataset,
    }
    name = opt["type"]
    if name not in dmap:
        raise KeyError(f"Unknown dataset type {name!r}; known: {sorted(dmap)}")
    return dmap[name](opt)


def build_dataloader(dataset, opt: dict, num_replicas=1, rank=0, sampler=None, seed=None):
    """Phase-aware loader construction (`basicsr/data/__init__.py:55-117`)."""
    phase = opt.get("phase", "val")
    if phase == "train":
        return ThreadedLoader(
            dataset,
            batch_size=opt.get("batch_size_per_gpu", 1),
            sampler=sampler,
            shuffle=sampler is None,
            num_workers=opt.get("num_worker_per_gpu", 4),
            drop_last=True,
            seed=seed,
        )
    return ThreadedLoader(dataset, batch_size=1, num_workers=1, shuffle=False)
