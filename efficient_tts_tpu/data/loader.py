"""Epoch iterator with shuffling, sharding, and background prefetch.

Replaces torch DataLoader + DistributedSampler
(`nntts/bin/train.py:127-170`): pure-python worker threads prefetch and
collate batches on host while the device runs the previous step. In
multi-host runs each process takes a strided shard of the epoch
permutation (`shard_id`/`num_shards`), the analog of
DistributedSampler's `set_epoch` + stride sharding.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def data_loader(
    dataset,
    batch_size: int,
    collate_fn,
    shuffle: bool = True,
    seed: int = 0,
    epoch: int = 0,
    shard_id: int = 0,
    num_shards: int = 1,
    drop_last: bool = True,
    prefetch: int = 2,
    length_fn=None,
):
    """Yields collated batches for one epoch.

    With `length_fn(index) -> approx length`, batches group
    similar-length utterances (a jittered length sort), cutting the
    padded-frame waste of uniform batching; batch order is then
    shuffled. LJ mel lengths span ~100-870 frames, so uniform batches
    padded to the bucket max waste ~40% of conv FLOPs.
    """
    n = len(dataset)
    rng = np.random.default_rng(seed + epoch)
    if shuffle:
        order = rng.permutation(n)
    else:
        order = np.arange(n)
    order = order[shard_id::num_shards]
    if length_fn is not None:
        lengths = np.asarray([length_fn(int(i)) for i in order], np.float64)
        if shuffle:
            # jitter so bucket boundaries differ per epoch
            lengths = lengths * (1.0 + 0.05 * rng.standard_normal(len(lengths)))
        order = order[np.argsort(lengths, kind="stable")]
    if drop_last:
        usable = (len(order) // batch_size) * batch_size
        order = order[:usable]

    batches = [order[i : i + batch_size] for i in range(0, len(order), batch_size)]
    if not batches:
        return
    if length_fn is not None and shuffle:
        rng.shuffle(batches)

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker():
        try:
            for idxs in batches:
                if stop.is_set():
                    return
                q.put(collate_fn([dataset[int(i)] for i in idxs]))
            q.put(None)
        except BaseException as e:  # propagate to the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def device_prefetch(iterator, size: int = 2, mesh=None):
    """Move batches to device ahead of consumption so host->device
    transfer overlaps with the running step (the torch DataLoader
    pin_memory+workers analog for the jit world).

    `iterator` yields (epoch, batch_dict); with a mesh, batches are
    sharded over the 'data' axis.
    """
    import collections

    import jax

    last = (None, None)  # (source batch object, placed copy)

    def put(item):
        nonlocal last
        epoch, batch = item
        # identity fast path: `infinite_loader`'s whole-corpus-batch mode
        # yields the same dict every epoch — place it once, not per step
        # (host->device bandwidth + the relay's per-transfer host leak)
        if batch is last[0]:
            return epoch, last[1]
        if mesh is not None:
            from efficient_tts_tpu.parallel.sharding import batch_sharding

            placed = {
                k: jax.device_put(v, batch_sharding(mesh, ndim=v.ndim))
                for k, v in batch.items()
            }
        else:
            placed = jax.device_put(batch)
        last = (batch, placed)
        return epoch, placed

    queue = collections.deque()
    for item in iterator:
        queue.append(put(item))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def infinite_loader(dataset, batch_size, collate_fn, seed=0, **kw):
    """Endless stream over reshuffled epochs (the reference trains by step
    count over an infinite epoch loop, `efficient_tts_trainer.py:62-76`).
    Yields (epoch, batch).

    Degenerate-epoch fast path: when the whole dataset is ONE batch
    (full-corpus batches, e.g. small-corpus overfit runs) AND the
    dataset declares `deterministic_items = True`, reshuffling only
    permutes rows inside that single batch — gradient-identical — so
    the collated dict is built once and the SAME object is yielded
    every epoch. Datasets whose __getitem__ is stochastic (e.g. the
    vocoder's random segment crops) must NOT take this path: caching
    the epoch-0 batch would freeze every random crop for the whole run. Downstream placement (`device_prefetch`, the trainers)
    detects the repeat by identity and skips the host->device re-upload:
    that is one batch upload per RUN instead of per step, which matters
    both for host->device bandwidth and because some remote-device
    transports (the axon relay here) leak host memory per transfer —
    a fresh 7 MB upload every step OOM-killed an 11k-step run at
    ~130 GB RSS before this path existed."""
    whole_corpus_batch = (
        batch_size == len(dataset)
        or (batch_size > len(dataset) and not kw.get("drop_last", True))
    ) and getattr(dataset, "deterministic_items", False)
    if whole_corpus_batch:
        cached = list(data_loader(
            dataset, batch_size, collate_fn, seed=seed, epoch=0, **kw
        ))
        if len(cached) == 1:
            epoch = 0
            while True:
                yield epoch, cached[0]
                epoch += 1
    epoch = 0
    while True:
        for batch in data_loader(
            dataset, batch_size, collate_fn, seed=seed, epoch=epoch, **kw
        ):
            yield epoch, batch
        epoch += 1


def background_prefetch(iterator, size: int = 2):
    """Run `iterator` on a daemon thread, buffering up to `size` items.

    `infinite_loader` builds a fresh `data_loader` (and worker thread)
    per epoch, so on one-batch epochs (e.g. the 30-wav micro vocoder
    corpus at B=16) every step pays the full collate latency of a cold
    loader — the wav reads + segment mels never overlap device compute.
    This outer prefetcher decouples epochs from steps: the next batch is
    collated while the device runs the current one. Object identity of
    yielded items is preserved (the whole-corpus identity cache in
    `device_prefetch`/the trainers keys on it)."""
    q: queue.Queue = queue.Queue(maxsize=size)
    done = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
            q.put(done)
        except BaseException as e:  # propagate to the consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is done:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
