"""Input pipeline: deterministic sharded batching + host->device prefetch.

The reference is a sampler library and ships no data story (SURVEY: no
trainer, no loader); the TPU build ships training, and a training step that
waits on the host for its batch wastes the chip.  Two pieces, both plain
and dependency-free:

* :class:`EpochLoader` — deterministic shuffled epochs over an in-memory
  array set (counter-based permutation keys: batch ``n`` of epoch ``e`` is
  a pure function of ``(seed, e, n)``, so resume at any step reproduces the
  exact stream without replaying it).
* :func:`prefetch_to_device` — wraps ANY host batch iterator and keeps
  ``depth`` batches ahead: each batch is ``device_put`` with the training
  sharding while the chip still computes the previous step, so the H2D copy
  (PCIe/DMA) overlaps compute instead of serializing with it.  ``depth=2``
  is double buffering; more only helps when batch production is bursty.

``device_put`` is asynchronous in JAX — it returns immediately with the
transfer in flight — so the prefetcher needs no threads for the copy
itself; the thread exists only to run the *host-side* iterator (decode,
augment, permutation indexing) ahead of the consumer.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator

import jax
import numpy as np

__all__ = ["EpochLoader", "prefetch_to_device"]


class EpochLoader:
    """Deterministic shuffled epochs over in-memory arrays.

    ``data`` is a pytree of arrays sharing a leading example axis.  Batches
    are drawn by a permutation derived from ``fold_in(seed_key, epoch)`` —
    the stream is a pure function of ``(seed, epoch, step)``: two loaders
    with the same seed yield identical batches, and resuming at step ``k``
    costs an index computation, not a replay.  The trailing ragged remainder
    of each epoch is dropped (constant batch shape keeps one executable)."""

    def __init__(self, data: Any, batch: int, key: jax.Array, drop_remainder: bool = True):
        leaves = jax.tree.leaves(data)
        if not leaves:
            raise ValueError("empty data pytree")
        self.count = int(leaves[0].shape[0])
        if any(int(leaf.shape[0]) != self.count for leaf in leaves):
            raise ValueError("all data leaves must share the leading example axis")
        if batch > self.count:
            raise ValueError(f"batch {batch} > dataset size {self.count}")
        self.data = data
        self.batch = batch
        self.key = key
        self.per_epoch = self.count // batch if drop_remainder else -(-self.count // batch)

    def _perm(self, epoch: int) -> np.ndarray:
        # host-side permutation from a counter-based key: cheap, stateless
        return np.asarray(jax.random.permutation(jax.random.fold_in(self.key, epoch), self.count))

    def batch_at(self, step: int) -> Any:
        "The batch for global step ``step`` (epoch/step derived; O(1) resume)."
        epoch, n = divmod(step, self.per_epoch)
        idx = self._perm(epoch)[n * self.batch : min((n + 1) * self.batch, self.count)]
        return jax.tree.map(lambda leaf: leaf[idx], self.data)

    def iter_from(self, start: int) -> Iterator[Any]:
        "Iterate batches starting at global step ``start`` (O(1) resume cursor)."
        step = start
        while True:
            yield self.batch_at(step)
            step += 1

    def __iter__(self) -> Iterator[Any]:
        return self.iter_from(0)


def prefetch_to_device(
    iterator: Iterator[Any],
    sharding: Any = None,
    depth: int = 2,
    place: Callable[[Any], Any] | None = None,
) -> Iterator[Any]:
    """Iterate ``iterator`` with ``depth`` batches already on device.

    ``sharding`` is a ``jax.sharding.Sharding`` (or pytree of them matching
    the batch structure) passed to ``device_put``; None places on the
    default device.  ``place`` overrides placement entirely (e.g.
    ``lambda b: shard_batch(mesh, b)``).  A daemon thread runs the host
    iterator and enqueues in-flight device transfers; the consumer pops
    batches that are typically already resident.  The queue is bounded, so
    a slow consumer backpressures the producer instead of buffering the
    dataset.  Ends when ``iterator`` ends; the thread dies with it."""
    if place is None:

        def place(batch: Any) -> Any:  # noqa: A001 - local default
            if sharding is None:
                return jax.device_put(batch)
            return jax.device_put(batch, sharding)

    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    _end = object()

    def producer() -> None:
        try:
            for batch in iterator:
                q.put(place(batch))
        except Exception as exc:  # surface producer errors at the consumer
            q.put(exc)
            return
        q.put(_end)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is _end:
            return
        if isinstance(item, Exception):
            raise item
        yield item
