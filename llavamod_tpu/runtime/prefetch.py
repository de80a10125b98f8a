"""Host->device input pipelining.

TPU steps are async: dispatching step N returns immediately while the chip
executes, so the host should use that window to assemble and TRANSFER batch
N+1.  `DevicePrefetcher` wraps any host batch iterator and keeps `depth`
batches resident on device (sharded when a mesh is given) — by the time the
train loop asks for the next batch, its H2D transfer has already happened.

Replaces what the reference gets from torch DataLoader pinned-memory workers
+ CUDA streams (SURVEY.md §3.1 process/device boundaries).
"""

from __future__ import annotations

import collections
from typing import Any, Dict, Iterable, Iterator, Optional


class DevicePrefetcher:
    def __init__(self, batches: Iterable[Dict[str, Any]], *, mesh=None,
                 depth: int = 2):
        self._it = iter(batches)
        self._mesh = mesh
        self._depth = max(1, depth)
        self._queue: collections.deque = collections.deque()

    def _put(self, batch):
        import jax

        if self._mesh is not None:
            from llavamod_tpu.parallel.sharding import shard_batch

            return shard_batch(self._mesh, batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    def _fill(self):
        while len(self._queue) < self._depth:
            try:
                batch = next(self._it)
            except StopIteration:
                return
            # device_put is async: the transfer proceeds while we return
            self._queue.append(self._put(batch))

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        self._fill()
        while self._queue:
            out = self._queue.popleft()
            self._fill()
            yield out
