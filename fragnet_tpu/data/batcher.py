"""Static-shape batch loader: shuffling, size-bucketed padding, device put.

TPU replacement for torch DataLoader + collate_fn: each emitted batch has a
shape from a SMALL fixed set of PadSpecs (one per bucket) so XLA compiles a
bounded number of step variants; molecules are packed greedily until a cap
would overflow.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence

import jax
import numpy as np

from fragnet_tpu.graphs.build import MolGraph
from fragnet_tpu.graphs.hiergraph import HierGraphBatch, PadSpec, fits, pad_batch, spec_for


class BatchLoader:
    """Iterable over HierGraphBatch with static shapes.

    * ``spec`` fixed across all batches (single compilation);
    * shuffle with a numpy seed per epoch;
    * short final batches are padded with empty graph slots.
    """

    def __init__(
        self,
        graphs: Sequence[MolGraph],
        batch_size: int,
        spec: Optional[PadSpec] = None,
        shuffle: bool = False,
        seed: int = 0,
        n_tasks: int = 1,
        with_targets: bool = False,
        to_device: bool = True,
        drop_last: bool = False,
    ):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.spec = spec or spec_for(self.graphs, batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.n_tasks = n_tasks
        self.with_targets = with_targets
        self.to_device = to_device
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.graphs)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[HierGraphBatch]:
        order = np.arange(len(self.graphs))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
            self._epoch += 1

        i = 0
        while i < len(order):
            window: List[MolGraph] = []
            while i < len(order) and len(window) < self.batch_size:
                cand = self.graphs[order[i]]
                if window and not fits(window + [cand], self.spec):
                    break
                if not window and not fits([cand], self.spec):
                    # single molecule exceeding the spec: skip it loudly
                    print(f"[batcher] molecule too large for spec, skipped: "
                          f"{cand.smiles}")
                    i += 1
                    continue
                window.append(cand)
                i += 1
            if not window:
                continue
            if self.drop_last and len(window) < self.batch_size and i >= len(order):
                break
            batch = pad_batch(window, self.spec, n_tasks=self.n_tasks,
                              with_targets=self.with_targets)
            if self.to_device:
                batch = jax.tree.map(
                    lambda x: jax.device_put(x) if x is not None else None, batch
                )
            yield batch

    def prefetch(self, depth: int = 2) -> Iterator[HierGraphBatch]:
        """Iterate with ``depth`` batches already enqueued on the device —
        overlaps host padding/transfer with device compute (the role of
        torch DataLoader workers + pinned memory in the reference)."""
        import collections

        queue: collections.deque = collections.deque()
        it = iter(self)
        try:
            for _ in range(depth):
                queue.append(next(it))
        except StopIteration:
            pass
        while queue:
            batch = queue.popleft()
            try:
                queue.append(next(it))
            except StopIteration:
                pass
            yield batch
