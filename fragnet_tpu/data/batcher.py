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
        on_oversize: str = "skip",
        pack: bool = False,
        pack_compact: bool = False,
        compute_dtype=None,
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
        # oversize policy: 'skip' (train loaders — molecule dropped loudly)
        # or 'error' (eval loaders — a dropped molecule would silently
        # corrupt the reported metric; VERDICT r1 weak #6)
        assert on_oversize in ("skip", "error"), on_oversize
        self.on_oversize = on_oversize
        # pack=True: emit single-buffer compact batches (data/packing.py) —
        # ~6x less host→device traffic; pair with make_train_step(layout=...)
        self.pack = pack
        self.pack_compact = pack_compact
        self.compute_dtype = compute_dtype
        self.layout = None
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.graphs)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _windows(self) -> Iterator[List[MolGraph]]:
        """One epoch of greedy molecule windows (advances the shuffle
        state). Deterministic given (seed, epoch) — the multi-worker packed
        stream relies on every worker producing the identical sequence."""
        order = np.arange(len(self.graphs))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
            self._epoch += 1

        _FIT_KEYS = ("n_atoms", "n_edges", "n_frags", "n_fconn",
                     "n_bg_edges", "n_fc_edges")
        caps = tuple(getattr(self.spec, k) for k in _FIT_KEYS)
        aligned = self.spec.align
        # per-axis node tiles (PadSpec.tn_of): first four _FIT_KEYS are the
        # aligned node levels atom / bond / frag / fc
        lvl_tn = [self.spec.tn_of(l) for l in ("atom", "bond", "frag", "fc")]

        def bump(pos: int, cnt: int, tn: int) -> int:
            # aligned packing: a molecule that would straddle a tn boundary
            # starts at the next tile (mirrors hiergraph._aligned_starts)
            if aligned and tn and cnt <= tn \
                    and (pos % tn) + cnt > tn:
                pos = ((pos + tn - 1) // tn) * tn
            return pos + cnt

        i = 0
        while i < len(order):
            window: List[MolGraph] = []
            totals = [0] * len(_FIT_KEYS)
            while i < len(order) and len(window) < self.batch_size:
                cand = self.graphs[order[i]]
                sizes = tuple(getattr(cand, k) for k in _FIT_KEYS)
                # incremental capacity check in ALIGNED positions (the first
                # four keys are node levels subject to tile alignment); an
                # O(B²) re-sum of the window per candidate dominated batch
                # prep before
                if window:
                    newpos = [bump(t, s, lvl_tn[j] if j < 4 else 0)
                              for j, (t, s) in enumerate(zip(totals, sizes))]
                    if any(p > c for p, c in zip(newpos, caps)):
                        break
                if not window and not fits([cand], self.spec):
                    if self.on_oversize == "error":
                        raise ValueError(
                            f"molecule exceeds the PadSpec in an eval loader "
                            f"(would silently shrink the eval set): "
                            f"{cand.smiles}; enlarge the spec or clean the "
                            f"dataset")
                    # train loader: skip it loudly
                    print(f"[batcher] molecule too large for spec, skipped: "
                          f"{cand.smiles}")
                    i += 1
                    continue
                window.append(cand)
                totals = [bump(t, s, lvl_tn[j] if j < 4 else 0)
                          for j, (t, s) in enumerate(zip(totals, sizes))]
                i += 1
            if not window:
                continue
            if self.drop_last and len(window) < self.batch_size \
                    and i >= len(order):
                break
            yield window

    def __iter__(self) -> Iterator[HierGraphBatch]:
        for window in self._windows():
            batch = pad_batch(window, self.spec, n_tasks=self.n_tasks,
                              with_targets=self.with_targets,
                              build_dense=not self.pack,
                              strict_tcsr=self.pack and self.spec.tcsr)
            if self.pack:
                from fragnet_tpu.data.packing import build_layout, pack_batch

                validate = self.layout is None
                if validate:
                    import jax.numpy as jnp

                    from fragnet_tpu.data.packing import (_DP_LEVELS,
                                                          dp_level_ok)

                    # levels whose dense planes unpack_batch can rebuild on
                    # device for EVERY batch of this dataset (tile-local +
                    # collision-free; packing.dp_level_ok)
                    dp_levels = ()
                    if self.spec.align and self.spec.tcsr:
                        dp_levels = tuple(
                            l for l in _DP_LEVELS
                            if dp_level_ok(self.graphs, l,
                                           self.spec.tn_of(l[3:])))
                    self.layout = build_layout(
                        batch, self.compute_dtype or jnp.float32,
                        compact=self.pack_compact,
                        aligned=self.spec.align,
                        dp_levels=dp_levels)
                batch = pack_batch(batch, self.layout, validate=validate)
            if self.to_device:
                batch = jax.tree.map(
                    lambda x: jax.device_put(x) if x is not None else None, batch
                )
            yield batch

    def _iter_packed_indexed(self, n_epochs: int, worker_id: int,
                             n_workers: int):
        """(global_index, packed bytes) for every batch assigned to this
        worker over ``n_epochs`` epochs. Every worker walks the IDENTICAL
        deterministic window sequence (cheap greedy sums) and pays
        pad+pack only for its own stride — the multi-process pack path."""
        assert self.pack and self.layout is not None
        from fragnet_tpu.data.packing import pack_batch

        idx = 0
        for _ in range(n_epochs):
            for window in self._windows():
                if idx % n_workers == worker_id:
                    b = pad_batch(window, self.spec, n_tasks=self.n_tasks,
                                  with_targets=self.with_targets,
                                  build_dense=False,
                                  strict_tcsr=self.spec.tcsr)
                    yield (idx, pack_batch(b, self.layout).tobytes())
                idx += 1

    def prefetch(self, depth: int = 2) -> Iterator[HierGraphBatch]:
        """Iterate with batches produced by a background thread into a
        bounded queue — genuinely overlaps host padding/packing (and the
        device_put enqueue) with device compute, the role of torch
        DataLoader workers + pinned memory in the reference
        (finetune_gat2.py:240)."""
        import queue as _queue
        import threading

        q: _queue.Queue = _queue.Queue(maxsize=depth)
        done = object()

        def worker():
            try:
                for b in self:
                    q.put(b)
                q.put(done)
            except BaseException as exc:  # surface worker errors to consumer
                q.put(exc)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def stream(self, n_epochs: int, depth: int = 3,
               process: bool = False,
               workers: int = 1) -> Iterator[HierGraphBatch]:
        """``n_epochs`` epochs as ONE continuous background-producer stream —
        no pipeline drain at epoch boundaries (each epoch reshuffles when
        ``shuffle``). The pretraining shape: epochs are long, batches flow
        back-to-back.

        ``process=True`` (requires ``pack``) pads+packs in worker
        PROCESSES: on the tunneled backend the client needs the GIL to pump
        async dispatch, so GIL-heavy numpy packing in a thread serializes
        with device compute — separate processes restore full overlap. The
        workers never touch JAX; the parent does the device_put.

        ``workers`` > 1 shards batches round-robin over that many pack
        processes (each walks the same deterministic shuffle and packs every
        k-th batch); the parent re-orders by global batch index. Host
        padding+packing is the pipeline ceiling once the device step is
        fast — size ``workers`` to host cores."""
        if not process:
            import queue as _queue
            import threading

            q: _queue.Queue = _queue.Queue(maxsize=depth)
            done = object()

            def worker():
                try:
                    for _ in range(n_epochs):
                        for b in self:
                            q.put(b)
                    q.put(done)
                except BaseException as exc:
                    q.put(exc)

            threading.Thread(target=worker, daemon=True).start()
            while True:
                item = q.get()
                if item is done:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
            return

        if not self.pack:
            raise ValueError("process streaming requires pack=True "
                             "(HierGraphBatch pickling would dominate)")
        if self.layout is None:
            next(iter(self))  # build the layout in the parent first
        import multiprocessing as mp

        # spawn, not fork: the parent has live JAX threads (and, on this
        # pod, an active device tunnel) — fork() under them deadlocks or
        # degrades; the spawned workers re-import numpy-only code paths and
        # receive the loader by pickle
        ctx = mp.get_context("spawn")
        workers = max(1, int(workers))
        q = ctx.Queue(maxsize=max(depth, 2 * workers))
        host = BatchLoader(
            self.graphs, self.batch_size, spec=self.spec, shuffle=self.shuffle,
            seed=self.seed, n_tasks=self.n_tasks,
            with_targets=self.with_targets, to_device=False, pack=True,
            pack_compact=self.pack_compact,
            compute_dtype=self.compute_dtype, drop_last=self.drop_last,
        )
        host.layout = self.layout
        host._epoch = self._epoch

        procs = [
            ctx.Process(target=_pack_worker,
                        args=(host, q, n_epochs, w, workers), daemon=True)
            for w in range(workers)
        ]
        for p in procs:
            p.start()
        try:
            import queue as _queue

            pending: dict = {}
            next_idx = 0
            done_workers = 0
            while done_workers < workers:
                while next_idx in pending:
                    buf = pending.pop(next_idx)
                    next_idx += 1
                    yield jax.device_put(buf) if self.to_device else buf
                # bounded wait: a dead/stuck worker must surface as an error,
                # not an indefinite q.get() hang in the training loop
                try:
                    item = q.get(timeout=300)
                except _queue.Empty:
                    alive = sum(p.is_alive() for p in procs)
                    raise RuntimeError(
                        f"pack workers produced nothing for 300s "
                        f"(alive={alive}/{workers})")
                if item is None:
                    done_workers += 1
                    continue
                if isinstance(item, str):  # worker traceback
                    raise RuntimeError(f"pack worker failed:\n{item}")
                idx, raw = item
                pending[idx] = np.frombuffer(raw, np.uint8)
            while next_idx in pending:
                buf = pending.pop(next_idx)
                next_idx += 1
                yield jax.device_put(buf) if self.to_device else buf
        finally:
            for p in procs:
                p.join(timeout=5)
                if p.is_alive():
                    p.terminate()


def _pack_worker(loader: "BatchLoader", q, n_epochs: int,
                 worker_id: int = 0, n_workers: int = 1) -> None:
    """Spawned packing worker — numpy only, never touches JAX. Walks the
    same deterministic shuffle as every other worker, pads+packs every
    ``n_workers``-th batch, and tags each with its global index so the
    parent can restore order."""
    try:
        for item in loader._iter_packed_indexed(n_epochs, worker_id,
                                                n_workers):
            q.put(item)
        q.put(None)
    except BaseException:
        import traceback

        q.put(traceback.format_exc())


class PackedCacheLoader:
    """Host-RAM cache of PACKED batches: pad+pack each batch ONCE (in
    parallel pack workers), then every later epoch replays the ~1 MB uint8
    buffers in a reshuffled order — steady-state epochs skip the host
    padding/packing entirely, leaving only the (compressed, single-buffer)
    transfer. This is the streamed-pretrain steady state for datasets that
    exceed the HBM cache but fit host RAM packed (a 1M-molecule set at
    batch 256 is ~4 GB packed vs ~60 GB padded f32).

    Divergence note (same contract as DeviceCacheLoader): batch COMPOSITION
    is fixed after the packing pass; only batch ORDER reshuffles per epoch.

    Replaces the role of torch DataLoader workers + collate re-running every
    epoch (reference finetune_gat2.py:240-242, dataset.py:59)."""

    def __init__(self, loader: BatchLoader, seed: int = 0,
                 workers: int = 1, to_device: bool = True,
                 max_bytes: Optional[int] = None):
        if not loader.pack:
            raise ValueError("PackedCacheLoader requires pack=True")
        if loader.layout is None:
            next(iter(loader))  # build the layout (advances shuffle state)
            loader._epoch = max(0, loader._epoch - 1)
        self.loader = loader
        self.seed = seed
        self._epoch = 0
        self.bufs: List[np.ndarray] = []
        host = BatchLoader(
            loader.graphs, loader.batch_size, spec=loader.spec,
            shuffle=loader.shuffle, seed=loader.seed,
            n_tasks=loader.n_tasks, with_targets=loader.with_targets,
            to_device=False, pack=True, pack_compact=loader.pack_compact,
            compute_dtype=loader.compute_dtype, drop_last=loader.drop_last,
        )
        host.layout = loader.layout
        it = (host.stream(1, depth=2 * max(1, workers), process=True,
                          workers=workers)
              if workers > 1 else iter(host))
        budget = max_bytes if max_bytes is not None else (8 << 30)
        for buf in it:
            self.bufs.append(np.asarray(buf))
            if len(self.bufs) * loader.layout.total_bytes > budget:
                raise MemoryError(
                    f"packed dataset exceeds the host cache budget "
                    f"({budget / 1e9:.1f} GB) — stream instead "
                    f"(BatchLoader.stream)")
        self.to_device = to_device

    @property
    def layout(self):
        return self.loader.layout

    def __len__(self) -> int:
        return len(self.bufs)

    def __iter__(self):
        order = np.random.default_rng(self.seed + self._epoch).permutation(
            len(self.bufs))
        self._epoch += 1
        for i in order:
            b = self.bufs[i]
            yield jax.device_put(b) if self.to_device else b

    def stream(self, n_epochs: int, depth: int = 4):
        """n_epochs as one continuous stream with the device_put enqueue
        overlapped by a prefetch thread (the buffers are plain numpy — the
        thread is pure C-level transfer enqueue, no GIL-heavy packing)."""
        import queue as _queue
        import threading

        q: _queue.Queue = _queue.Queue(maxsize=depth)
        done = object()

        def worker():
            try:
                for _ in range(n_epochs):
                    for b in self:
                        q.put(b)
                q.put(done)
            except BaseException as exc:
                q.put(exc)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


class DevicePackedCacheLoader:
    """HBM-resident PACKED dataset: pack every batch once (parallel
    workers), push the ~1-4 MB uint8 buffers to device ONCE, and replay
    them in a reshuffled order per epoch — zero host work and zero
    transfers in steady state; the jit'd step unpacks in-jit (with the
    Pallas plane builder, ops/dense_gat.py). Packed batches are ~6x smaller
    than padded ones, so this covers pretrain-scale datasets the unpacked
    DeviceCacheLoader cannot hold (e.g. ~500k molecules in a 8 GB budget at
    batch 256). Composition is fixed after packing; order reshuffles."""

    def __init__(self, loader: BatchLoader, seed: int = 0,
                 workers: int = 1, max_bytes: Optional[int] = None):
        host = PackedCacheLoader(loader, seed=seed, workers=workers,
                                 to_device=False,
                                 max_bytes=max_bytes if max_bytes is not None
                                 else (6 << 30))
        self.loader = loader
        self.seed = seed
        self._epoch = 0
        self.bufs = [jax.device_put(b) for b in host.bufs]
        host.bufs = []  # free the host copies

    @property
    def layout(self):
        return self.loader.layout

    def __len__(self) -> int:
        return len(self.bufs)

    def __iter__(self):
        order = np.random.default_rng(self.seed + self._epoch).permutation(
            len(self.bufs))
        self._epoch += 1
        for i in order:
            yield self.bufs[i]

    def stream(self, n_epochs: int, depth: int = 0):
        """n_epochs as one continuous iterator (buffers are already
        device-resident — no prefetch machinery needed)."""
        for _ in range(n_epochs):
            yield from self


class DeviceCacheLoader:
    """HBM-resident dataset: materializes every batch on device ONCE and
    yields them in a shuffled order per epoch. MoleculeNet-scale finetune
    sets (1-5k molecules ≈ tens of MB padded) fit comfortably in 16 GB HBM,
    so after the first epoch the input pipeline costs nothing.

    Divergence note vs the reference DataLoader(shuffle=True): batch
    COMPOSITION is fixed after the first epoch; only batch ORDER reshuffles
    (set reshuffle_every to re-pack on the host every k epochs to recover
    exact reference semantics at the cost of re-transferring)."""

    def __init__(self, loader: BatchLoader, seed: int = 0,
                 reshuffle_every: int = 0):
        self.loader = loader
        self.seed = seed
        self.reshuffle_every = reshuffle_every
        self._epoch = 0
        self.batches: List = [
            jax.tree.map(lambda x: jax.device_put(x) if x is not None else None, b)
            for b in loader
        ]

    @property
    def layout(self):
        return self.loader.layout

    def __len__(self) -> int:
        return len(self.batches)

    def __iter__(self):
        if (self.reshuffle_every and self._epoch
                and self._epoch % self.reshuffle_every == 0):
            self.batches = [
                jax.tree.map(
                    lambda x: jax.device_put(x) if x is not None else None, b)
                for b in self.loader
            ]
        order = np.random.default_rng(self.seed + self._epoch).permutation(
            len(self.batches))
        self._epoch += 1
        for i in order:
            yield self.batches[i]


class BucketedBatchLoader:
    """Multi-bucket static-shape loader (SURVEY §7 step 7's bucketing policy).

    Molecules are sorted by message-edge count and split into ``n_buckets``
    quantile groups; each group gets its own PadSpec from its OWN size
    distribution, so small molecules stop paying the p95-of-everything
    padding tax. XLA compiles one step variant per bucket — a bounded,
    chosen number — and batches from different buckets interleave in a
    shuffled order each epoch.

    Exposes the same iteration surface as BatchLoader (iter / len /
    prefetch); ``specs`` lists the per-bucket PadSpecs for inspection.
    """

    def __init__(
        self,
        graphs: Sequence[MolGraph],
        batch_size: int,
        n_buckets: int = 3,
        shuffle: bool = False,
        seed: int = 0,
        n_tasks: int = 1,
        with_targets: bool = False,
        to_device: bool = True,
        on_oversize: str = "skip",
        spec_kwargs: Optional[dict] = None,
    ):
        graphs = list(graphs)
        if not graphs:
            raise ValueError("empty dataset")
        n_buckets = max(1, min(n_buckets, len(graphs)))
        key = np.array([g.n_edges + g.n_bg_edges for g in graphs])
        order = np.argsort(key, kind="stable")
        bounds = np.linspace(0, len(graphs), n_buckets + 1).astype(int)
        self.loaders: List[BatchLoader] = []
        kw = spec_kwargs or {}
        for b in range(n_buckets):
            idx = order[bounds[b]:bounds[b + 1]]
            if len(idx) == 0:
                continue
            group = [graphs[i] for i in idx]
            spec = spec_for(group, batch_size, **kw)
            self.loaders.append(BatchLoader(
                group, batch_size, spec=spec, shuffle=shuffle,
                seed=seed + b, n_tasks=n_tasks, with_targets=with_targets,
                to_device=to_device, on_oversize=on_oversize,
            ))
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0

    @property
    def specs(self) -> List[PadSpec]:
        return [l.spec for l in self.loaders]

    def __len__(self) -> int:
        return sum(len(l) for l in self.loaders)

    def __iter__(self) -> Iterator[HierGraphBatch]:
        # materialize per-bucket iterators and interleave in shuffled order
        streams = [iter(l) for l in self.loaders]
        schedule = np.concatenate(
            [np.full(len(l), i) for i, l in enumerate(self.loaders)])
        if self.shuffle:
            rng = np.random.default_rng(self.seed + 7919 * self._epoch)
            rng.shuffle(schedule)
            self._epoch += 1
        for s in schedule:
            b = next(streams[s], None)
            if b is not None:
                yield b
        # drain any stragglers (len() is an upper-bound estimate per bucket)
        for st in streams:
            for b in st:
                yield b

    def prefetch(self, depth: int = 2) -> Iterator[HierGraphBatch]:
        import queue as _queue
        import threading

        q: _queue.Queue = _queue.Queue(maxsize=depth)
        done = object()

        def worker():
            try:
                for b in self:
                    q.put(b)
                q.put(done)
            except BaseException as e:  # surface loader errors to the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is done:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
