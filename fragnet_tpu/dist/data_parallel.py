"""Data-parallel training over a jax.sharding.Mesh.

Each device holds one padded micro-batch (identical PadSpec ⇒ identical
shapes); batches are stacked on a leading 'data' axis and shard_map splits
them across the mesh. Parameters/optimizer state are replicated; gradients
are psum-averaged over ICI — the collective the reference delegates to NCCL
DDP (fragnet/train/finetune/finetune_gat2_pl.py:230-260, utils_pl.py:88).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fragnet_tpu.graphs.hiergraph import PadSpec, pad_batch
from fragnet_tpu.train.loop import LOSSES, TrainState


def make_mesh(n_devices: int = 0, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis,))


def stack_for_dp(graphs: Sequence, n_devices: int, spec: PadSpec,
                 n_tasks: int = 1, with_targets: bool = False):
    """Split graphs round-robin into n_devices micro-batches, pad each to the
    same spec, and stack along a leading device axis."""
    shards: List[List] = [[] for _ in range(n_devices)]
    for i, g in enumerate(graphs):
        shards[i % n_devices].append(g)
    batches = [
        pad_batch(s, spec, n_tasks=n_tasks, with_targets=with_targets)
        for s in shards
    ]
    return jax.tree.map(
        lambda *xs: np.stack(xs) if xs[0] is not None else None, *batches
    )


def make_dp_train_step(model, tx: optax.GradientTransformation, mesh: Mesh,
                       loss_name: str = "mse", axis: str = "data") -> Callable:
    """Compiled DP step: per-device forward/backward on the local micro-batch,
    gradient pmean over the mesh, replicated update."""
    loss_fn = LOSSES[loss_name]

    def per_device(state: TrainState, batch, rng):
        # batch arrives with the leading device axis of size 1 — drop it
        local = jax.tree.map(
            lambda x: x[0] if x is not None else None, batch
        )
        my_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss(params):
            out = model.apply(params, local, deterministic=False,
                              rngs={"dropout": my_rng})
            return loss_fn(out, local.y, local.graph_mask)

        l, grads = jax.value_and_grad(loss)(state.params)
        grads = jax.lax.pmean(grads, axis)
        l = jax.lax.pmean(l, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), l

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, stacked_batch, rng):
        return sharded(state, stacked_batch, rng)

    return step


def make_dp_eval_step(model, mesh: Mesh, loss_name: str = "mse",
                      axis: str = "data") -> Callable:
    loss_fn = LOSSES[loss_name]

    def per_device(params, batch):
        local = jax.tree.map(lambda x: x[0] if x is not None else None, batch)
        out = model.apply(params, local, deterministic=True)
        l = jax.lax.pmean(loss_fn(out, local.y, local.graph_mask), axis)
        return l, out[None]

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None) -> int:
    """Multi-host bring-up: ``jax.distributed.initialize`` — the DCN analog
    of the reference's ``fabric.launch()`` (finetune_gat2_pl.py:245). With no
    arguments, autodetects the TPU-pod environment (or the JAX_COORDINATOR_*
    env vars); no-ops when already initialized or single-process. Returns
    the process index."""
    import os

    # NOTE: must not touch any backend-initializing API (jax.devices,
    # jax.process_count, ...) before jax.distributed.initialize — doing so
    # finalizes a single-process backend and turns the initialize into a
    # silent no-op (round-2 latent bug, caught by tests/test_multiprocess.py)
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        np_ = num_processes if num_processes is not None else \
            os.environ.get("JAX_NUM_PROCESSES", 1)
        pid = process_id if process_id is not None else \
            os.environ.get("JAX_PROCESS_ID", 0)
        try:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(np_),
                process_id=int(pid),
            )
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
    elif os.environ.get("TPU_WORKER_HOSTNAMES"):
        try:
            jax.distributed.initialize()  # TPU pod autodetect
        except (RuntimeError, ValueError):
            # incomplete pod env (e.g. a tunneled single chip that still
            # exports TPU_WORKER_HOSTNAMES) → single-process no-op
            pass
    return jax.process_index()


class DPBatchLoader:
    """Loader for the data-parallel mode: windows of
    ``per_device_batch × n_devices`` graphs, padded per device to one shared
    PadSpec and stacked on a leading device axis (the shard_map input
    layout of make_dp_train_step). In a multi-host launch each process
    constructs this over ITS OWN slice of the dataset and n_devices =
    local_device_count."""

    def __init__(self, graphs: Sequence, per_device_batch: int,
                 n_devices: int, spec: PadSpec, shuffle: bool = False,
                 seed: int = 0, n_tasks: int = 1,
                 with_targets: bool = False):
        self.graphs = list(graphs)
        self.bs = per_device_batch
        self.n_devices = n_devices
        self.spec = spec
        self.shuffle = shuffle
        self.seed = seed
        self.n_tasks = n_tasks
        self.with_targets = with_targets
        self._epoch = 0

    def __len__(self) -> int:
        window = self.bs * self.n_devices
        return (len(self.graphs) + window - 1) // window

    def __iter__(self):
        order = np.arange(len(self.graphs))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
            self._epoch += 1
        window = self.bs * self.n_devices
        for k in range(0, len(order), window):
            idx = order[k:k + window]
            yield stack_for_dp(
                [self.graphs[i] for i in idx], self.n_devices, self.spec,
                n_tasks=self.n_tasks, with_targets=self.with_targets)
