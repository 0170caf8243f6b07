"""Edge-partitioned GAT pass over a device mesh.

The scale-out mode the reference lacks (its only distribution is gradient
all-reduce DDP, finetune_gat2_pl.py:230): when a single graph batch has more
message edges than one chip can hold, shard the EDGE arrays across mesh
devices and keep node state replicated. Each shard computes partial
segment-softmax statistics for its edge range; cross-shard combination is
three mesh collectives (max, sum, sum) riding ICI:

    m      = pmax(local segment max of logits)
    denom  = psum(local Σ exp(logit − m))
    out    = psum(local Σ exp(logit − m)·h_src) / denom

This is the segment-sum analog of ring attention: partial reductions for
nodes whose edges span shards are combined by the collective instead of a
host gather. Atom→fragment pooling composes the same way (psum of partial
fragment sums).

Edges are padded to a multiple of the mesh size and masked, so every shard
runs the same static shapes. Works under ``shard_map`` on any mesh axis; the
tests run it on the 8-device virtual CPU mesh (SURVEY.md §4).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e9


def shard_edges(arrs, n_shards: int, pad_value=0):
    """Pad each (E, ...) array to a multiple of ``n_shards`` and reshape to
    (n_shards, E/n_shards, ...). The LAST array must be the edge mask — its
    padding is forced to 0."""
    out = []
    E = arrs[0].shape[0]
    Ep = ((E + n_shards - 1) // n_shards) * n_shards
    for i, a in enumerate(arrs):
        pad = [(0, Ep - E)] + [(0, 0)] * (a.ndim - 1)
        fill = pad_value if i < len(arrs) - 1 else 0
        ap = np.pad(np.asarray(a), pad, constant_values=fill)
        out.append(ap.reshape((n_shards, Ep // n_shards) + a.shape[1:]))
    return out


def _local_pass(node_feats_h, edge_attr_h, src, dst, edge_mask, attn_vec,
                num_nodes: int, negative_slope: float, axis: str):
    """Runs on ONE shard's edge range; node_feats replicated."""
    h_src = node_feats_h[src]
    h_dst = node_feats_h[dst]
    msg = jnp.concatenate([h_dst, edge_attr_h, h_src], axis=-1)
    logits = jnp.sum(
        msg.astype(jnp.float32) * attn_vec[None].astype(jnp.float32), axis=-1
    )
    logits = jax.nn.leaky_relu(logits, negative_slope)
    m = edge_mask.reshape(edge_mask.shape + (1,) * (logits.ndim - 1))
    logits = jnp.where(m > 0, logits, _NEG)

    # local per-node max, then global via pmax over the mesh axis
    local_max = jax.ops.segment_max(logits, dst, num_segments=num_nodes)
    gmax = jax.lax.pmax(local_max, axis)
    gmax = jnp.where(gmax <= _NEG / 2, 0.0, gmax)

    ex = jnp.exp(logits - gmax[dst]) * m
    local_den = jax.ops.segment_sum(ex, dst, num_segments=num_nodes)
    den = jax.lax.psum(local_den, axis)
    den = jnp.where(den == 0.0, 1.0, den)

    weighted = ex.astype(h_src.dtype)[..., None] * h_src
    local_num = jax.ops.segment_sum(weighted, dst, num_segments=num_nodes)
    num = jax.lax.psum(local_num, axis)
    return num / den[..., None].astype(num.dtype)


def edge_partitioned_gat_pass(
    mesh: Mesh,
    node_feats_h: jnp.ndarray,    # (N, H, D) — replicated
    edge_attr_h: jnp.ndarray,     # (S, Es, H, Da) — edge-sharded
    src: jnp.ndarray,             # (S, Es)
    dst: jnp.ndarray,             # (S, Es)
    edge_mask: jnp.ndarray,       # (S, Es)
    attn_vec: jnp.ndarray,        # (H, 2D+Da) — replicated
    axis: str = "data",
    negative_slope: float = 0.2,
) -> jnp.ndarray:
    """Same math as ops.segment.gat_attention_pass over the union of all
    edge shards; returns the replicated (N, H, D) aggregate."""
    N = node_feats_h.shape[0]

    fn = shard_map(
        partial(_local_pass, num_nodes=N, negative_slope=negative_slope,
                axis=axis),
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )

    def squeeze(x):  # (1, Es, ...) per-shard view → (Es, ...)
        return x.reshape(x.shape[1:])

    wrapped = lambda nf, ea, s, d, em, a: fn(nf, ea, s, d, em, a)
    return wrapped(node_feats_h,
                   edge_attr_h.reshape((-1,) + edge_attr_h.shape[2:]),
                   src.reshape(-1), dst.reshape(-1), edge_mask.reshape(-1),
                   attn_vec)


# ---------------------------------------------------------------------------
# model-level edge-partitioned training (SURVEY §5.7 north star)
# ---------------------------------------------------------------------------

# per-level EDGE arrays sharded across the mesh; node-space state replicated
EP_SHARDED_FIELDS = (
    "edge_src", "edge_dst",
    "bg_src", "bg_dst", "bg_mask", "ea_bonds",
    "frag_src", "frag_dst",
    "fc_src", "fc_dst", "fc_mask", "ea_fbonds",
)


def with_ep_tile_meta(batch, n_shards: int, tn: int = 128, te: int = 256,
                      pins: Optional[dict] = None):
    """Attach per-shard TCSR metadata (ops/tcsr.py:EPTileMeta) for all four
    levels so the EP train step runs the fused Pallas kernel on each shard's
    edge range. Returns ``(batch, True)`` on success or the unchanged batch
    + False when any level violates the layout assumptions (caller keeps the
    XLA EP segment path). Edge counts must be divisible by n_shards·te and
    node counts by tn. ``pins`` optionally fixes the static widths per level
    ({'tm_atom': (Tg, n_chunks, k_src), ...}) so every batch compiles to the
    same kernel."""
    import dataclasses

    from fragnet_tpu.ops.tcsr import build_ep_tile_meta

    def pin_kw(level):
        if pins is None or level not in pins:
            return {}
        tg, c, k = pins[level]
        return {"n_tiles_grid": tg, "n_chunks": c, "k_src": k}

    tms = dict(
        tm_atom=build_ep_tile_meta(
            batch.edge_src, batch.edge_dst, batch.edge_mask,
            batch.x_atoms.shape[0], n_shards, tn, te, **pin_kw("tm_atom")),
        tm_bond=build_ep_tile_meta(
            batch.bg_src, batch.bg_dst, batch.bg_mask,
            batch.nf_bonds.shape[0], n_shards, tn, te, **pin_kw("tm_bond")),
        tm_frag=build_ep_tile_meta(
            batch.frag_src, batch.frag_dst, batch.fconn_mask,
            batch.x_frags.shape[0], n_shards, tn, te, **pin_kw("tm_frag")),
        tm_fc=build_ep_tile_meta(
            batch.fc_src, batch.fc_dst, batch.fc_mask,
            batch.nf_fbonds.shape[0], n_shards, tn, te, **pin_kw("tm_fc")),
    )
    if any(v is None for v in tms.values()):
        return batch, False
    return dataclasses.replace(batch, **tms), True


def pin_ep_widths(loaders, n_shards: int, tn: int = 128, te: int = 256,
                  n_probe_epochs: int = 2) -> dict:
    """Probe full epochs of every loader and return ONE set of per-level
    static tile widths {'tm_atom': (Tg, n_chunks, k_src), ...} with one unit
    of slack on each (shuffling loaders re-window molecules per epoch;
    build_ep_tile_meta clamps each pin to its array bound)."""
    pins: dict = {}
    for loader in loaders:
        for _ in range(n_probe_epochs):
            for b in loader:
                b2, ok = with_ep_tile_meta(EPMetaLoader._host(b), n_shards,
                                           tn, te)
                if not ok:
                    raise ValueError(
                        "EP tile-meta probe failed: batch violates TCSR "
                        "layout (pad edge counts to a multiple of "
                        "n_shards*te and node counts to tn, or set "
                        "dist.tcsr=false)")
                for lvl in EPMetaLoader._LEVELS:
                    tm = getattr(b2, lvl)
                    cur = pins.get(lvl, (1, 1, 1))
                    pins[lvl] = (max(cur[0], tm.n_tiles_grid),
                                 max(cur[1], tm.n_chunks),
                                 max(cur[2], tm.k_src))
    return {lvl: (tg + 1, c + 1, k + 1) for lvl, (tg, c, k) in pins.items()}


class EPMetaLoader:
    """Wraps a batch loader for edge-partitioned fused-kernel training:
    probes the first ``n_probe`` batches to pin the per-level static tile
    widths (one chunk of slack), then attaches pinned EPTileMeta to every
    yielded batch. Raises on construction if the probe fails (caller keeps
    the XLA EP segment path) and at iteration time if a later batch exceeds
    the pinned windows (static shapes are a compile-once contract)."""

    _LEVELS = ("tm_atom", "tm_bond", "tm_frag", "tm_fc")

    def __init__(self, loader, n_shards: int, tn: int = 128, te: int = 256,
                 n_probe_epochs: int = 2, pins: Optional[dict] = None):
        self.loader = loader
        self.n_shards = n_shards
        self.tn, self.te = tn, te
        # pins may be provided (pin_ep_widths over ALL of a run's loaders —
        # train/val/test must share ONE compiled step, so ONE set of statics)
        self.pins = pins if pins is not None else pin_ep_widths(
            [loader], n_shards, tn, te, n_probe_epochs)

    @staticmethod
    def _host(b):
        import dataclasses as _dc

        import numpy as _np

        return _dc.replace(b, **{
            f.name: _np.asarray(getattr(b, f.name))
            for f in _dc.fields(b)
            if f.name.startswith(("edge_", "bg_", "frag_", "fc_", "x_", "nf_"))
            and getattr(b, f.name) is not None
        })

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for b in self.loader:
            b2, ok = with_ep_tile_meta(self._host(b), self.n_shards,
                                       self.tn, self.te, pins=self.pins)
            if not ok:
                raise RuntimeError(
                    "batch exceeds the pinned EP tile windows; re-run with "
                    "dist.tcsr=false or a larger probe")
            yield b2


def ep_batch_specs(batch, axis: str = "ep"):
    """PartitionSpec pytree for a HierGraphBatch in edge-partitioned mode.
    The batch must be padded with every edge dimension divisible by the mesh
    size (PadSpec.round_to handles this). TCSR metadata, if present, must be
    the per-shard EPTileMeta form (with_ep_tile_meta); single-shard TileMeta
    and ELL tables are rejected."""
    import dataclasses

    from fragnet_tpu.graphs.hiergraph import HierGraphBatch
    from fragnet_tpu.ops.tcsr import EPTileMeta

    if batch.atom_nbr_edge is not None:
        raise ValueError("edge-partitioned mode does not support ELL tables")
    specs = {}
    for f in dataclasses.fields(HierGraphBatch):
        v = getattr(batch, f.name)
        if v is None:
            specs[f.name] = None
        elif f.name.startswith("tm_"):
            if not isinstance(v, EPTileMeta):
                raise ValueError(
                    f"edge-partitioned mode needs per-shard EPTileMeta for "
                    f"{f.name} (use with_ep_tile_meta), got {type(v).__name__}")
            specs[f.name] = EPTileMeta(
                t0=P(axis), ew_blk=P(axis), sw_tile=P(axis),
                flat_slot=P(axis), cw=P(axis), tn=v.tn, te=v.te,
                n_chunks=v.n_chunks, k_src=v.k_src,
                n_tiles_grid=v.n_tiles_grid)
        elif f.name in EP_SHARDED_FIELDS:
            specs[f.name] = P(axis)
        else:
            specs[f.name] = P()
    return HierGraphBatch(**specs)


# XLA:TPU compiler options for the EP step: convert the combine's
# all-gathers (and the gradient psums / reduce-scatter transposes) to async
# start/done pairs so the latency-hiding scheduler can fly them under
# independent compute — within a layer the fconn-level pass has no data
# dependence on the bond/atom-level gathers (VERDICT r5 #4). Measured on the
# AOT v5e:2x4 schedule (scripts/ep_overlap_hlo.py → EPOVERLAP.json): these
# flags move ~87% of collective bytes into async pairs bracketing real
# scheduled ops, vs 27% with defaults. No-ops on non-TPU backends (not
# passed there — XLA:CPU rejects unknown TPU flags).
EP_COMPILER_OPTIONS = {
    "xla_tpu_enable_async_collective_fusion": "true",
    "xla_tpu_enable_async_collective_fusion_fuse_all_gather": "true",
    "xla_tpu_enable_async_collective_fusion_fuse_all_reduce": "true",
    "xla_tpu_enable_async_collective_fusion_fuse_reduce_scatter": "true",
    "xla_tpu_enable_async_collective_fusion_with_mosaic_custom_call": "true",
    "xla_tpu_enable_async_collective_fusion_multiple_steps": "true",
    "xla_tpu_enable_async_collective_fusion_fuse_kloop_fusions": "true",
}


def ep_jit_kwargs() -> dict:
    """``compiler_options`` for jitting EP steps on TPU backends."""
    if jax.default_backend() == "tpu":
        return {"compiler_options": dict(EP_COMPILER_OPTIONS)}
    return {}


def make_ep_train_step(model, tx, mesh: Mesh, example_batch,
                       loss_name: str = "mse", axis: str = "ep"):
    """Compiled edge-partitioned train step. ``model`` must be constructed
    with ``ep_axis=axis`` — its layers then run the pmax/psum segment
    combination inside this shard_map. Gradients are produced by
    differentiating THROUGH shard_map (jax inserts the collective
    transposes), so one optimizer update is numerically the single-device
    update on the full edge set."""
    import optax

    from fragnet_tpu.train.loop import LOSSES, TrainState

    loss_fn = LOSSES[loss_name]
    specs = ep_batch_specs(example_batch, axis)

    def local(params, batch, rng):
        out = model.apply(params, batch, deterministic=False,
                          rngs={"dropout": rng})
        return loss_fn(out, batch.y, batch.graph_mask)

    # check_vma=False: the fused EP path calls pallas kernels whose
    # outputs carry no vma annotation; correctness of the collective
    # transposes is covered by the grad-parity tests
    sharded_loss = shard_map(local, mesh=mesh,
                             in_specs=(P(), specs, P()), out_specs=P(),
                             check_vma=False)

    @partial(jax.jit, donate_argnums=0, **ep_jit_kwargs())
    def step(state, batch, base_rng):
        rng = jax.random.fold_in(base_rng, state.step)
        l, grads = jax.value_and_grad(sharded_loss)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), l

    return step


def make_ep_eval_step(model, mesh: Mesh, example_batch,
                      loss_name: str = "mse", axis: str = "ep"):
    from fragnet_tpu.train.loop import LOSSES

    loss_fn = LOSSES[loss_name]
    specs = ep_batch_specs(example_batch, axis)

    def local(params, batch):
        out = model.apply(params, batch, deterministic=True)
        return loss_fn(out, batch.y, batch.graph_mask), out

    return jax.jit(shard_map(local, mesh=mesh, in_specs=(P(), specs),
                             out_specs=(P(), P()), check_vma=False),
                   **ep_jit_kwargs())


def edge_partitioned_segment_sum(
    mesh: Mesh,
    data: jnp.ndarray,        # (S*R, ...) row-sharded
    segment_ids: jnp.ndarray, # (S*R,) row-sharded
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    axis: str = "data",
) -> jnp.ndarray:
    """Cross-shard segment sum (atom→fragment pooling when atoms are
    partitioned): local partial sums + one psum."""

    def local(d, ids, m):
        if m is not None:
            d = d * m.reshape(m.shape + (1,) * (d.ndim - 1))
        part = jax.ops.segment_sum(d, ids, num_segments=num_segments)
        return jax.lax.psum(part, axis)

    in_specs = (P(axis), P(axis), P(axis) if mask is not None else None)
    if mask is None:
        fn = shard_map(lambda d, i: local(d, i, None), mesh=mesh,
                       in_specs=(P(axis), P(axis)), out_specs=P(),
                       check_vma=False)
        return fn(data, segment_ids)
    fn = shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=P(),
                   check_vma=False)
    return fn(data, segment_ids, mask)
