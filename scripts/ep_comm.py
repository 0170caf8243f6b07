"""Measure the EP train step's collective-communication volume from the
compiled HLO on a virtual 8-device CPU mesh (real N>=2-chip scaling is not
measurable in this environment — SURVEY §5.7 — but comm BYTES are, and they
are the scaling ceiling on a real pod slice).

Counts all-reduce / all-gather / reduce-scatter / collective-permute ops in
the optimized HLO and sums their output (for all-gather: per-device output;
for all-reduce: operand) bytes — a device-side proxy for ICI traffic per
step. Run before/after a comm change and record the delta in BASELINE.md.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/ep_comm.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

_DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
             "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8, "u16": 2,
             "s16": 2}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(sig: str) -> int:
    """Sum byte sizes of every typed shape in an HLO result signature."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(sig):
        if dt not in _DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DT_BYTES[dt]
    return total


def comm_bytes(hlo_text: str) -> dict:
    """Per-op-kind byte totals for collective ops in optimized HLO."""
    out = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"^(?:ROOT )?%?[\w.-]+ = (.*?) (all-reduce|all-gather|"
                     r"reduce-scatter|collective-permute|all-to-all)", s)
        if not m:
            continue
        kind = m.group(2)
        b = _shape_bytes(m.group(1))
        d = out.setdefault(kind, {"count": 0, "bytes": 0})
        d["count"] += 1
        d["bytes"] += b
    return out


# --------------------------------------------------------------------------
# latency model (VERDICT r4 weak #8): collective cost ≈ count·α + bytes/β.
# Counting bytes alone hides the per-op latency term, which dominates when a
# combine trades one big all-reduce for many small all-gathers and the mesh
# axis crosses a DCN (multi-host) boundary. Constants are order-of-magnitude
# public figures, recorded here so the estimate is auditable:
#   ICI (v5e, single slice): α ≈ 1 µs/op, β ≈ 180 GB/s effective per chip
#   DCN (multi-host boundary): α ≈ 30 µs/op, β ≈ 25 GB/s per host
# --------------------------------------------------------------------------

_LINKS = {"ici": (1e-6, 180e9), "dcn": (30e-6, 25e9)}


def latency_table(stats: dict) -> dict:
    """Per-kind and total alpha-beta time estimates for both link types."""
    out = {}
    for kind, d in stats.items():
        row = {"count": d["count"], "bytes": d["bytes"]}
        for link, (alpha, beta) in _LINKS.items():
            row[f"t_{link}_us"] = round(
                (d["count"] * alpha + d["bytes"] / beta) * 1e6, 1)
        out[kind] = row
    for link, (alpha, beta) in _LINKS.items():
        out.setdefault("TOTAL", {})[f"t_{link}_us"] = round(sum(
            r[f"t_{link}_us"] for k, r in out.items() if k != "TOTAL"), 1)
    out["TOTAL"]["count"] = sum(
        d["count"] for d in stats.values())
    out["TOTAL"]["bytes"] = sum(d["bytes"] for d in stats.values())
    return out


def main() -> None:
    n_dev = len(jax.devices())
    from fragnet_tpu.data.datasets import build_graphs
    from fragnet_tpu.data.synthetic import synthetic_dataset
    from fragnet_tpu.dist.data_parallel import make_mesh
    from fragnet_tpu.dist.edge_partition import (make_ep_train_step,
                                                 with_ep_tile_meta)
    from fragnet_tpu.graphs.hiergraph import pad_batch, spec_for
    from fragnet_tpu.model.finetune import FragNetFineTune
    from fragnet_tpu.train.loop import TrainState
    from fragnet_tpu.train.optim import make_optimizer

    df = synthetic_dataset(n=2 * n_dev + 4, task="regression", seed=0)
    graphs = build_graphs(list(df["smiles"]), [[v] for v in df["y"]])
    graphs = graphs[: 2 * n_dev]
    mesh = make_mesh(n_dev, axis="ep")
    spec = spec_for(graphs, batch_size=len(graphs), multiple=8 * n_dev,
                    align=False)
    batch_np, fused = with_ep_tile_meta(pad_batch(graphs, spec), n_dev,
                                        tn=8, te=8)
    batch = jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None, batch_np)
    model = FragNetFineTune(num_layer=2, num_heads=4, emb_dim=64,
                            h1=32, h2=32, h3=32, h4=32, ep_axis="ep")
    init_model = FragNetFineTune(num_layer=2, num_heads=4, emb_dim=64,
                                 h1=32, h2=32, h3=32, h4=32)
    params = init_model.init(jax.random.PRNGKey(0), batch,
                             deterministic=True)
    tx = make_optimizer("adam", lr=1e-4)
    state = TrainState.create(params, tx)
    step = make_ep_train_step(model, tx, mesh, batch, "mse", axis="ep")

    lowered = jax.jit(step).lower(state, batch, jax.random.PRNGKey(1))
    hlo = lowered.compile().as_text()
    stats = comm_bytes(hlo)
    total = sum(d["bytes"] for d in stats.values())
    n_nodes = {"A": batch.x_atoms.shape[0], "E": batch.edge_src.shape[0],
               "C": batch.nf_fbonds.shape[0], "F": batch.x_frags.shape[0]}
    lat = latency_table(stats)
    print(f"devices={n_dev} fused_kernel={fused} sizes={n_nodes}")
    print(f"  {'kind':20s} {'count':>5s} {'bytes':>12s} "
          f"{'t_ici_us':>9s} {'t_dcn_us':>9s}")
    for k, d in sorted(lat.items()):
        print(f"  {k:20s} {d.get('count', 0):5d} {d.get('bytes', 0):>12,} "
              f"{d.get('t_ici_us', 0):>9} {d.get('t_dcn_us', 0):>9}")
    print(f"TOTAL collective bytes per train step (per device): {total:,}")
    import json

    print(json.dumps({"devices": n_dev, "total_bytes": total,
                      "by_kind": stats, "latency_model": lat}))


if __name__ == "__main__":
    main()
