"""Headline benchmark: message-edges/second through the jit'd training step
(forward+backward+update) of the flagship FragNetFineTune on the default
TPU device.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no throughput numbers (BASELINE.md) — vs_baseline
compares against ``bench_baseline.json`` in the repo root if present (written
by a previous round), else 1.0.

Metric definition: edges/s = (real message edges per optimizer step, summed
over all four graph levels incl. atom self-loops, × num_layers) / step time.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fragnet_tpu.data.batcher import BatchLoader
    from fragnet_tpu.data.datasets import build_graphs
    from fragnet_tpu.data.synthetic import synthetic_dataset
    from fragnet_tpu.graphs.hiergraph import spec_for
    from fragnet_tpu.model.finetune import FragNetFineTune
    from fragnet_tpu.train.loop import TrainState, make_train_step
    from fragnet_tpu.train.optim import make_optimizer

    n_mols = int(os.environ.get("BENCH_N_MOLS", 192))
    batch_size = int(os.environ.get("BENCH_BATCH", 64))
    num_layers = 4

    df = synthetic_dataset(n=n_mols, task="regression", seed=7)
    graphs = build_graphs(list(df["smiles"]), [[v] for v in df["y"]])
    spec = spec_for(graphs, batch_size=batch_size)

    model = FragNetFineTune(num_layer=num_layers, num_heads=4, emb_dim=128,
                            h1=128, h2=1024, h3=1024, h4=512, act="relu",
                            drop_ratio=0.1)
    loader = BatchLoader(graphs, batch_size, spec=spec, shuffle=True, seed=0)
    batches = list(loader)

    params = model.init(jax.random.PRNGKey(0), batches[0], deterministic=True)
    tx = make_optimizer("adam", lr=1e-4)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, "mse")
    rng = jax.random.PRNGKey(1)

    # edges per step: all four levels + self-loops, times layers
    def real_edges(b):
        return float(
            np.asarray(b.edge_mask).sum()      # atom-graph edges
            + np.asarray(b.atom_mask).sum()    # self-loops
            + np.asarray(b.bg_mask).sum()      # bond line graph
            + np.asarray(b.fconn_mask).sum()   # fragment graph
            + np.asarray(b.fc_mask).sum()      # fconn line graph
        ) * num_layers

    edges_per_batch = [real_edges(b) for b in batches]

    # warmup / compile
    state, _ = step(state, batches[0], rng)
    jax.block_until_ready(state.params)

    n_steps = int(os.environ.get("BENCH_STEPS", 30))
    total_edges = 0.0
    t0 = time.perf_counter()
    for i in range(n_steps):
        b = batches[i % len(batches)]
        rng, sub = jax.random.split(rng)
        state, loss = step(state, b, sub)
        total_edges += edges_per_batch[i % len(batches)]
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    value = total_edges / dt
    baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    if os.path.exists(base_path):
        try:
            with open(base_path) as f:
                baseline = float(json.load(f).get("value"))
        except Exception:
            baseline = None
    print(json.dumps({
        "metric": "train_message_edges_per_sec",
        "value": round(value, 1),
        "unit": "edges/s",
        "vs_baseline": round(value / baseline, 4) if baseline else 1.0,
    }))


if __name__ == "__main__":
    main()
