"""Headline benchmark: message-edges/second through the jit'd training step
(forward+backward+update, donated state) of the flagship FragNetFineTune on
the default TPU device.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric = device-resident steady state (batches pre-staged in HBM —
the kernel-throughput number the Pallas work targets). The end-to-end
pipelined number (host padding + transfer overlapped via prefetch) is
reported in the same line under "pipeline_edges_per_sec".

The reference publishes no throughput numbers (BASELINE.md); vs_baseline
compares against bench_baseline.json (written by a previous round) when
present, else 1.0.

Metric definition: edges/s = (real message edges per optimizer step, summed
over all four graph levels incl. atom self-loops, × num_layers) / step time.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    from fragnet_tpu.data.batcher import BatchLoader
    from fragnet_tpu.data.datasets import build_graphs
    from fragnet_tpu.data.synthetic import synthetic_dataset
    from fragnet_tpu.graphs.hiergraph import spec_for
    from fragnet_tpu.model.finetune import FragNetFineTune
    from fragnet_tpu.train.loop import TrainState, make_train_step
    from fragnet_tpu.train.optim import make_optimizer

    import jax.numpy as jnp

    n_mols = int(os.environ.get("BENCH_N_MOLS", 512))
    batch_size = int(os.environ.get("BENCH_BATCH", 256))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" \
        else jnp.float32
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1" \
        and jax.default_backend() == "tpu"
    num_layers = 4

    df = synthetic_dataset(n=n_mols, task="regression", seed=7)
    graphs = build_graphs(list(df["smiles"]), [[v] for v in df["y"]])
    spec = spec_for(graphs, batch_size=batch_size, tcsr=use_pallas)

    model = FragNetFineTune(num_layer=num_layers, num_heads=4, emb_dim=128,
                            h1=128, h2=1024, h3=1024, h4=512, act="relu",
                            drop_ratio=0.1, dtype=dtype)
    loader = BatchLoader(graphs, batch_size, spec=spec, shuffle=True, seed=0)
    device_batches = [jax.tree.map(jax.device_put, b) for b in loader]

    params = model.init(jax.random.PRNGKey(0), device_batches[0],
                        deterministic=True)
    tx = make_optimizer("adam", lr=1e-4)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, "mse")
    rng = jax.random.PRNGKey(1)

    def real_edges(b):
        return float(
            np.asarray(b.edge_mask).sum()      # atom-graph edges
            + np.asarray(b.atom_mask).sum()    # self-loops
            + np.asarray(b.bg_mask).sum()      # bond line graph
            + np.asarray(b.fconn_mask).sum()   # fragment graph
            + np.asarray(b.fc_mask).sum()      # fconn line graph
        ) * num_layers

    edges_per_batch = [real_edges(b) for b in device_batches]

    # compile + force the tunnel into synchronous dispatch (a d2h read).
    # NOTE: on the tunneled TPU backend block_until_ready can return before
    # the queued work actually finishes; fetching a scalar result is the only
    # honest completion barrier, so every timed region below ends with a
    # float() of the last step's loss.
    state, loss = step(state, device_batches[0], rng)
    _ = float(loss)

    # --- device-resident steady state (primary) ------------------------
    # NOTE: no host-side rng work inside the loop — the step folds its own
    # rng from the step counter (a host split per step is a device round
    # trip, worse than the step itself on a tunneled TPU).
    n_steps = int(os.environ.get("BENCH_STEPS", 200))
    total_edges = 0.0
    t0 = time.perf_counter()
    for i in range(n_steps):
        b = device_batches[i % len(device_batches)]
        state, loss = step(state, b, rng)
        total_edges += edges_per_batch[i % len(device_batches)]
    _ = float(loss)
    device_eps = total_edges / (time.perf_counter() - t0)

    # --- end-to-end pipeline: packed single-buffer transport + threaded
    # prefetch (data/packing.py) — ~6x less tunnel traffic than raw leaves.
    # Every epoch covers all graphs once, so edges/epoch is composition-
    # independent.
    epoch_edges = float(sum(edges_per_batch))
    ploader = BatchLoader(graphs, batch_size, spec=spec, shuffle=True, seed=0,
                          pack=True, compute_dtype=dtype)
    pb0 = next(iter(ploader))  # builds the layout; also warms the worker path
    pstep = make_train_step(model, tx, "mse", layout=ploader.layout)
    state, loss = pstep(state, pb0, rng)
    _ = float(loss)
    n_epochs = max(1, n_steps // max(1, len(device_batches)) // 2)
    t0 = time.perf_counter()
    for b in ploader.stream(n_epochs, depth=4):
        state, loss = pstep(state, b, rng)
    _ = float(loss)
    pipeline_eps = epoch_edges * n_epochs / (time.perf_counter() - t0)

    # --- HBM-resident dataset (the finetune-scale steady state): batches
    # cached on device after epoch 1, shuffled order per epoch.
    from fragnet_tpu.data.batcher import DeviceCacheLoader

    cache = DeviceCacheLoader(loader, seed=1)
    for b in cache:  # warm (already resident; runs one epoch)
        state, loss = step(state, b, rng)
    _ = float(loss)
    t0 = time.perf_counter()
    for _epoch in range(n_epochs):
        for b in cache:
            state, loss = step(state, b, rng)
    _ = float(loss)
    cached_eps = epoch_edges * n_epochs / (time.perf_counter() - t0)

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
        "value": round(device_eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(device_eps / baseline, 4) if baseline else 1.0,
        "pipeline_edges_per_sec": round(pipeline_eps, 1),
        "cached_edges_per_sec": round(cached_eps, 1),
        "batch_size": batch_size,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
