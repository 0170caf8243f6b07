"""Standalone kernel roofline + batch sweep (VERDICT r2 weak #4).

Times each level's fused Pallas forward pass in isolation on the real TPU and
reports achieved MXU TFLOP/s / HBM GB/s vs v5e peaks plus the
useful:executed flop ratio of the one-hot-matmul gather strategy, and sweeps
the batch size. Writes ROOFLINE.json at the repo root (committed — the
measured basis of BASELINE.md's speed-of-light discussion).

Usage:  python scripts/roofline.py  [BATCHES=256,512,1024] [N_MOLS=1024]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _roofline
    from fragnet_tpu.data.batcher import BatchLoader
    from fragnet_tpu.data.datasets import build_graphs
    from fragnet_tpu.data.synthetic import synthetic_dataset
    from fragnet_tpu.graphs.hiergraph import spec_for
    from fragnet_tpu.model.finetune import FragNetFineTune
    from fragnet_tpu.train.loop import TrainState, make_train_step
    from fragnet_tpu.train.optim import make_optimizer

    assert jax.default_backend() == "tpu", "roofline needs the real TPU"
    n_mols = int(os.environ.get("N_MOLS", 1024))
    batches = [int(b) for b in
               os.environ.get("BATCHES", "256,512,1024").split(",")]
    df = synthetic_dataset(n=n_mols, task="regression", seed=7)
    graphs = build_graphs(list(df["smiles"]), [[v] for v in df["y"]])
    print(f"featurized {len(graphs)} molecules", flush=True)

    out = {"device": str(jax.devices()[0]), "n_mols": n_mols,
           "per_batch": {}}
    for bs in batches:
        spec = spec_for(graphs, batch_size=bs, tcsr=True)
        loader = BatchLoader(graphs, bs, spec=spec, shuffle=True, seed=0,
                             drop_last=True)
        dbs = [jax.tree.map(jax.device_put, b) for b in loader]
        if not dbs:
            continue
        model = FragNetFineTune(num_layer=4, num_heads=4, emb_dim=128,
                                h1=128, h2=1024, h3=1024, h4=512, act="relu",
                                drop_ratio=0.1, dtype=jnp.bfloat16)
        params = jax.jit(lambda r, b: model.init(r, b, deterministic=True))(
            jax.random.PRNGKey(0), dbs[0])
        tx = make_optimizer("adam", lr=1e-4)
        state = TrainState.create(params, tx)
        step = make_train_step(model, tx, "mse")
        rng = jax.random.PRNGKey(1)
        state, loss = step(state, dbs[0], rng)
        _ = float(loss)

        def real_edges(b):
            return float(np.asarray(b.edge_mask).sum()
                         + np.asarray(b.atom_mask).sum()
                         + np.asarray(b.bg_mask).sum()
                         + np.asarray(b.fconn_mask).sum()
                         + np.asarray(b.fc_mask).sum()) * 4

        eb = [real_edges(b) for b in dbs]
        n_steps = 60
        tot = 0.0
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, loss = step(state, dbs[i % len(dbs)], rng)
            tot += eb[i % len(dbs)]
        _ = float(loss)
        eps = tot / (time.perf_counter() - t0)
        rl = _roofline(jax, jnp, model, params, dbs[0], 4)
        out["per_batch"][str(bs)] = {
            "train_edges_per_sec": round(eps, 1),
            "roofline": rl,
        }
        print(f"batch {bs}: {eps/1e6:.2f}M edges/s", flush=True)
        for lvl, r in rl.items():
            print(f"  {lvl}: {r['ms']} ms, {r['exec_tflops']} TF/s "
                  f"({r['pct_mxu_peak']}% MXU), {r['hbm_gbps']} GB/s "
                  f"({r['pct_hbm_peak']}% HBM), useful {r['useful_flop_frac']}",
                  flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
