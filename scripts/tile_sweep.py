"""On-device (tn, te) tile-size sweep for the fused Pallas GAT kernel.

The round-3 roofline (BASELINE.md) showed the kernel bound by per-chunk
fixed costs, not MXU or HBM: at tn=te=256 the dominant gather matmul is
~0.4 us of a ~3.1 us chunk. Total one-hot matmul FLOPs are invariant in
te (grid halves when te doubles), so larger chunks amortize the fixed
part directly. This script measures the full train step (the headline
bench loop) across tile configs on the real TPU and prints a JSON table.

Usage: timeout 580 python scripts/tile_sweep.py
Env: SWEEP_N_MOLS (default 256), SWEEP_STEPS (default 40).
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fragnet_tpu.data.batcher import BatchLoader
    from fragnet_tpu.data.datasets import build_graphs
    from fragnet_tpu.data.synthetic import synthetic_dataset
    from fragnet_tpu.graphs.hiergraph import spec_for
    from fragnet_tpu.model.finetune import FragNetFineTune
    from fragnet_tpu.train.loop import TrainState, make_train_step
    from fragnet_tpu.train.optim import make_optimizer

    n_mols = int(os.environ.get("SWEEP_N_MOLS", 256))
    batch_size = min(256, n_mols)
    n_steps = int(os.environ.get("SWEEP_STEPS", 40))
    configs = [(128, 256), (128, 128), (64, 256), (64, 128), (128, 512)]
    if os.environ.get("SWEEP_CONFIGS"):
        configs = [tuple(map(int, c.split("x")))
                   for c in os.environ["SWEEP_CONFIGS"].split(",")]

    cache = f"/tmp/tile_sweep_graphs_{n_mols}.pkl"
    if os.path.exists(cache):
        import pickle
        with open(cache, "rb") as f:
            graphs = pickle.load(f)
    else:
        df = synthetic_dataset(n=n_mols, task="regression", seed=7)
        graphs = build_graphs(list(df["smiles"]), [[v] for v in df["y"]])
        import pickle
        with open(cache, "wb") as f:
            pickle.dump(graphs, f)
    model = FragNetFineTune(num_layer=4, num_heads=4, emb_dim=128,
                            h1=128, h2=1024, h3=1024, h4=512, act="relu",
                            drop_ratio=0.1, dtype=jnp.bfloat16)
    tx = make_optimizer("adam", lr=1e-4)
    rng = jax.random.PRNGKey(1)
    results = {}
    for tn, te in configs:
        tag = f"tn{tn}_te{te}"
        try:
            spec = spec_for(graphs, batch_size=batch_size, tcsr=True,
                            tn=tn, te=te)
            loader = BatchLoader(graphs, batch_size, spec=spec, shuffle=True,
                                 seed=0)
            dbs = [jax.tree.map(jax.device_put, b) for b in loader]
            if dbs[0].tm_atom is None:
                results[tag] = "tcsr-off (locality violated)"
                continue
            params = jax.jit(
                lambda r, b: model.init(r, b, deterministic=True)
            )(jax.random.PRNGKey(0), dbs[0])
            state = TrainState.create(params, tx)
            step = make_train_step(model, tx, "mse")

            def real_edges(b):
                return float(
                    np.asarray(b.edge_mask).sum() + np.asarray(b.atom_mask).sum()
                    + np.asarray(b.bg_mask).sum() + np.asarray(b.fconn_mask).sum()
                    + np.asarray(b.fc_mask).sum()) * 4

            eb = [real_edges(b) for b in dbs]
            t_c0 = time.perf_counter()
            state, loss = step(state, dbs[0], rng)
            _ = float(loss)  # the only honest barrier on the tunneled TPU
            compile_s = time.perf_counter() - t_c0
            tot = 0.0
            t0 = time.perf_counter()
            for i in range(n_steps):
                state, loss = step(state, dbs[i % len(dbs)], rng)
                tot += eb[i % len(dbs)]
            _ = float(loss)
            dt = time.perf_counter() - t0
            tm = dbs[0].tm_bond
            results[tag] = {
                "edges_per_sec": round(tot / dt, 1),
                "ms_per_step": round(dt / n_steps * 1e3, 2),
                "compile_s": round(compile_s, 1),
                "bond_grid": [int(np.asarray(dbs[0].bg_src).shape[0]) // tm.te
                              and spec.n_edges // tm.tn, tm.n_chunks],
                "k_src_bond": tm.k_src,
            }
            print(f"{tag}: {results[tag]}", flush=True)
        except Exception as e:
            results[tag] = f"failed: {type(e).__name__}: {e}"
            print(f"{tag}: {results[tag]}", flush=True)
    print(json.dumps({"tile_sweep": results, "n_mols": n_mols,
                      "steps": n_steps,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
