"""Anatomy of one training step at a given size profile — where does the
time go when molecules are small?

The realistic-size profiles (BENCH_PROFILE=esol: median 16 atoms) measure a
fraction of the default synthetic profile's edges/s (VERDICT r4 weak #4)
while the step time stays nearly constant — i.e. the step is dominated by a
FIXED cost that does not scale with molecule size. This script splits that
fixed cost into its candidates, each measured with the bench's own loop
pattern (N async dispatches + one final scalar fetch as the completion
barrier on the tunneled backend):

  * scalar_floor   — a donated s+1 step: pure dispatch/tunnel floor
  * fwd            — model forward only
  * step           — full train step (fwd+bwd+adam), the headline path
  * step_scan8     — the SAME train step, 8 optimizer steps per dispatch via
                     lax.scan over stacked resident batches: if edges/s rises
                     sharply, the ceiling is per-dispatch overhead, not
                     device compute
  * per-level fused-pass forward timings at this profile's shapes

Usage: BENCH_PROFILE=esol python scripts/step_anatomy.py [--steps 100]
Writes one JSON line; used to decide VERDICT r5 items #2/#3.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import optax

from fragnet_tpu.data.batcher import BatchLoader
from fragnet_tpu.data.datasets import build_graphs
from fragnet_tpu.data.synthetic import synthetic_dataset
from fragnet_tpu.graphs.hiergraph import spec_for
from fragnet_tpu.model.finetune import FragNetFineTune
from fragnet_tpu.train import fastpath
from fragnet_tpu.train.loop import LOSSES, TrainState, make_train_step
from fragnet_tpu.train.optim import make_optimizer


def timed(fn, n, *args):
    """Run fn n times (async dispatch), fetch a scalar at the end."""
    out = None
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[-1]
    _ = np.asarray(leaf).ravel()[0]
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n-mols", type=int, default=512)
    args = ap.parse_args()

    fastpath.resolve_kernel_policy({})
    profile = os.environ.get("BENCH_PROFILE") or None
    gcache = f"/tmp/bench_graphs_{args.n_mols}_{profile or 'default'}.pkl"
    import pickle

    if os.path.exists(gcache):
        with open(gcache, "rb") as f:
            graphs = pickle.load(f)
    else:
        df = synthetic_dataset(n=args.n_mols, task="regression", seed=7,
                               profile=profile)
        graphs = build_graphs(list(df["smiles"]), [[v] for v in df["y"]])
        with open(gcache, "wb") as f:
            pickle.dump(graphs, f)

    use_pallas = jax.default_backend() == "tpu"
    spec = spec_for(graphs, batch_size=args.batch, tcsr=use_pallas)
    model = FragNetFineTune(num_layer=4, num_heads=4, emb_dim=128,
                            h1=128, h2=1024, h3=1024, h4=512, act="relu",
                            drop_ratio=0.1, dtype=jnp.bfloat16)
    loader = BatchLoader(graphs, args.batch, spec=spec, shuffle=True, seed=0)
    dbs = [jax.tree.map(jax.device_put, b) for b in loader]
    params = jax.jit(lambda r, b: model.init(r, b, deterministic=True))(
        jax.random.PRNGKey(0), dbs[0])
    tx = make_optimizer("adam", lr=1e-4)
    rng = jax.random.PRNGKey(1)
    n = args.steps

    def real_edges(b):
        return float(np.asarray(b.edge_mask).sum() + np.asarray(b.atom_mask).sum()
                     + np.asarray(b.bg_mask).sum() + np.asarray(b.fconn_mask).sum()
                     + np.asarray(b.fc_mask).sum()) * 4
    epb = float(np.mean([real_edges(b) for b in dbs]))

    out = {"profile": profile or "default", "batch": args.batch,
           "edges_per_batch": epb,
           "slots": {"atoms": spec.n_atoms, "edges": spec.n_edges,
                     "frags": spec.n_frags, "fconn": spec.n_fconn,
                     "bg_edges": spec.n_bg_edges, "fc_edges": spec.n_fc_edges}}

    # 1. dispatch floor
    @jax.jit
    def bump(s):
        return s + 1
    s0 = jax.device_put(jnp.zeros((), jnp.int32))
    s0 = bump(s0)
    t = timed(bump, n, s0)
    out["scalar_floor_ms"] = round(t * 1e3, 3)

    # 2. forward only
    fwd = jax.jit(lambda p, b: model.apply(p, b, deterministic=True))
    _ = np.asarray(fwd(params, dbs[0])).sum()
    t = timed(lambda: fwd(params, dbs[0]), n)
    out["fwd_ms"] = round(t * 1e3, 3)

    # 3. full step
    step = make_train_step(model, tx, "mse")
    state = TrainState.create(params, tx)
    state, l = step(state, dbs[0], rng)
    _ = float(l)
    t0 = time.perf_counter()
    for i in range(n):
        state, l = step(state, dbs[i % len(dbs)], rng)
    _ = float(l)
    t = (time.perf_counter() - t0) / n
    out["step_ms"] = round(t * 1e3, 3)
    out["step_edges_per_sec"] = round(epb / t, 1)

    # 4. scan over K resident batches in one dispatch
    K = min(8, len(dbs))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *dbs[:K])
    loss_fn = LOSSES["mse"]

    @jax.jit
    def scan_step(state, stacked, base_rng):
        def body(st, b):
            r = jax.random.fold_in(base_rng, st.step)

            def loss(p):
                o = model.apply(p, b, deterministic=False,
                                rngs={"dropout": r})
                return loss_fn(o, b.y, b.graph_mask)

            l, g = jax.value_and_grad(loss)(st.params)
            up, os_ = tx.update(g, st.opt_state, st.params)
            p2 = optax.apply_updates(st.params, up)
            return TrainState(params=p2, opt_state=os_, step=st.step + 1), l

        state, ls = jax.lax.scan(body, state, stacked)
        return state, ls[-1]

    state, l = scan_step(state, stacked, rng)
    _ = float(l)
    nscan = max(1, n // K)
    t0 = time.perf_counter()
    for _ in range(nscan):
        state, l = scan_step(state, stacked, rng)
    _ = float(l)
    t = (time.perf_counter() - t0) / nscan / K
    out["scan8_ms_per_step"] = round(t * 1e3, 3)
    out["scan8_edges_per_sec"] = round(epb / t, 1)

    # 5. per-level fused-pass forward timings (kernel-only view)
    if use_pallas and dbs[0].tm_atom is not None:
        from fragnet_tpu.ops.dense_gat import dense_attr_gat_pass, dense_gat_pass
        from fragnet_tpu.ops.pallas_gat import pallas_gat_pass

        b0 = dbs[0]
        H, D = 4, 32
        rngn = np.random.default_rng(0)
        lv = {}
        for name, (N, src, dst, mask, meta, dp, Da, sl) in {
            "bond": (b0.nf_bonds.shape[0], b0.bg_src, b0.bg_dst, b0.bg_mask,
                     b0.tm_bond, b0.dp_bond, 32, False),
            "atom": (b0.x_atoms.shape[0], b0.edge_src, b0.edge_dst,
                     b0.edge_mask, b0.tm_atom, None, 128, True),
            "fconn": (b0.nf_fbonds.shape[0], b0.fc_src, b0.fc_dst, b0.fc_mask,
                      b0.tm_fc, b0.dp_fc, 32, False),
            "frag": (b0.x_frags.shape[0], b0.frag_src, b0.frag_dst,
                     b0.fconn_mask, b0.tm_frag, None, 128, False),
        }.items():
            nf = jnp.asarray(rngn.standard_normal((N, H, D)), jnp.bfloat16)
            ea = jnp.asarray(rngn.standard_normal((int(src.shape[0]), Da)),
                             jnp.bfloat16)
            a = jnp.asarray(rngn.standard_normal((H, 2 * D + Da)), jnp.float32)
            if dp is not None:
                R = dp.shape[1] // dp.shape[2] - 1
                v = jnp.asarray(rngn.standard_normal((R, H)), jnp.float32)
                c = jnp.asarray(rngn.standard_normal((H,)), jnp.float32)
                fn = jax.jit(lambda nf_, ea_, dp_=dp, v_=v, c_=c, s_=src,
                             d_=dst, m_=mask, a_=a: dense_gat_pass(
                                 nf_, jnp.asarray(dp_), v_, c_, ea_, s_, d_,
                                 m_, a_)[0])
            else:
                fn = jax.jit(lambda nf_, ea_, s_=src, d_=dst, m_=mask, a_=a,
                             t_=meta, sl_=sl: pallas_gat_pass(
                                 nf_, ea_, s_, d_, m_, a_, t_,
                                 self_loops=sl_)[0])
            o = fn(nf, ea)
            _ = float(jnp.sum(o))
            t0 = time.perf_counter()
            for _ in range(50):
                o = fn(nf, ea)
            _ = float(jnp.sum(o))
            lv[name] = round((time.perf_counter() - t0) / 50 * 1e3, 3)
        out["level_fwd_ms"] = lv
        out["level_fwd_sum_x4_ms"] = round(sum(lv.values()) * 4, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
