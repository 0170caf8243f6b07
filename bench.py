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
    # Watchdog: a wedged device (e.g. a stuck grant on the tunneled TPU)
    # hangs the first fetch forever; the driver must still get ONE JSON line.
    import threading

    first_step_done = threading.Event()

    def _watchdog(limit: float) -> None:
        if not first_step_done.wait(limit):
            print(json.dumps({
                "metric": "train_message_edges_per_sec", "value": 0.0,
                "unit": "edges/s", "vs_baseline": 0.0,
                "error": f"device unresponsive: first step not done "
                         f"within {limit:.0f}s (watchdog)",
            }), flush=True)
            os._exit(3)

    threading.Thread(
        target=_watchdog,
        args=(float(os.environ.get("BENCH_WATCHDOG_S", 900)),),
        daemon=True,
    ).start()
    import jax

    from fragnet_tpu.data.batcher import BatchLoader
    from fragnet_tpu.data.datasets import build_graphs
    from fragnet_tpu.data.synthetic import synthetic_dataset
    from fragnet_tpu.graphs.hiergraph import spec_for
    from fragnet_tpu.model.finetune import FragNetFineTune
    from fragnet_tpu.train import fastpath
    from fragnet_tpu.train.loop import TrainState, make_train_step
    from fragnet_tpu.train.optim import make_optimizer

    import jax.numpy as jnp

    # kernel strategy through the SAME resolver the training entries use
    # (config defaults + FRAGNET_DENSE_* env overrides; VERDICT r4 #7)
    kernel_policy = fastpath.resolve_kernel_policy({})

    t_start = time.perf_counter()
    # diagnostic extras (mosaic gate / roofline / sweep) only run while
    # within this wall-clock budget — the driver runs bench.py under its own
    # timeout and the ONE JSON line must always be printed
    budget = float(os.environ.get("BENCH_BUDGET_S", 700))
    within_budget = lambda: (time.perf_counter() - t_start) < budget
    n_mols = int(os.environ.get("BENCH_N_MOLS", 512))
    batch_size = int(os.environ.get("BENCH_BATCH", 256))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" \
        else jnp.float32
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1" \
        and jax.default_backend() == "tpu"
    num_layers = 4

    # BENCH_PROFILE=esol|lipo|hiv swaps in the realistic MoleculeNet size
    # distribution (data/synthetic.py:_SIZE_PROFILES); default keeps the
    # legacy generator so vs_baseline stays comparable across rounds
    profile = os.environ.get("BENCH_PROFILE") or None
    # featurization cache: the same synthetic set is deterministic per
    # (n_mols, profile); skipping the 3-4 min rebuild lets bench finish
    # within short windows of TPU availability
    gcache = f"/tmp/bench_graphs_{n_mols}_{profile or 'default'}.pkl"
    graphs = None
    if os.path.exists(gcache):
        import pickle

        try:
            with open(gcache, "rb") as f:
                graphs = pickle.load(f)
        except Exception:
            graphs = None
    if graphs is None:
        df = synthetic_dataset(n=n_mols, task="regression", seed=7,
                               profile=profile)
        graphs = build_graphs(list(df["smiles"]), [[v] for v in df["y"]])
        import pickle

        with open(gcache, "wb") as f:
            pickle.dump(graphs, f)
    spec = spec_for(graphs, batch_size=batch_size, tcsr=use_pallas)

    model = FragNetFineTune(num_layer=num_layers, num_heads=4, emb_dim=128,
                            h1=128, h2=1024, h3=1024, h4=512, act="relu",
                            drop_ratio=0.1, dtype=dtype)
    loader = BatchLoader(graphs, batch_size, spec=spec, shuffle=True, seed=0)
    device_batches = [jax.tree.map(jax.device_put, b) for b in loader]

    params = jax.jit(
        lambda r, b: model.init(r, b, deterministic=True)
    )(jax.random.PRNGKey(0), device_batches[0])
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
    first_step_done.set()

    # --- Mosaic numerics gate (VERDICT r2 weak #5): the REAL TPU lowering of
    # the fused kernel must match the XLA segment path on device — the CPU
    # parity tests run interpret=True and would miss a Mosaic miscompile.
    mosaic_check = None
    cw_hetero = None
    if use_pallas and device_batches[0].tm_atom is not None \
            and os.environ.get("BENCH_MOSAIC_CHECK", "1") == "1" \
            and within_budget():
        import dataclasses as _dc

        b0 = device_batches[0]
        # null the dense planes too: with dp_* present the "XLA reference"
        # side would run the SAME dense kernels and the gate would compare
        # them with themselves (ADVICE r4 medium #2)
        b_xla = _dc.replace(b0, tm_atom=None, tm_bond=None, tm_frag=None,
                            tm_fc=None, dp_atom=None, dp_bond=None,
                            dp_frag=None, dp_fc=None)
        # 1 layer in f32: exercises all four Mosaic kernels (bond/atom/
        # fconn/frag) at a fraction of the 4-layer compile time
        f32model = FragNetFineTune(num_layer=1, num_heads=4, emb_dim=128,
                                   h1=64, h2=64, h3=64, h4=32, act="relu",
                                   drop_ratio=0.1)
        p32 = jax.jit(
            lambda r, b: f32model.init(r, b, deterministic=True)
        )(jax.random.PRNGKey(2), b_xla)
        out_pl = np.asarray(jax.jit(
            lambda p, b: f32model.apply(p, b, deterministic=True))(p32, b0))
        out_xla = np.asarray(jax.jit(
            lambda p, b: f32model.apply(p, b, deterministic=True))(p32, b_xla))
        mosaic_check = float(np.abs(out_pl - out_xla).max())
        # f32 ordering spread between the two paths (one-hot MXU matmul
        # chains + online softmax vs XLA segment ops) measures 2.7e-4–5.3e-4
        # depending on batch composition; a real Mosaic miscompile shows as
        # O(1) garbage or NaN, so 1e-3 keeps the gate honest without flaking.
        np.testing.assert_allclose(
            out_pl, out_xla, atol=1e-3, rtol=1e-3,
            err_msg="Mosaic kernel diverges from the XLA path ON DEVICE")
        # record that the dead-chunk skip path (cw[t] < n_chunks) was
        # actually exercised on device by this gate batch (ADVICE r3)
        cw_hetero = {}
        for lvl, tm in (("atom", b0.tm_atom), ("bond", b0.tm_bond),
                        ("frag", b0.tm_frag), ("fc", b0.tm_fc)):
            if tm is not None:
                cw = np.asarray(tm.cw)
                cw_hetero[lvl] = {
                    "n_chunks": int(tm.n_chunks),
                    "cw_min": int(cw.min()), "cw_max": int(cw.max()),
                    "tiles_skipping": int((cw < tm.n_chunks).sum()),
                }

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

    # --- end-to-end pipeline: packed single-buffer transport
    # (data/packing.py) — ~6x less tunnel traffic than raw leaves. Every
    # epoch covers all graphs once, so edges/epoch is composition-
    # independent. Two numbers:
    #   * pipeline_edges_per_sec — the STEADY STATE of the streamed-pretrain
    #     design (train/pretrain.py): pack each batch once into a host-RAM
    #     cache of ~1 MB uint8 buffers (parallel pack workers), replay
    #     reshuffled every later epoch. Epoch 2+ skips host padding/packing.
    #   * pipeline_cold_edges_per_sec — pack-EVERY-batch process streaming,
    #     the rate of epoch 1 / datasets beyond the host-cache budget.
    epoch_edges = float(sum(edges_per_batch))
    ploader = BatchLoader(graphs, batch_size, spec=spec, shuffle=True, seed=0,
                          pack=True, compute_dtype=dtype)
    pb0 = next(iter(ploader))  # builds the layout; also warms the worker path
    pstep = make_train_step(model, tx, "mse", layout=ploader.layout)
    state, loss = pstep(state, pb0, rng)
    _ = float(loss)
    n_epochs = max(1, n_steps // max(1, len(device_batches)) // 2)
    # process=True packs in spawned workers: on the tunneled backend the
    # client thread needs the GIL to pump async dispatch, so thread-mode
    # packing serializes with device compute (the r3 pipeline regression);
    # BENCH_PIPE_MODE=thread measures the old path for comparison
    pipe_proc = os.environ.get("BENCH_PIPE_MODE", "process") == "process"
    # pack workers scale the host side ~linearly; size to host cores
    pipe_workers = int(os.environ.get("BENCH_PIPE_WORKERS", 3))
    pipe_err = None
    pipeline_cold_eps = 0.0
    pipeline_host_eps = 0.0
    try:
        from fragnet_tpu.data.batcher import PackedCacheLoader

        pcache = PackedCacheLoader(ploader, seed=2, workers=pipe_workers
                                   if pipe_proc else 1, to_device=False)
        nb = len(pcache)
        # tier 1 (primary): HBM-resident packed buffers — the
        # DevicePackedCacheLoader steady state (zero host work + zero
        # transfers; in-jit unpack + Pallas plane builder)
        dev_bufs = [jax.device_put(b) for b in pcache.bufs]
        for b in dev_bufs:  # warm epoch
            state, loss = pstep(state, b, rng)
        _ = float(loss)
        t0 = time.perf_counter()
        for ep in range(n_epochs):
            order = np.random.default_rng(ep).permutation(nb)
            for i in order:
                state, loss = pstep(state, dev_bufs[i], rng)
        _ = float(loss)
        pipeline_eps = epoch_edges * n_epochs / (time.perf_counter() - t0)
        del dev_bufs
        # tier 2: host-RAM packed cache (replay via device_put per batch)
        pcache.to_device = True
        stream = pcache.stream(n_epochs + 1, depth=6)
        for _ in range(nb):  # warm epoch
            b = next(stream, None)
            if b is None:
                break
            state, loss = pstep(state, b, rng)
        _ = float(loss)
        n_run = 0
        t0 = time.perf_counter()
        for b in stream:
            state, loss = pstep(state, b, rng)
            n_run += 1
        _ = float(loss)
        pipeline_host_eps = (epoch_edges * n_run / max(1, nb)
                             / (time.perf_counter() - t0))
    except Exception as e:  # a dead pack worker must not kill the bench
        pipe_err = f"{type(e).__name__}: {e}"
        pipeline_eps = 0.0
    try:
        # cold rate: pack-every-batch process streaming. The spawned workers
        # cost ~10-20 s of one-time import before the first buffer arrives
        # (irrelevant over an hours-long pretrain); start the clock at the
        # FIRST yielded batch.
        cold_epochs = max(1, min(2, n_epochs))
        stream = ploader.stream(cold_epochs + 1, depth=6, process=pipe_proc,
                                workers=pipe_workers if pipe_proc else 1)
        warm = 1 + len(device_batches)  # worker startup + first epoch warm
        for _ in range(warm):
            b = next(stream, None)
            if b is None:
                break
            state, loss = pstep(state, b, rng)
        _ = float(loss)
        n_run = 0
        t0 = time.perf_counter()
        for b in stream:
            state, loss = pstep(state, b, rng)
            n_run += 1
        _ = float(loss)
        pipeline_cold_eps = (epoch_edges * n_run
                             / max(1, len(device_batches))
                             / (time.perf_counter() - t0))
    except Exception as e:
        pipe_err = (pipe_err or "") + f" cold: {type(e).__name__}: {e}"
        pipeline_cold_eps = 0.0

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

    # --- roofline (VERDICT r2 weak #4): per-level fused-pass timing with an
    # analytic cost model of the one-hot-matmul gather strategy → achieved
    # MXU TFLOP/s and HBM GB/s vs v5e peaks, plus the useful:executed flops
    # ratio. "Speed of light" becomes a measured fraction, not an assertion.
    roofline = None
    if use_pallas and device_batches[0].tm_atom is not None \
            and os.environ.get("BENCH_ROOFLINE", "0") == "1" \
            and within_budget():
        roofline = _roofline(jax, jnp, model, params, device_batches[0],
                             num_layers)

    # --- realistic-size profiles (VERDICT r5 #3): device-resident edges/s
    # on the esol MoleculeNet size distribution, recorded in EVERY bench
    # artifact (not just when BENCH_PROFILE overrides the main run). The
    # per-dataset spec (window-sum caps + per-axis node tiles) makes this
    # a first-class number, not a degraded mode.
    profile_eps = {}
    extra_profiles = [p for p in os.environ.get(
        "BENCH_EXTRA_PROFILES", "esol").split(",")
        if p and p != (profile or "default")]
    for prof2 in extra_profiles:
        if not within_budget():
            break
        try:
            gc2 = f"/tmp/bench_graphs_{n_mols}_{prof2}.pkl"
            graphs2 = None
            if os.path.exists(gc2):
                import pickle

                with open(gc2, "rb") as f:
                    graphs2 = pickle.load(f)
            if graphs2 is None:
                df2 = synthetic_dataset(n=n_mols, task="regression", seed=7,
                                        profile=prof2)
                graphs2 = build_graphs(list(df2["smiles"]),
                                       [[v] for v in df2["y"]])
                import pickle

                with open(gc2, "wb") as f:
                    pickle.dump(graphs2, f)
            spec2 = spec_for(graphs2, batch_size=batch_size, tcsr=use_pallas)
            loader2 = BatchLoader(graphs2, batch_size, spec=spec2,
                                  shuffle=True, seed=0)
            dbs2 = [jax.tree.map(jax.device_put, b) for b in loader2]
            p2 = jax.jit(
                lambda r, b: model.init(r, b, deterministic=True)
            )(jax.random.PRNGKey(5), dbs2[0])
            st2 = TrainState.create(p2, tx)
            step2 = make_train_step(model, tx, "mse")
            st2, l2 = step2(st2, dbs2[0], rng)
            _ = float(l2)
            eb2 = [real_edges(b) for b in dbs2]
            n2 = max(30, n_steps // 3)
            tot = 0.0
            t0 = time.perf_counter()
            for i in range(n2):
                st2, l2 = step2(st2, dbs2[i % len(dbs2)], rng)
                tot += eb2[i % len(dbs2)]
            _ = float(l2)
            profile_eps[prof2] = round(tot / (time.perf_counter() - t0), 1)
        except Exception as e:  # diagnostic, never fatal
            profile_eps[prof2] = f"failed: {type(e).__name__}: {str(e)[:160]}"

    # --- batch-size sweep: device-resident edges/s at 256/512/1024 (the
    # per-chip scale knob — molecules concatenate, SURVEY §5.7)
    sweep = {}
    if os.environ.get("BENCH_SWEEP", "0") == "1" and n_mols >= 512 \
            and within_budget():
        for bs2 in (512, 1024):
            if bs2 == batch_size or bs2 > n_mols:
                continue
            try:
                spec2 = spec_for(graphs, batch_size=bs2, tcsr=use_pallas)
                loader2 = BatchLoader(graphs, bs2, spec=spec2, shuffle=True,
                                      seed=0, drop_last=True)
                dbs2 = [jax.tree.map(jax.device_put, b) for b in loader2]
                if not dbs2:
                    continue
                # fresh init: the main loop's donated step consumed the
                # original param buffers (even .copy() on them raises)
                p2 = jax.jit(
                    lambda r, b: model.init(r, b, deterministic=True)
                )(jax.random.PRNGKey(3), dbs2[0])
                st2 = TrainState.create(p2, tx)
                step2 = make_train_step(model, tx, "mse")
                st2, l2 = step2(st2, dbs2[0], rng)
                _ = float(l2)
                eb2 = [real_edges(b) for b in dbs2]
                n2 = max(20, n_steps // 4)
                tot = 0.0
                t0 = time.perf_counter()
                for i in range(n2):
                    st2, l2 = step2(st2, dbs2[i % len(dbs2)], rng)
                    tot += eb2[i % len(dbs2)]
                _ = float(l2)
                sweep[str(bs2)] = round(tot / (time.perf_counter() - t0), 1)
            except Exception as e:  # sweep is diagnostic, never fatal
                sweep[str(bs2)] = f"failed: {type(e).__name__}: {str(e)[:200]}"

    baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    if os.path.exists(base_path):
        try:
            with open(base_path) as f:
                baseline = float(json.load(f).get("value"))
        except Exception:
            baseline = None
    out = {
        "metric": "train_message_edges_per_sec",
        "value": round(device_eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(device_eps / baseline, 4) if baseline else 1.0,
        "pipeline_edges_per_sec": round(pipeline_eps, 1),
        "pipeline_host_edges_per_sec": round(pipeline_host_eps, 1),
        "pipeline_cold_edges_per_sec": round(pipeline_cold_eps, 1),
        "cached_edges_per_sec": round(cached_eps, 1),
        "batch_size": batch_size,
        "device": str(jax.devices()[0]),
        # every perf claim must be auditable from the artifact (VERDICT r4
        # weak #2): record the pipeline configuration + host parallelism
        "pipe_mode": "process" if pipe_proc else "thread",
        "pipe_workers": pipe_workers if pipe_proc else 1,
        "host_cpus": os.cpu_count(),
        "profile": profile or "default",
        "kernel_policy": {"bond": kernel_policy.bond, "fc": kernel_policy.fc,
                          "attr": kernel_policy.attr},
    }
    if profile_eps:
        out["profile_edges_per_sec"] = profile_eps
    if mosaic_check is not None:
        out["mosaic_vs_xla_maxdiff"] = mosaic_check
    if cw_hetero:
        out["cw_hetero"] = cw_hetero
    if pipe_err:
        out["pipeline_error"] = pipe_err
    if sweep:
        out["sweep_edges_per_sec"] = sweep
    if roofline:
        out["roofline"] = roofline
    print(json.dumps(out))


# v5e single-chip peaks (public spec): 197 bf16 TFLOP/s, 819 GB/s HBM
_V5E_TFLOPS = {"bfloat16": 197e12, "float32": 98.5e12}
_V5E_HBM = 819e9


def _roofline(jax, jnp, model, params, batch, num_layers):
    """Time each level's fused forward pass in isolation and compare against
    the analytic cost of the one-hot-matmul strategy.

    Executed-MXU flops per grid step (tile Tn, chunk Te, window k·Tn):
      oh_dst·w_dst / gather-m / scatter-p:  3 · 2·Te·Tn·H
      oh_src·w_src:                              2·Te·(k·Tn)·H
      h_src gather (dominant):                   2·Te·(k·Tn)·HD
      weighted scatter (dominant):               2·Te·Tn·HD
      head-broadcast/sum matmuls:              ~ 2·(Te+2Tn)·H·HD
    Useful flops per REAL edge: SDDMM 2·H·(2D+Da) + SpMM 2·HD.
    HBM bytes per grid step: (k+1)·Tn·(2H·4 + HD·dtb) + Te·(4H+12)."""
    import time as _t

    import numpy as _np

    from fragnet_tpu.ops.dense_gat import (dense_attr_gat_pass,
                                           dense_gat_pass)
    from fragnet_tpu.ops.pallas_gat import pallas_gat_pass

    H = model.num_heads
    emb = model.emb_dim
    D = emb // H
    dtb = 2 if model.dtype == jnp.bfloat16 else 4
    levels = {
        "bond": (batch.nf_bonds.shape[0], batch.bg_src, batch.bg_dst,
                 batch.bg_mask, batch.tm_bond, D, False,
                 getattr(batch, "dp_bond", None)),
        "atom": (batch.x_atoms.shape[0], batch.edge_src, batch.edge_dst,
                 batch.edge_mask, batch.tm_atom, emb, True,
                 getattr(batch, "dp_atom", None)),
        "fconn": (batch.nf_fbonds.shape[0], batch.fc_src, batch.fc_dst,
                  batch.fc_mask, batch.tm_fc, D, False,
                  getattr(batch, "dp_fc", None)),
        "frag": (batch.x_frags.shape[0], batch.frag_src, batch.frag_dst,
                 batch.fconn_mask, batch.tm_frag, emb, False,
                 getattr(batch, "dp_frag", None)),
    }
    rng = _np.random.default_rng(0)
    rep = int(os.environ.get("BENCH_ROOFLINE_STEPS", 50))
    out = {}
    for name, (N, src, dst, mask, meta, Da, self_loops, dp) in levels.items():
        if meta is None and dp is None:
            continue
        HD = H * D
        nf = jnp.asarray(rng.standard_normal((N, H, D)), model.dtype)
        ea = jnp.asarray(rng.standard_normal((int(src.shape[0]), Da)),
                         model.dtype)
        a = jnp.asarray(rng.standard_normal((H, 2 * D + Da)), jnp.float32)
        n_real = float(_np.asarray(mask).sum()) + (N if self_loops else 0)
        useful = n_real * (2 * H * (2 * D + Da) + 2 * HD)
        peak_f = _V5E_TFLOPS.get(str(model.dtype), 197e12)

        if dp is not None:
            # dense zero-gather kernels (ops/dense_gat.py)
            R = dp.shape[1] // dp.shape[2] - 1
            tn = dp.shape[2]
            n_tiles = dp.shape[0]
            if R == 0:
                # dynamic-attr variant: per-chunk in-kernel w_ea scatter
                # (H one-hot matmuls) + dense attention on the last chunk
                nc = meta.n_chunks
                te = meta.te
                fn = jax.jit(lambda nf_, ea_: dense_attr_gat_pass(
                    nf_, ea_, src, dst, mask, a, jnp.asarray(dp), meta,
                    self_loops=self_loops)[0])
                exec_flops = n_tiles * (nc * H * 2 * tn * tn * te
                                        + H * 2 * tn * tn * D)
                exec_bytes = n_tiles * (tn * tn * 4 + tn * HD * (dtb + 4)
                                        + nc * te * (4 * H + 12))
                grid = [n_tiles, nc]
            else:
                v = jnp.asarray(rng.standard_normal((R, H)),
                                jnp.float32) * 0.1
                c = jnp.asarray(rng.standard_normal((H,)), jnp.float32) * 0.1
                fn = jax.jit(lambda nf_, ea_: dense_gat_pass(
                    nf_, jnp.asarray(dp), v, c, ea_, src, dst, mask, a)[0])
                exec_flops = n_tiles * H * 2 * tn * tn * D
                exec_bytes = n_tiles * ((R + 1) * tn * tn * 4
                                        + tn * HD * (dtb + 4)
                                        + 4 * tn * H * 4)
                grid = [n_tiles, 1]
            k = 1
        else:
            fn = jax.jit(lambda nf_, ea_: pallas_gat_pass(
                nf_, ea_, src, dst, mask, a, meta, self_loops=self_loops)[0])
            tn, te, k, nc = meta.tn, meta.te, meta.k_src, meta.n_chunks
            gsteps = (N // tn) * nc
            flops_step = (3 * 2 * te * tn * H + 2 * te * k * tn * H
                          + 2 * te * k * tn * HD + 2 * te * tn * HD
                          + 2 * (te + 2 * tn) * H * HD)
            exec_flops = gsteps * flops_step
            bytes_step = (k + 1) * tn * (2 * H * 4 + HD * dtb) \
                + te * (4 * H + 12)
            exec_bytes = gsteps * bytes_step + N * (HD * 4 + 2 * H * 4)
            grid = [N // tn, nc]

        o = fn(nf, ea)
        _ = float(jnp.sum(o))  # compile + sync
        t0 = _t.perf_counter()
        for _i in range(rep):
            o = fn(nf, ea)
        _ = float(jnp.sum(o))
        dt = (_t.perf_counter() - t0) / rep

        out[name] = {
            "ms": round(dt * 1e3, 3),
            "exec_tflops": round(exec_flops / dt / 1e12, 2),
            "pct_mxu_peak": round(100 * exec_flops / dt / peak_f, 1),
            "hbm_gbps": round(exec_bytes / dt / 1e9, 1),
            "pct_hbm_peak": round(100 * exec_bytes / dt / _V5E_HBM, 1),
            "useful_flop_frac": round(useful / exec_flops, 4),
            "grid": grid, "k_src": k,
            "kernel": "dense" if dp is not None else "tcsr",
        }
    return out


if __name__ == "__main__":
    main()
