"""EP comm/compute overlap evidence from the REAL TPU compiler (VERDICT r5
#4 "done" criterion).

Multi-chip hardware is not available in this environment, but XLA:TPU can
AOT-compile for a described topology (jax.experimental.topologies). This
script compiles the full edge-partitioned train step for a v5e 2x4 slice at
the production tile sizes and inspects the SCHEDULED HLO: on TPU, collective
ops are emitted as async ``*-start``/``*-done`` pairs and the latency-hiding
scheduler places independent compute between them — the textual instruction
order of the scheduled module IS the execution order, so "ops between start
and done" measures the achieved overlap.

Reports, per collective pair: bytes moved, the number of compute ops
(fusions / Mosaic kernel custom-calls / convolutions) scheduled inside the
start→done window, and whether a Mosaic GAT kernel rides under it (the
heavy-compute case: e.g. the fconn-level kernel has no data dependence on
the bond/atom-level gathers, so the scheduler is free to hide a gather
under it — ops/pallas_gat.py:pallas_gat_pass_ep's combine is structured to
keep those dependencies unlinked).

Usage: python scripts/ep_overlap_hlo.py [--layers 2] [--out EPOVERLAP.json]
(Needs the TPU plugin importable; works without any attached chip.)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# NO persistent compilation cache here: its key ignores compiler_options, so
# the second variant would silently return the first variant's executable
# (observed — both variants reported identical schedules until disabled).
# CAVEAT on this pod: the axon REMOTE-compile service has the same property
# (server-side executable cache keyed by HLO hash, compiler options
# ignored), so a flags-A/B needs fresh compiles — run each variant before
# the other has ever been compiled for this program, or vary the program.
# EPOVERLAP.json in the repo was built from two such fresh compiles.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import numpy as np

_DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
             "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")

# On TPU the latency-hiding scheduler wraps overlappable collectives as
# fusion ops NAMED %async-collective-start.N / %async-collective-done.N
# (get-tuple-elements of the start feed the done); collectives it chose NOT
# to make async stay as plain sync all-gather/all-reduce/reduce-scatter ops.
_ASTART_RE = re.compile(r"^(?:ROOT )?%(async-collective-start[.\w]*) = (.*?) fusion\(")
_SYNC_RE = re.compile(
    r"^(?:ROOT )?%[\w.-]+ = (.*?) "
    r"(all-gather|all-reduce|reduce-scatter|collective-permute)\(")
_COMPUTE_RE = re.compile(
    r"= .*? (fusion|convolution|dot|custom-call)\(")


def _shape_bytes(sig: str, reduce=sum) -> int:
    """Byte sizes of the typed shapes in an HLO signature. For async-start
    tuples (input, output, sync flags) ``reduce=max`` picks the transfer
    payload (the gathered output) instead of double-counting in+out."""
    sizes = []
    for dt, dims in _SHAPE_RE.findall(sig):
        if dt not in _DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        sizes.append(n * _DT_BYTES[dt])
    return reduce(sizes) if sizes else 0


def analyze_schedule(hlo: str) -> list:
    """The scheduled module's textual instruction order is the execution
    order. Restricted to the ENTRY computation: pair every
    async-collective-start with its done (the async-collective-done fusion
    consuming the start's get-tuple-elements) and count the compute ops
    scheduled in between; sync collectives are reported with zero overlap."""
    # ENTRY region only (fusion bodies / nested computations would double-
    # count their ops)
    lines_all = hlo.splitlines()
    try:
        e0 = next(i for i, l in enumerate(lines_all)
                  if l.startswith("ENTRY "))
    except StopIteration:
        e0 = 0
    lines = []
    for l in lines_all[e0 + 1:]:
        if l.startswith("}"):
            break
        lines.append(l.strip())

    # pass 1: start/done positions (paired by numeric suffix — the async
    # fusion wrapper's operand chains go through intermediate fusions, but
    # XLA numbers each start/done pair identically) + sync positions
    starts = {}          # suffix -> (idx, sig)
    dones = []           # (idx, suffix)
    syncs = []           # (idx, kind, sig)
    for i, s in enumerate(lines):
        ms = re.match(r"^(?:ROOT )?%async-collective-start([.\d]*) = "
                      r"(\(.*?\)|\S+) [a-z-]+\(", s)
        if ms:
            starts[ms.group(1)] = (i, ms.group(2))
            continue
        md = re.match(r"^(?:ROOT )?%async-collective-done([.\d]*) = ", s)
        if md:
            dones.append((i, md.group(1)))
            continue
        my = _SYNC_RE.match(s)
        if my:
            syncs.append((i, my.group(2), my.group(1)))

    def count_compute(a, b):
        n = m = 0
        for j in range(a + 1, b):
            t = lines[j]
            if _COMPUTE_RE.search(t) and "get-tuple-element" not in t:
                n += 1
                if "tpu_custom_call" in t or "Mosaic" in t:
                    m += 1
        return n, m

    pairs = []
    for i_done, suffix in dones:
        i_start, sig = starts.get(suffix, (None, ""))
        if i_start is None or i_done <= i_start:
            continue
        n, m = count_compute(i_start, i_done)
        pairs.append({
            "kind": "async-collective",
            "name": f"async-collective-start{suffix}",
            "bytes": _shape_bytes(sig, reduce=max),
            "ops_between": i_done - i_start - 1,
            "compute_between": n, "mosaic_kernels_between": m,
        })
    for i, kind, sig in syncs:
        pairs.append({
            "kind": f"sync-{kind}", "name": kind,
            "bytes": _shape_bytes(sig),
            "ops_between": 0, "compute_between": 0,
            "mosaic_kernels_between": 0,
        })
    return pairs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--n-mols", type=int, default=96)
    ap.add_argument("--out", default="EPOVERLAP.json")
    ap.add_argument("--topology", default="v5e:2x4")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from fragnet_tpu.data.datasets import build_graphs
    from fragnet_tpu.data.synthetic import synthetic_dataset
    from fragnet_tpu.dist.edge_partition import (make_ep_train_step,
                                                 with_ep_tile_meta)
    from fragnet_tpu.graphs.hiergraph import pad_batch, spec_for
    from fragnet_tpu.model.finetune import FragNetFineTune
    from fragnet_tpu.train.loop import TrainState
    from fragnet_tpu.train.optim import make_optimizer

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.topology)
    devs = np.array(topo.devices)
    S = devs.size
    mesh = Mesh(devs.reshape(S), ("ep",))

    df = synthetic_dataset(n=args.n_mols, task="regression", seed=0)
    graphs = build_graphs(list(df["smiles"]), [[v] for v in df["y"]])
    # production tile sizes need every edge axis divisible by S*te and node
    # axes by tn — round everything to lcm(8*256, 128) = 2048
    spec = spec_for(graphs, batch_size=len(graphs), multiple=2048,
                    align=False)
    batch_np, fused = with_ep_tile_meta(pad_batch(graphs, spec), S,
                                        tn=128, te=256)
    if not fused:
        raise SystemExit("EP tile meta failed — batch violates TCSR layout")
    batch = jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None, batch_np)
    kw = dict(num_layer=args.layers, num_heads=4, emb_dim=128,
              h1=64, h2=64, h3=64, h4=32)
    model = FragNetFineTune(ep_axis="ep", dtype=jnp.bfloat16, **kw)
    init_model = FragNetFineTune(dtype=jnp.bfloat16, **kw)
    # abstract init (no device execution needed for AOT analysis)
    params = jax.eval_shape(
        lambda r, b: init_model.init(r, b, deterministic=True),
        jax.random.PRNGKey(0), batch)
    params = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), params)
    tx = make_optimizer("adam", lr=1e-4)
    state = TrainState.create(params, tx)
    step = make_ep_train_step(model, tx, mesh, batch, "mse", axis="ep")

    sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, (state, batch, jax.random.PRNGKey(1)))
    print("lowering + AOT compiling for", args.topology, "...", flush=True)
    lowered = step.lower(*sds)

    from fragnet_tpu.dist.edge_partition import EP_COMPILER_OPTIONS

    out = {"topology": args.topology, "layers": args.layers, "variants": {}}
    for label, copts in (("default_flags", None),
                         ("async_fusion_flags", EP_COMPILER_OPTIONS)):
        hlo = lowered.compile(
            compiler_options=copts and dict(copts)).as_text()
        pairs = analyze_schedule(hlo)
        asy = [p for p in pairs if p["kind"] == "async-collective"]
        a_bytes = sum(p["bytes"] for p in asy)
        s_bytes = sum(p["bytes"] for p in pairs) - a_bytes
        res = {
            "n_collectives": len(pairs),
            "n_async_pairs": len(asy),
            "async_bytes": a_bytes, "sync_bytes": s_bytes,
            "async_byte_frac": round(a_bytes / max(1, a_bytes + s_bytes), 3),
            "pairs_with_compute": sum(1 for p in asy
                                      if p["compute_between"] > 0),
            "pairs_with_mosaic": sum(1 for p in asy
                                     if p["mosaic_kernels_between"] > 0),
            "pairs": sorted(asy, key=lambda p: -p["bytes"])[:24],
        }
        out["variants"][label] = res
        print(f"[{label}] collectives={res['n_collectives']} "
              f"async={res['n_async_pairs']} "
              f"async_bytes={a_bytes:,} ({res['async_byte_frac']:.0%}) "
              f"sync_bytes={s_bytes:,} "
              f"mosaic_under={res['pairs_with_mosaic']}")
        for p in res["pairs"][:8]:
            print(f"   {p['bytes']:>10,}B  sched_ops_between="
                  f"{p['ops_between']:>4} compute={p['compute_between']:>3} "
                  f"mosaic={p['mosaic_kernels_between']}")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
