"""Finetune entry point — the analog of fragnet/train/finetune/finetune_gat2.py.

Usage:
    python -m fragnet_tpu.train.finetune --config configs/ft/esol.yaml [k=v ...]

Config schema (reference-compatible keys kept: seed, exp_dir, model_version,
atom_features, frag_features, edge_features, fedge_in, fbond_edge_in,
pretrain.*, finetune.*):

    seed: 42
    exp_dir: exps/ft/esol
    model_version: gat2          # gat2 | gat2_lite | gat2_edge | gcn2
    finetune:
      data:
        name: esol               # registry name, or 'csv'
        path: null               # csv path / data dir
        split: scaffold          # scaffold | random | random_scaffold
        frag_type: brics
      model: {num_layer: 4, num_heads: 4, drop_ratio: 0.1, emb_dim: 128,
              h1: 128, h2: 1024, h3: 1024, h4: 512, act: relu,
              fthead: FTHead3}
      target_type: regr          # regr | clsf
      batch_size: 16
      lr: 1.0e-4
      n_epochs: 100
      es_patience: 100
      use_schedular: false
      chkpoint_name: ft.ckpt
    pretrain:
      use: false
      chk: path/to/pt.ckpt
"""

from __future__ import annotations

import argparse
import os
import pickle
import time
from typing import List, Optional

import jax
import numpy as np


def seed_everything(seed: int) -> None:
    """(reference finetune_gat2.py:17-26)"""
    import random

    random.seed(seed)
    np.random.seed(seed)


def build_model(opt, n_classes: int, ep_axis: Optional[str] = None,
                dtype=None):
    mv = opt.get("model_version", "gat2")
    m = opt.finetune.model
    if ep_axis is not None and mv != "gat2":
        raise ValueError("edge-partitioned training currently supports "
                         "model_version=gat2")
    kw = dict(
        n_classes=n_classes,
        atom_features=opt.get("atom_features", 167),
        frag_features=opt.get("frag_features", 167),
        edge_features=opt.get("edge_features", 17),
        fedge_in=opt.get("fedge_in", 6),
        fbond_edge_in=opt.get("fbond_edge_in", 6),
        num_layer=m.get("num_layer", 4),
        num_heads=m.get("num_heads", 4),
        drop_ratio=m.get("drop_ratio", 0.15),
        emb_dim=m.get("emb_dim", 128),
        h1=m.get("h1", 256), h2=m.get("h2", 256),
        h3=m.get("h3", 256), h4=m.get("h4", 256),
        act=m.get("act", "relu"),
        fthead=m.get("fthead", "FTHead3"),
    )
    from fragnet_tpu.train.fastpath import supports_dtype

    dkw = {"dtype": dtype} if (dtype is not None and supports_dtype(mv)) else {}
    if mv == "gat2":
        from fragnet_tpu.model.finetune import FragNetFineTune

        return FragNetFineTune(**kw, ep_axis=ep_axis, **dkw)
    if mv == "gat2_lite":
        from fragnet_tpu.model.variants import FragNetFineTuneLite

        return FragNetFineTuneLite(**kw)
    if mv == "gat2_edge":
        from fragnet_tpu.model.variants import FragNetFineTuneEdge

        return FragNetFineTuneEdge(**kw)
    if mv == "gcn2":
        from fragnet_tpu.model.variants import FragNetFineTuneGCN

        return FragNetFineTuneGCN(**kw)
    if mv == "gat2_transformer":
        from fragnet_tpu.model.transformer import FragNetFineTuneTransformer

        return FragNetFineTuneTransformer(
            n_classes=n_classes, num_layer=kw["num_layer"],
            num_heads=kw["num_heads"], drop_ratio=kw["drop_ratio"],
            emb_dim=kw["emb_dim"], h1=kw["h1"],
            transformer_heads=m.get("transformer_heads", 1),
            atom_features=kw["atom_features"],
            frag_features=kw["frag_features"],
            edge_features=kw["edge_features"],
            fedge_in=kw["fedge_in"], fbond_edge_in=kw["fbond_edge_in"],
            **dkw,
        )
    if mv == "gat2_transformer2":
        from fragnet_tpu.model.transformer import FragNetFineTuneTransformer2

        return FragNetFineTuneTransformer2(
            n_classes=n_classes, num_layer=kw["num_layer"],
            num_heads=kw["num_heads"], drop_ratio=kw["drop_ratio"],
            emb_dim=kw["emb_dim"], h1=kw["h1"],
            num_attn_layer2=m.get("num_attn_layer2", 6),
            num_attn_heads2=m.get("num_attn_heads2", 4),
            drop_ratio2=m.get("drop_ratio2", 0.3),
            max_seq_len=m.get("max_seq_len", 64),
            atom_features=kw["atom_features"],
            frag_features=kw["frag_features"],
            edge_features=kw["edge_features"],
            fedge_in=kw["fedge_in"], fbond_edge_in=kw["fbond_edge_in"],
            **dkw,
        )
    if mv == "gat2_multitask":
        from fragnet_tpu.model.transformer import FragNetFineTuneMultiTask

        # one scalar head per task; flattened output (G, n_tasks) feeds the
        # masked multi-task losses directly (train/utils.py:547-637)
        return FragNetFineTuneMultiTask(
            n_classes=1,
            n_multi_task_heads=m.get("n_multi_task_heads", n_classes),
            num_layer=kw["num_layer"], num_heads=kw["num_heads"],
            drop_ratio=kw["drop_ratio"], emb_dim=kw["emb_dim"],
            atom_features=kw["atom_features"],
            frag_features=kw["frag_features"],
            edge_features=kw["edge_features"],
            fedge_in=kw["fedge_in"], fbond_edge_in=kw["fbond_edge_in"],
            **dkw,
        )
    if mv in ("gat", "gcn", "gcn3"):
        from fragnet_tpu.model import ablations

        fn = {"gat": ablations.FragNetFineTuneV1,
              "gcn": ablations.FragNetFineTuneGCNv1,
              "gcn3": ablations.FragNetFineTuneGIN}[mv]
        return fn(
            n_classes=n_classes, num_layer=kw["num_layer"],
            drop_ratio=kw["drop_ratio"], emb_dim=kw["emb_dim"],
            atom_features=kw["atom_features"],
            edge_features=kw["edge_features"],
        )
    raise ValueError(f"unknown model_version {mv!r}")


def load_datasets(opt):
    """Returns (train_graphs, val_graphs, test_graphs, n_tasks, task)."""
    from fragnet_tpu.data.datasets import build_graphs, load_pickle_dataset
    from fragnet_tpu.data.moleculenet import load_moleculenet, target_columns
    from fragnet_tpu.data.splitters import random_split, scaffold_split

    ft = opt.finetune
    data = ft.get("data", None)

    # pre-featurized pickles (reference train/val/test.path flow)
    if ft.get("train", None) and ft.train.get("path", None):
        return (
            load_pickle_dataset(ft.train.path),
            load_pickle_dataset(ft.val.path),
            load_pickle_dataset(ft.test.path),
            int(ft.get("n_classes", 1)),
            ft.get("target_type", "regr"),
        )

    name = data.get("name", "esol")
    df = load_moleculenet(
        name,
        data_dir=data.get("path", None),
        n_synthetic=int(data.get("n_synthetic", 512)),
        seed=int(opt.get("seed", 42)),
    )
    tcols = target_columns(df)
    smiles = list(df["smiles"])
    split = data.get("split", "scaffold")
    if split == "scaffold":
        tr, va, te = scaffold_split(smiles)
    elif split == "random":
        tr, va, te = random_split(len(smiles), seed=int(opt.get("seed", 42)))
    else:
        from fragnet_tpu.data.splitters import random_scaffold_split

        tr, va, te = random_scaffold_split(smiles, seed=int(opt.get("seed", 42)))

    target_vals = df[tcols].values
    frag_type = data.get("frag_type", "brics")

    def make(idx):
        return build_graphs(
            [smiles[i] for i in idx],
            [target_vals[i] for i in idx],
            frag_type=frag_type,
        )

    task = opt.finetune.get("target_type", "regr")
    return make(tr), make(va), make(te), len(tcols), task


def run_finetune(opt, quiet: bool = False, datasets=None):
    from fragnet_tpu.data.batcher import BatchLoader
    from fragnet_tpu.graphs.hiergraph import spec_for
    from fragnet_tpu.train.checkpoint import (
        load_params,
        save_params,
        transfer_pretrained_encoder,
    )
    from fragnet_tpu.train.earlystop import EarlyStopping
    from fragnet_tpu.train.loop import TrainerFineTune, TrainState
    from fragnet_tpu.train.optim import make_optimizer, make_schedule

    seed = int(opt.get("seed", 42))
    seed_everything(seed)
    exp_dir = opt.get("exp_dir", "exps/tmp")
    os.makedirs(exp_dir, exist_ok=True)

    train_g, val_g, test_g, n_tasks, task = (
        datasets if datasets is not None else load_datasets(opt))
    if not quiet:
        print(f"datasets: train={len(train_g)} val={len(val_g)} test={len(test_g)} "
              f"tasks={n_tasks} type={task}")

    ft = opt.finetune
    bs = int(ft.get("batch_size", 16))

    # distributed mode: none (single chip) | ep (edge-partitioned over a
    # mesh, dist/edge_partition.py — the SURVEY §5.7 scale-out mode)
    dist = opt.get("dist", None)
    dist_mode = dist.get("mode", "none") if dist else "none"
    # fast-path policy (train/fastpath.py): TCSR tile metadata for the fused
    # Pallas kernel + bf16 compute on TPU by default, HBM dataset caching
    # when the padded set fits — the bench-grade path as the product path.
    from fragnet_tpu.train import fastpath

    fp = fastpath.resolve(ft, model_version=opt.get("model_version", "gat2"),
                          dist_mode=dist_mode)
    if not quiet:
        print(f"fastpath: tcsr={fp.tcsr} dtype={fp.dtype_name} "
              f"cache={fp.cache} backend={jax.default_backend()}")
    mesh = None
    if dist_mode == "ep":
        from fragnet_tpu.dist.data_parallel import make_mesh

        n_dev = int(dist.get("n_devices", 0)) or len(jax.devices())
        mesh = make_mesh(n_dev, axis="ep")
        # fused EP kernel needs node counts % tn and edge counts % (S·te).
        # dist.tile sets both; dist.tile_tn / dist.tile_te override
        # individually (defaults = the measured v5e optimum, BASELINE.md)
        ep_tn = int(dist.get("tile_tn",
                             dist.get("tile", 128 if fp.on_tpu else 8)))
        ep_te = int(dist.get("tile_te",
                             dist.get("tile", 256 if fp.on_tpu else 8)))
        mult = max(ep_tn, ep_te) * n_dev if fp.tcsr else 8 * n_dev
        spec = spec_for(train_g + val_g + test_g, batch_size=bs,
                        multiple=mult)
    elif dist_mode == "dp":
        from fragnet_tpu.dist.data_parallel import (
            initialize_distributed, make_mesh)

        if dist.get("multihost", False):
            initialize_distributed()
        n_dev = int(dist.get("n_devices", 0)) or len(jax.devices())
        mesh = make_mesh(n_dev, axis="data")
        spec = spec_for(train_g + val_g + test_g, batch_size=bs)
    else:
        spec = spec_for(train_g + val_g + test_g, batch_size=bs,
                        tcsr=fp.tcsr)

    model = build_model(opt, n_classes=n_tasks, dtype=fp.dtype)

    n_buckets = int(ft.get("n_buckets", 1))
    if dist_mode == "dp":
        # DP: per-device micro-batches stacked on a leading device axis
        from fragnet_tpu.dist.data_parallel import DPBatchLoader

        n_dev = mesh.size
        train_loader = DPBatchLoader(train_g, bs, n_dev, spec, shuffle=True,
                                     seed=seed, n_tasks=n_tasks)
        val_loader = DPBatchLoader(val_g, bs, n_dev, spec, n_tasks=n_tasks)
        test_loader = DPBatchLoader(test_g, bs, n_dev, spec, n_tasks=n_tasks)
    elif n_buckets > 1 and dist_mode == "none":
        # size-bucketed padding (SURVEY §7 step 7): one PadSpec per size
        # quantile instead of one p95 spec for everything
        from fragnet_tpu.data.batcher import BucketedBatchLoader

        train_loader = BucketedBatchLoader(
            train_g, bs, n_buckets=n_buckets, shuffle=True, seed=seed,
            n_tasks=n_tasks, spec_kwargs={"tcsr": fp.tcsr})
        val_loader = BucketedBatchLoader(
            val_g, bs, n_buckets=n_buckets, n_tasks=n_tasks,
            on_oversize="error", spec_kwargs={"tcsr": fp.tcsr})
        test_loader = BucketedBatchLoader(
            test_g, bs, n_buckets=n_buckets, n_tasks=n_tasks,
            on_oversize="error", spec_kwargs={"tcsr": fp.tcsr})
    else:
        train_loader = BatchLoader(train_g, bs, spec=spec, shuffle=True,
                                   seed=seed, n_tasks=n_tasks)
        # eval loaders hard-fail on oversized molecules instead of silently
        # shrinking the reported metric's denominator
        val_loader = BatchLoader(val_g, bs, spec=spec, n_tasks=n_tasks,
                                 on_oversize="error")
        test_loader = BatchLoader(test_g, bs, spec=spec, n_tasks=n_tasks,
                                  on_oversize="error")
    if dist_mode == "ep" and fp.tcsr:
        # fused Pallas kernel on each shard's edge range
        # (dist/edge_partition.py:EPMetaLoader + pallas_gat_pass_ep)
        from fragnet_tpu.dist.edge_partition import (
            EPMetaLoader, pin_ep_widths)

        try:
            # ONE set of static widths across train/val/test — they share
            # the compiled EP step, so their metas must share a treedef
            ep_pins = pin_ep_widths(
                [train_loader, val_loader, test_loader], mesh.size,
                tn=ep_tn, te=ep_te)
            train_loader = EPMetaLoader(train_loader, mesh.size, tn=ep_tn,
                                        te=ep_te, pins=ep_pins)
            val_loader = EPMetaLoader(val_loader, mesh.size, tn=ep_tn,
                                      te=ep_te, pins=ep_pins)
            test_loader = EPMetaLoader(test_loader, mesh.size, tn=ep_tn,
                                       te=ep_te, pins=ep_pins)
            if not quiet:
                print(f"ep fused kernel active (tn={ep_tn} te={ep_te})")
        except ValueError as e:
            if not quiet:
                print(f"ep fused kernel off: {e}")
    if dist_mode == "none":
        # HBM-resident caching: after epoch 1 the input pipeline costs
        # nothing (DeviceCacheLoader; reshuffles batch ORDER per epoch)
        train_loader = fastpath.maybe_cache(
            train_loader, spec=getattr(train_loader, "spec", spec),
            n_tasks=n_tasks, policy=fp.cache, seed=seed)
        val_loader = fastpath.maybe_cache(
            val_loader, spec=getattr(val_loader, "spec", spec),
            n_tasks=n_tasks, policy=fp.cache, seed=seed + 1)
        test_loader = fastpath.maybe_cache(
            test_loader, spec=getattr(test_loader, "spec", spec),
            n_tasks=n_tasks, policy=fp.cache, seed=seed + 2)

    # init
    rng = jax.random.PRNGKey(seed)
    init_batch = next(iter(train_loader))
    if dist_mode == "dp":  # drop the leading device axis for shape tracing
        init_batch = jax.tree.map(
            lambda x: x[0] if x is not None else None, init_batch)
    params = model.init(rng, init_batch, deterministic=True)

    # pretrained encoder transfer (finetune_gat2.py:213-230)
    pt = opt.get("pretrain", None)
    if pt and pt.get("use", False) and pt.get("chk", None):
        from fragnet_tpu.model.pretrain import FragNetPreTrain

        m = ft.model
        pt_model = FragNetPreTrain(
            num_layer=m.get("num_layer", 4), num_heads=m.get("num_heads", 4),
            drop_ratio=m.get("drop_ratio", 0.15), emb_dim=m.get("emb_dim", 128),
            atom_features=opt.get("atom_features", 167),
            frag_features=opt.get("frag_features", 167),
            edge_features=opt.get("edge_features", 17),
            fedge_in=opt.get("fedge_in", 6),
            fbond_edge_in=opt.get("fbond_edge_in", 6),
        )
        pt_params = pt_model.init(jax.random.PRNGKey(0), init_batch,
                                  deterministic=True)
        pt_params = load_params(pt_params, pt.chk)
        params = transfer_pretrained_encoder(params, pt_params)
        if not quiet:
            print(f"loaded pretrained encoder from {pt.chk}")

    n_epochs = int(ft.get("n_epochs", 100))
    sched = None
    if ft.get("use_schedular", False):
        sched = make_schedule("linear", float(ft.get("lr", 1e-4)),
                              total_steps=n_epochs * max(1, len(train_loader)))
    tx = make_optimizer("adam", lr=float(ft.get("lr", 1e-4)), schedule=sched)
    state = TrainState.create(params, tx)

    if dist_mode == "ep":
        from fragnet_tpu.dist.edge_partition import (
            make_ep_eval_step,
            make_ep_train_step,
        )

        ep_model = build_model(opt, n_classes=n_tasks, ep_axis="ep")
        loss = "mse" if task == "regr" else "bce"
        trainer = TrainerFineTune(
            ep_model, tx, target_type=task,
            train_step=make_ep_train_step(ep_model, tx, mesh, init_batch,
                                          loss, axis="ep"),
            eval_step=make_ep_eval_step(ep_model, mesh, init_batch, loss,
                                        axis="ep"),
        )
        if not quiet:
            print(f"edge-partitioned training over {mesh.size} devices")
    elif dist_mode == "dp":
        from fragnet_tpu.dist.data_parallel import (
            make_dp_eval_step,
            make_dp_train_step,
        )

        loss = "mse" if task == "regr" else "bce"
        trainer = TrainerFineTune(
            model, tx, target_type=task,
            train_step=make_dp_train_step(model, tx, mesh, loss),
            eval_step=make_dp_eval_step(model, mesh, loss),
        )
        if not quiet:
            print(f"data-parallel training over {mesh.size} devices")
    elif ft.get("standardize", False) and task == "regr":
        # target standardization (reference finetune_norm.py:28-43)
        from fragnet_tpu.train.tasks import make_standardized_ft_steps

        ys = np.stack([np.asarray(g.y, np.float32).reshape(-1)[:n_tasks]
                       for g in train_g])
        y_mean, y_sdev = ys.mean(axis=0), ys.std(axis=0)
        tr_step, ev_step = make_standardized_ft_steps(model, tx, y_mean, y_sdev)
        trainer = TrainerFineTune(model, tx, target_type=task,
                                  train_step=tr_step, eval_step=ev_step)
        if not quiet:
            print(f"standardized targets: mean={y_mean} sdev={y_sdev}")
    else:
        trainer = TrainerFineTune(model, tx, target_type=task)
    ckpt_path = os.path.join(exp_dir, ft.get("chkpoint_name", "ft.ckpt"))
    es = EarlyStopping(patience=int(ft.get("es_patience", 100)),
                       path=ckpt_path, save_fn=save_params)

    # observability: JSONL/TensorBoard scalars (finetune_gat2.py:272-273)
    # + optional jax.profiler trace around the first profiled epoch
    from fragnet_tpu.obs import ScalarLogger, profile_trace

    logger = ScalarLogger(exp_dir)
    profile_dir = (os.path.join(exp_dir, "profile")
                   if ft.get("profile", False) else None)

    # throughput accounting: real message edges over all 4 levels × layers
    # (the bench.py metric) — logged per epoch so a CLI run reports the same
    # number BENCH_r*.json records
    epoch_edges = fastpath.epoch_message_edges(
        train_g, num_layer=int(ft.model.get("num_layer", 4)))

    rng = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    for epoch in range(n_epochs):
        rng, sub = jax.random.split(rng)
        te0 = time.perf_counter()
        with profile_trace(profile_dir if epoch == 1 else None):
            state, train_loss = trainer.train_epoch(state, train_loader, sub)
        edges_per_sec = epoch_edges / max(time.perf_counter() - te0, 1e-9)
        val_score = trainer.validate(state.params, val_loader)
        es(val_score, state.params)
        logger.log("train/loss", train_loss, epoch)
        logger.log("train/edges_per_sec", edges_per_sec, epoch)
        logger.log("val/score", val_score, epoch)
        if not quiet and (epoch % 10 == 0 or epoch == n_epochs - 1):
            print(f"epoch {epoch:4d} train_loss {train_loss:.5f} "
                  f"val {val_score:.5f} best {-(es.best_score or 0):.5f} "
                  f"{edges_per_sec / 1e6:.2f}M edges/s "
                  f"[{time.time() - t0:.1f}s]")
        if es.early_stop:
            if not quiet:
                print(f"early stop at epoch {epoch}")
            break

    best = es.best_params if es.best_params is not None else state.params
    score, y, p = trainer.test(best, test_loader)
    metric = "rmse" if task == "regr" else "roc_auc"
    value = float(np.sqrt(score)) if task == "regr" else -score
    logger.log(f"test/{metric}", value, n_epochs)
    logger.close()
    if not quiet:
        print(f"test {metric}: {value:.5f}")
    with open(os.path.join(exp_dir, f"preds_seed_{seed}.pkl"), "wb") as f:
        pickle.dump({"y": y, "pred": p, metric: value}, f)
    return value, best


def main():
    from fragnet_tpu.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("overrides", nargs="*", help="dotted.key=value overrides")
    args = ap.parse_args()
    opt = load_config(args.config)
    for ov in args.overrides:
        k, v = ov.split("=", 1)
        try:
            import ast

            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        opt.set_path(k, v)
    run_finetune(opt)


if __name__ == "__main__":
    main()
