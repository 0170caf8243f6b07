"""DTA / CDRP training: label-standardized trainers + CLI entries.

Reference: fragnet/train/finetune/finetune_dta.py, finetune_cdrp.py,
trainer_dta.py:33-91 (labels standardized with train mean/sdev during
training, destandardized for eval metrics), trainer_cdrp.py.

Usage:
    python -m fragnet_tpu.train.tasks --task dta  [--config cfg.yaml] [k=v..]
    python -m fragnet_tpu.train.tasks --task cdrp [--config cfg.yaml] [k=v..]
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Callable, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fragnet_tpu.train.loop import TrainState


def make_standardized_steps(model, tx, label_mean: float, label_sdev: float):
    """Train/eval steps with (y − mean)/(sdev + 1e-5) standardization
    (trainer_dta.py:33-91)."""
    mean = jnp.float32(label_mean)
    sdev = jnp.float32(label_sdev) + 1e-5

    from functools import partial

    @partial(jax.jit, donate_argnums=0)
    def train_step(state: TrainState, batch, base_rng):
        rng = jax.random.fold_in(base_rng, state.step)

        def loss(params):
            out = model.apply(params, batch, deterministic=False,
                              rngs={"dropout": rng})[:, 0]
            y = (batch.y[:, 0] - mean) / sdev
            m = batch.graph_mask
            return jnp.sum((out - y) ** 2 * m) / jnp.maximum(jnp.sum(m), 1.0)

        l, grads = jax.value_and_grad(loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), l

    @jax.jit
    def predict(params, batch):
        out = model.apply(params, batch, deterministic=True)[:, 0]
        return out * sdev + mean  # destandardize

    return train_step, predict


def make_standardized_ft_steps(model, tx, label_mean: float,
                               label_sdev: float):
    """Standardized steps in the TrainerFineTune step contract
    (loop.py:64-107): train on (y−mean)/sdev, evaluate in raw label space —
    the reference's finetune_norm.py:28-43 flow. Multi-task: per-task
    mean/sdev vectors broadcast over the task axis."""
    mean = jnp.asarray(label_mean, jnp.float32)
    sdev = jnp.asarray(label_sdev, jnp.float32) + 1e-5

    from functools import partial

    @partial(jax.jit, donate_argnums=0)
    def train_step(state: TrainState, batch, base_rng):
        rng = jax.random.fold_in(base_rng, state.step)

        def loss(params):
            out = model.apply(params, batch, deterministic=False,
                              rngs={"dropout": rng})
            y = (batch.y - mean) / sdev
            m = batch.graph_mask[:, None]
            return jnp.sum((out - y) ** 2 * m) / jnp.maximum(
                jnp.sum(m) * y.shape[-1], 1.0)

        l, grads = jax.value_and_grad(loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), l

    @jax.jit
    def eval_step(params, batch):
        out = model.apply(params, batch, deterministic=True)
        out = out * sdev + mean  # raw label space
        m = batch.graph_mask[:, None]
        l = jnp.sum((out - batch.y) ** 2 * m) / jnp.maximum(
            jnp.sum(m) * batch.y.shape[-1], 1.0)
        return l, out

    return train_step, eval_step


class TrainerTask:
    """Epoch driver for DTA/CDRP regression with standardization."""

    def __init__(self, model, tx, label_mean: float, label_sdev: float):
        self.model = model
        self.tx = tx
        self.label_mean = label_mean
        self.label_sdev = label_sdev
        self._step, self._predict = make_standardized_steps(
            model, tx, label_mean, label_sdev
        )

    def train_epoch(self, state, batches: Iterable, rng):
        n = 0
        losses = []
        it = batches.prefetch() if hasattr(batches, "prefetch") else batches
        for batch in it:
            state, l = self._step(state, batch, rng)
            losses.append(l)
            n += 1
        return state, sum(float(l) for l in losses) / max(n, 1)

    def evaluate(self, params, batches: Iterable) -> Tuple[float, np.ndarray, np.ndarray]:
        ys, ps = [], []
        for batch in batches:
            pred = self._predict(params, batch)
            m = np.asarray(batch.graph_mask) > 0
            ys.append(np.asarray(batch.y)[:, 0][m])
            ps.append(np.asarray(pred)[m])
        y = np.concatenate(ys)
        p = np.concatenate(ps)
        return float(np.mean((y - p) ** 2)), y, p


def run_task(task: str, opt, quiet: bool = False):
    from fragnet_tpu.data.batcher import BatchLoader
    from fragnet_tpu.data.splitters import random_split
    from fragnet_tpu.graphs.hiergraph import spec_for
    from fragnet_tpu.train.checkpoint import save_params
    from fragnet_tpu.train.earlystop import EarlyStopping
    from fragnet_tpu.train.optim import make_optimizer

    seed = int(opt.get("seed", 42))
    exp_dir = opt.get("exp_dir", f"exps/{task}")
    os.makedirs(exp_dir, exist_ok=True)
    ft = opt.finetune

    if task == "dta":
        from fragnet_tpu.data.dta import build_dta_graphs, synthetic_dta_dataset
        from fragnet_tpu.model.dta import DTAModel

        data_path = ft.get("data", {}).get("path", None) if "data" in ft else None
        if data_path:
            import pandas as pd

            df = pd.read_csv(data_path)
        else:
            df = synthetic_dta_dataset(
                n=int(ft.get("data", {}).get("n_synthetic", 96)), seed=seed
            )
        graphs = build_dta_graphs(df, seed=seed)
        model = DTAModel(
            num_layer=int(ft.model.get("num_layer", 4)),
            num_heads=int(ft.model.get("num_heads", 4)),
            drop_ratio=float(ft.model.get("drop_ratio", 0.15)),
            emb_dim=int(ft.model.get("emb_dim", 128)),
            protein_encoder=ft.model.get("protein_encoder", "transformer"),
        )
    elif task == "cdrp":
        from fragnet_tpu.data.cdrp import build_cdrp_graphs, synthetic_cdrp_dataset
        from fragnet_tpu.model.cdrp import CDRPModel

        df, gene_df = synthetic_cdrp_dataset(
            n=int(ft.get("data", {}).get("n_synthetic", 96)), seed=seed
        )
        graphs = build_cdrp_graphs(df, gene_df, seed=seed)
        model = CDRPModel(
            num_layer=int(ft.model.get("num_layer", 4)),
            num_heads=int(ft.model.get("num_heads", 4)),
            drop_ratio=float(ft.model.get("drop_ratio", 0.15)),
            emb_dim=int(ft.model.get("emb_dim", 128)),
            gene_dim=gene_df.shape[1],
        )
    else:
        raise ValueError(f"unknown task {task!r}")

    if not quiet:
        print(f"{task}: {len(graphs)} graphs")
    tr, va, te = random_split(len(graphs), seed=seed)
    train_g = [graphs[i] for i in tr]
    val_g = [graphs[i] for i in va]
    test_g = [graphs[i] for i in te]

    ys = np.array([g.y[0] for g in train_g])
    label_mean, label_sdev = float(ys.mean()), float(ys.std())

    # fast path: the DTA/CDRP drug encoder is the gat2 FragNet core, so the
    # TCSR/Pallas path and HBM caching apply here too (fastpath.py)
    from fragnet_tpu.train import fastpath

    fp = fastpath.resolve(ft, model_version="gat2")
    bs = int(ft.get("batch_size", 16))
    spec = spec_for(graphs, batch_size=bs, tcsr=fp.tcsr)
    train_loader = BatchLoader(train_g, bs, spec=spec, shuffle=True, seed=seed)
    val_loader = BatchLoader(val_g, bs, spec=spec)
    test_loader = BatchLoader(test_g, bs, spec=spec)
    train_loader = fastpath.maybe_cache(train_loader, spec=spec,
                                        policy=fp.cache, seed=seed)
    val_loader = fastpath.maybe_cache(val_loader, spec=spec,
                                      policy=fp.cache, seed=seed + 1)
    test_loader = fastpath.maybe_cache(test_loader, spec=spec,
                                       policy=fp.cache, seed=seed + 2)

    rng = jax.random.PRNGKey(seed)
    init_batch = next(iter(train_loader))
    params = model.init(rng, init_batch, deterministic=True)
    tx = make_optimizer("adam", lr=float(ft.get("lr", 1e-4)))
    state = TrainState.create(params, tx)
    trainer = TrainerTask(model, tx, label_mean, label_sdev)

    es = EarlyStopping(patience=int(ft.get("es_patience", 50)),
                       path=os.path.join(exp_dir, f"{task}.ckpt"),
                       save_fn=save_params)
    rng = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    for epoch in range(int(ft.get("n_epochs", 50))):
        rng, sub = jax.random.split(rng)
        state, train_loss = trainer.train_epoch(state, train_loader, sub)
        val_mse, _, _ = trainer.evaluate(state.params, val_loader)
        es(val_mse, state.params)
        if not quiet and epoch % 5 == 0:
            print(f"epoch {epoch:4d} train {train_loss:.5f} "
                  f"val_mse {val_mse:.5f} [{time.time() - t0:.1f}s]")
        if es.early_stop:
            break

    best = es.best_params if es.best_params is not None else state.params
    mse, y, p = trainer.evaluate(best, test_loader)
    if not quiet:
        print(f"test rmse: {np.sqrt(mse):.5f}")
    return float(np.sqrt(mse)), best


def main():
    from fragnet_tpu.config import Config, load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True, choices=["dta", "cdrp"])
    ap.add_argument("--config", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    if args.config:
        opt = load_config(args.config)
    else:
        opt = Config({
            "seed": 42,
            "exp_dir": f"exps/{args.task}",
            "finetune": {"model": {"num_layer": 2, "emb_dim": 64},
                         "batch_size": 16, "lr": 1e-4, "n_epochs": 20,
                         "es_patience": 20},
        })
    for ov in args.overrides:
        k, v = ov.split("=", 1)
        try:
            import ast

            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        opt.set_path(k, v)
    run_task(args.task, opt)


if __name__ == "__main__":
    main()
