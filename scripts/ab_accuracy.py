"""Measured accuracy baseline: the UNMODIFIED reference (CPU torch via
parity/torch_shim.py) vs fragnet_tpu, trained A/B on the SAME graphs, SAME
scaffold split, SAME recipe and seeds — SURVEY §6's explicit obligation
("the performance baseline for this project must be measured").

The reference repo publishes no numbers and RDKit is absent here, so both
sides consume the SAME featurized graphs (fragnet_tpu's builder, itself
pinned to RDKit ground truth in test_chem_rdkit_truth.py) built from the
synthetic MoleculeNet stand-ins; the reference model/trainer code paths are
fragnet/model/gat/gat2.py + fragnet/train/utils.py:307 (TrainerFineTune),
run unmodified. Recipe: the ESOL finetune config exps/ft/esol/e1pt4.yaml
(4 layers, emb 128, FTHead3 h1=128/h2=1024/h3=1024/h4=512, relu, drop 0.1,
batch 16, Adam lr 1e-4) — from scratch (no pretrain transfer on either
side). Classification pair: a BBBP-style binary task, masked-BCE training,
mean-per-task ROC-AUC (train/utils.py:412-429, 517-543).

Writes ABRESULTS.json; the table in BASELINE.md mirrors it.

Usage:  python scripts/ab_accuracy.py [--n 240] [--epochs 100]
        [--patience 20] [--seeds 0,1,2] [--task regr|clsf|both]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Accuracy is hardware-independent; run the jax side on CPU so the A/B does
# not contend for (or block on) the tunneled TPU. Must happen before first
# backend use; the env var alone is overridden by the pod's sitecustomize.
if os.environ.get("AB_BACKEND", "cpu") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

N_EPOCHS = 100
PATIENCE = 20
LR = 1e-4
BATCH = 16
MODEL_KW = dict(n_classes=1, num_layer=4, num_heads=4, drop_ratio=0.1,
                h1=128, h2=1024, h3=1024, h4=512, act="relu", emb_dim=128,
                fthead="FTHead3")


def build_shared(task: str, n: int, seed: int = 11):
    """One featurization, one scaffold split, shared by both frameworks."""
    from fragnet_tpu.data.datasets import build_graphs
    from fragnet_tpu.data.splitters import scaffold_split
    from fragnet_tpu.data.synthetic import synthetic_dataset

    df = synthetic_dataset(
        n=n, task="regression" if task == "regr" else "classification",
        seed=seed)
    smiles = list(df["smiles"])
    y = [[float(v)] for v in df["y"]]
    graphs = build_graphs(smiles, y)
    kept = [g.smiles for g in graphs]
    tr, va, te = scaffold_split(kept)
    return ([graphs[i] for i in tr], [graphs[i] for i in va],
            [graphs[i] for i in te])


# ---------------------------------------------------------------------------
# reference side (CPU torch, unmodified fragnet code)
# ---------------------------------------------------------------------------

def _ref_loaders(graphs, batch_size, n_tasks):
    """Materialized reference-format batches (parity/refbatch.py converts a
    window of graphs into the dict the reference model consumes)."""
    from fragnet_tpu.parity import reference_batch

    out = []
    for i in range(0, len(graphs), batch_size):
        out.append(reference_batch(graphs[i:i + batch_size],
                                   n_tasks=n_tasks))
    return out


def _install_rdkit_stub():
    """fragnet/train/utils.py:4 imports rdkit at module scope but
    TrainerFineTune never touches it; satisfy the import on RDKit-less
    hosts with a stub whose attributes fail loudly if ever used."""
    import types

    if "rdkit" in sys.modules:
        return
    try:
        import rdkit  # noqa: F401
        return
    except ImportError:
        pass

    class _Poison:
        def __getattr__(self, name):
            raise RuntimeError(
                "rdkit stub: the reference code path actually used "
                f"rdkit.Chem.{name} — this A/B requires real RDKit")

    rd = types.ModuleType("rdkit")
    rd.Chem = _Poison()
    sys.modules["rdkit"] = rd
    chem = types.ModuleType("rdkit.Chem")
    sys.modules["rdkit.Chem"] = chem


def train_reference(train_g, val_g, test_g, seed, task, n_epochs, patience,
                    quiet=True):
    import torch

    from fragnet_tpu.parity import load_reference_module

    _install_rdkit_stub()

    gat2 = load_reference_module("fragnet.model.gat.gat2")
    utils = load_reference_module("fragnet.train.utils")

    torch.manual_seed(seed)
    np.random.seed(seed)
    n_tasks = 1
    kw = dict(MODEL_KW)
    model = gat2.FragNetFineTune(
        atom_features=train_g[0].x_atoms.shape[1], frag_features=167,
        edge_features=17, **kw)
    trainer = utils.TrainerFineTune(
        target_type="regr" if task == "regr" else "clsf")
    opt = torch.optim.Adam(model.parameters(), lr=LR)

    val_b = _ref_loaders(val_g, BATCH, n_tasks)
    test_b = _ref_loaders(test_g, BATCH, n_tasks)
    rng = np.random.default_rng(seed)

    best_val, best_state, bad = np.inf, None, 0
    t0 = time.time()
    for epoch in range(n_epochs):
        order = rng.permutation(len(train_g))
        train_b = _ref_loaders([train_g[i] for i in order], BATCH, n_tasks)
        model.train()
        for batch in train_b:
            opt.zero_grad()
            out = model(batch)
            y = batch["y"]
            if task == "regr":
                loss = torch.nn.functional.mse_loss(out.view(-1), y.view(-1))
            else:
                loss = utils.compute_bce_loss(out, y.view(out.shape))
            loss.backward()
            opt.step()
        # val score with the SAME metric the early stop uses on our side —
        # trainer.test already returns a minimize-me value for both tasks
        # (regr → mse; clsf → −roc_auc, utils.py:544)
        val, *_ = trainer.test(model=model, loader=val_b, device="cpu")
        if val < best_val - 1e-12:
            best_val, bad = val, 0
            best_state = copy.deepcopy(model.state_dict())
        else:
            bad += 1
        if not quiet and epoch % 10 == 0:
            print(f"  [ref seed {seed}] epoch {epoch} val {val:.5f} "
                  f"best {best_val:.5f} [{time.time()-t0:.0f}s]")
        if bad >= patience:
            break
    if best_state is not None:
        model.load_state_dict(best_state)
    score, *_ = trainer.test(model=model, loader=test_b, device="cpu")
    # regr: mse → rmse; clsf: −roc_auc → roc_auc
    return float(np.sqrt(score)) if task == "regr" else float(-score)


# ---------------------------------------------------------------------------
# fragnet_tpu side
# ---------------------------------------------------------------------------

def train_ours(train_g, val_g, test_g, seed, task, n_epochs, patience,
               exp_dir):
    from fragnet_tpu.config import Config
    from fragnet_tpu.train.finetune import run_finetune

    kw = MODEL_KW
    opt = Config({
        "seed": seed,
        "exp_dir": exp_dir,
        "model_version": "gat2",
        "atom_features": train_g[0].x_atoms.shape[1],
        "frag_features": 167,
        "edge_features": 17,
        "finetune": {
            "target_type": "regr" if task == "regr" else "clsf",
            "n_classes": 1,
            "batch_size": BATCH,
            "lr": LR,
            "n_epochs": n_epochs,
            "es_patience": patience,
            "loss": "mse" if task == "regr" else "bce",
            "use_schedular": False,
            "model": {
                "num_layer": kw["num_layer"], "num_heads": kw["num_heads"],
                "drop_ratio": kw["drop_ratio"], "emb_dim": kw["emb_dim"],
                "h1": kw["h1"], "h2": kw["h2"], "h3": kw["h3"],
                "h4": kw["h4"], "act": kw["act"], "fthead": kw["fthead"],
            },
        },
    })
    value, _ = run_finetune(
        opt, quiet=True,
        datasets=(train_g, val_g, test_g, 1,
                  "regr" if task == "regr" else "clsf"))
    return float(value)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=240)
    ap.add_argument("--epochs", type=int, default=N_EPOCHS)
    ap.add_argument("--patience", type=int, default=PATIENCE)
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--task", default="both", choices=["regr", "clsf", "both"])
    ap.add_argument("--out", default="ABRESULTS.json")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    tasks = ["regr", "clsf"] if args.task == "both" else [args.task]

    results = {"config": {"n": args.n, "epochs": args.epochs,
                          "patience": args.patience, "batch": BATCH,
                          "lr": LR, "model": MODEL_KW,
                          "recipe": "exps/ft/esol/e1pt4.yaml (from scratch)"},
               "tasks": {}}
    for task in tasks:
        print(f"=== task {task} ===", flush=True)
        t0 = time.time()
        train_g, val_g, test_g = build_shared(task, args.n)
        print(f"graphs: {len(train_g)}/{len(val_g)}/{len(test_g)} "
              f"(featurized in {time.time()-t0:.0f}s)", flush=True)
        ref_scores, our_scores = [], []
        for seed in seeds:
            t0 = time.time()
            r = train_reference(train_g, val_g, test_g, seed, task,
                                args.epochs, args.patience, quiet=False)
            print(f"reference seed {seed}: {r:.5f} [{time.time()-t0:.0f}s]",
                  flush=True)
            ref_scores.append(r)
            t0 = time.time()
            o = train_ours(train_g, val_g, test_g, seed, task, args.epochs,
                           args.patience, exp_dir=f"/tmp/ab_{task}_{seed}")
            print(f"fragnet_tpu seed {seed}: {o:.5f} [{time.time()-t0:.0f}s]",
                  flush=True)
            our_scores.append(o)
        metric = "test_rmse" if task == "regr" else "test_roc_auc"
        results["tasks"][task] = {
            "metric": metric,
            "reference": ref_scores,
            "fragnet_tpu": our_scores,
            "reference_mean": float(np.mean(ref_scores)),
            "fragnet_tpu_mean": float(np.mean(our_scores)),
        }
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results["tasks"], indent=1))


if __name__ == "__main__":
    main()
