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


def build_shared_multitask(n: int, seed: int = 11, n_tasks: int = 4,
                           missing_frac: float = 0.15):
    """Tox21-style multitask classification set: 4 binary tasks with −1
    missing labels (the loader_molebert convention — {0,1}, −1 = missing).
    Task 0 is the generator's label; tasks 1-3 threshold structural
    properties (median atom / fragment / bond-graph-edge counts) so every
    task carries a learnable, partially-correlated signal."""
    train_g, val_g, test_g = build_shared("clsf", n, seed)
    allg = train_g + val_g + test_g
    med_a = np.median([g.n_atoms for g in allg])
    med_f = np.median([g.n_frags for g in allg])
    med_b = np.median([g.n_bg_edges for g in allg])
    rng = np.random.default_rng(seed + 1)
    for g in allg:
        y = np.array([
            float(np.asarray(g.y).reshape(-1)[0]),
            float(g.n_atoms > med_a),
            float(g.n_frags > med_f),
            float(g.n_bg_edges > med_b),
        ], np.float32)
        miss = rng.random(n_tasks) < missing_frac
        miss[0] = False  # keep the primary task fully labeled
        g.y = np.where(miss, -1.0, y).astype(np.float32)
    return train_g, val_g, test_g


def build_pretrain_graphs(n: int, seed: int = 23):
    """Shared 3D-geometry pretraining set (bond lengths / angles /
    dihedrals / MMFF-style energy targets — reference pretrain_gat2.py)."""
    from fragnet_tpu.data.datasets import PretrainData
    from fragnet_tpu.data.synthetic import synthetic_dataset

    df = synthetic_dataset(n=n, task="regression", seed=seed)
    maker = PretrainData(data_type="exp1s", num_conf=1)
    return maker.get_pt_dataset(list(df["smiles"]), seed=seed)


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


def pretrain_reference(pt_graphs, seed, n_epochs, lr=1e-4, batch=32,
                       quiet=True):
    """Reference 3D pretraining (pretrain_gat2.py + pretrain_utils.Trainer)
    with its EXACT loss semantics — incl. the loss_lngth overwrite quirk
    (pretrain_utils.py:22-26: total = angle + 2·dihedral + energy) and the
    (E,1)-vs-(E,) dihedral broadcast. Returns the encoder state_dict."""
    import torch

    from fragnet_tpu.parity import load_reference_module, reference_batch

    _install_rdkit_stub()
    heads = load_reference_module("fragnet.model.gat.gat2_pretrain")
    torch.manual_seed(seed)
    np.random.seed(seed)
    model = heads.FragNetPreTrain(
        num_layer=MODEL_KW["num_layer"], drop_ratio=0.15,
        num_heads=MODEL_KW["num_heads"], emb_dim=MODEL_KW["emb_dim"],
        atom_features=pt_graphs[0].x_atoms.shape[1], frag_features=167,
        edge_features=17)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    mse = torch.nn.MSELoss()
    rng = np.random.default_rng(seed)
    model.train()
    for epoch in range(n_epochs):
        order = rng.permutation(len(pt_graphs))
        for i in range(0, len(order), batch):
            b = reference_batch([pt_graphs[j] for j in order[i:i + batch]],
                                n_tasks=1, with_targets=True)
            opt.zero_grad()
            bl, ba, da, gr = model(b)
            # pretrain_utils.py:22-26 verbatim semantics
            loss_lngth = mse(da, b["dh_angl"])
            loss_angle = mse(ba, b["bnd_angl"])
            loss = loss_lngth + loss_angle + loss_lngth \
                + mse(gr.view(-1), b["y"].view(-1))
            loss.backward()
            opt.step()
        if not quiet and epoch % 5 == 0:
            print(f"  [ref pt seed {seed}] epoch {epoch} loss "
                  f"{float(loss):.4f}", flush=True)
    return {k: v.detach().clone()
            for k, v in model.pretrain.state_dict().items()}


def train_reference(train_g, val_g, test_g, seed, task, n_epochs, patience,
                    quiet=True, n_tasks=1, pt_state=None):
    import torch

    from fragnet_tpu.parity import load_reference_module

    _install_rdkit_stub()

    gat2 = load_reference_module("fragnet.model.gat.gat2")
    utils = load_reference_module("fragnet.train.utils")

    torch.manual_seed(seed)
    np.random.seed(seed)
    kw = dict(MODEL_KW)
    kw["n_classes"] = n_tasks
    model = gat2.FragNetFineTune(
        atom_features=train_g[0].x_atoms.shape[1], frag_features=167,
        edge_features=17, **kw)
    if pt_state is not None:
        # pretrained-encoder transfer (finetune_gat2.py:229)
        model.pretrain.load_state_dict(pt_state)
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

def pretrain_ours(pt_graphs, seed, n_epochs, exp_dir, lr=1e-4, batch=32,
                  quiet=True):
    """fragnet_tpu 3D pretraining with compat_loss_overwrite=True so both
    sides optimize the IDENTICAL objective (incl. the reference's loss
    quirk). Returns a checkpoint path for run_finetune's transfer config."""
    import jax

    from fragnet_tpu.data.batcher import BatchLoader
    from fragnet_tpu.graphs.hiergraph import spec_for
    from fragnet_tpu.model.pretrain import FragNetPreTrain
    from fragnet_tpu.train.checkpoint import save_params
    from fragnet_tpu.train.loop import TrainState
    from fragnet_tpu.train.optim import make_optimizer
    from fragnet_tpu.train.pretrain import PretrainTrainer

    os.makedirs(exp_dir, exist_ok=True)
    model = FragNetPreTrain(
        num_layer=MODEL_KW["num_layer"], num_heads=MODEL_KW["num_heads"],
        drop_ratio=0.15, emb_dim=MODEL_KW["emb_dim"],
        atom_features=pt_graphs[0].x_atoms.shape[1])
    spec = spec_for(pt_graphs, batch_size=batch)
    loader = BatchLoader(pt_graphs, batch, spec=spec, shuffle=True,
                         seed=seed, with_targets=True)
    params = model.init(jax.random.PRNGKey(seed),
                        next(iter(loader)), deterministic=True)
    tx = make_optimizer("adam", lr=lr)
    state = TrainState.create(params, tx)
    trainer = PretrainTrainer(model, tx, compat_loss_overwrite=True)
    rng = jax.random.PRNGKey(seed + 1)
    for epoch in range(n_epochs):
        import jax.random as jr

        rng, sub = jr.split(rng)
        state, loss = trainer.train_epoch(state, loader, sub)
        if not quiet and epoch % 5 == 0:
            print(f"  [ours pt seed {seed}] epoch {epoch} loss {loss:.4f}",
                  flush=True)
    ckpt = os.path.join(exp_dir, "pt.ckpt")
    save_params(state.params, ckpt)
    return ckpt


def train_ours(train_g, val_g, test_g, seed, task, n_epochs, patience,
               exp_dir, n_tasks=1, pt_chk=None):
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
            "n_classes": n_tasks,
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
    if pt_chk:
        opt.set_path("pretrain.use", True)
        opt.set_path("pretrain.chk", pt_chk)
    value, _ = run_finetune(
        opt, quiet=True,
        datasets=(train_g, val_g, test_g, n_tasks,
                  "regr" if task == "regr" else "clsf"))
    return float(value)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=240)
    ap.add_argument("--epochs", type=int, default=N_EPOCHS)
    ap.add_argument("--patience", type=int, default=PATIENCE)
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--task", default="both",
                    choices=["regr", "clsf", "multitask", "transfer",
                             "both", "all"])
    ap.add_argument("--n-pt", type=int, default=160,
                    help="pretraining molecules (transfer task)")
    ap.add_argument("--pt-epochs", type=int, default=25)
    ap.add_argument("--out", default="ABRESULTS.json")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    tasks = {"both": ["regr", "clsf"],
             "all": ["regr", "clsf", "multitask", "transfer"]}.get(
        args.task, [args.task])

    results = {"config": {"n": args.n, "epochs": args.epochs,
                          "patience": args.patience, "batch": BATCH,
                          "lr": LR, "model": MODEL_KW,
                          "n_pt": args.n_pt, "pt_epochs": args.pt_epochs,
                          "recipe": "exps/ft/esol/e1pt4.yaml (from scratch)"},
               "tasks": {}}
    if os.path.exists(args.out):  # extend an existing results file
        try:
            with open(args.out) as f:
                prev = json.load(f)
            results["tasks"].update(prev.get("tasks", {}))
        except Exception:
            pass

    for task in tasks:
        print(f"=== task {task} ===", flush=True)
        t0 = time.time()
        if task == "multitask":
            train_g, val_g, test_g = build_shared_multitask(args.n)
            inner_task, n_tasks = "clsf", 4
        else:
            inner_task, n_tasks = (task, 1) if task != "transfer" \
                else ("regr", 1)
            train_g, val_g, test_g = build_shared(inner_task, args.n)
        print(f"graphs: {len(train_g)}/{len(val_g)}/{len(test_g)} "
              f"(featurized in {time.time()-t0:.0f}s)", flush=True)

        if task == "transfer":
            # pretrain -> transfer -> finetune, A/B'd against from-scratch
            # on both sides (reference finetune_gat2.py:213-230 +
            # pretrain_gat2.py; identical objective incl. the loss quirk)
            pt_graphs = build_pretrain_graphs(args.n_pt)
            print(f"pretrain graphs: {len(pt_graphs)}", flush=True)
            rows = {"reference_scratch": [], "reference_transfer": [],
                    "fragnet_tpu_scratch": [], "fragnet_tpu_transfer": []}
            for seed in seeds:
                t0 = time.time()
                pt_state = pretrain_reference(pt_graphs, seed,
                                              args.pt_epochs, quiet=False)
                r_scr = train_reference(train_g, val_g, test_g, seed,
                                        "regr", args.epochs, args.patience)
                r_tr = train_reference(train_g, val_g, test_g, seed, "regr",
                                       args.epochs, args.patience,
                                       pt_state=pt_state)
                print(f"reference seed {seed}: scratch {r_scr:.5f} "
                      f"transfer {r_tr:.5f} [{time.time()-t0:.0f}s]",
                      flush=True)
                t0 = time.time()
                chk = pretrain_ours(pt_graphs, seed, args.pt_epochs,
                                    exp_dir=f"/tmp/ab_pt_{seed}",
                                    quiet=False)
                o_scr = train_ours(train_g, val_g, test_g, seed, "regr",
                                   args.epochs, args.patience,
                                   exp_dir=f"/tmp/ab_tr_scr_{seed}")
                o_tr = train_ours(train_g, val_g, test_g, seed, "regr",
                                  args.epochs, args.patience,
                                  exp_dir=f"/tmp/ab_tr_{seed}", pt_chk=chk)
                print(f"fragnet_tpu seed {seed}: scratch {o_scr:.5f} "
                      f"transfer {o_tr:.5f} [{time.time()-t0:.0f}s]",
                      flush=True)
                rows["reference_scratch"].append(r_scr)
                rows["reference_transfer"].append(r_tr)
                rows["fragnet_tpu_scratch"].append(o_scr)
                rows["fragnet_tpu_transfer"].append(o_tr)
            results["tasks"]["transfer"] = {
                "metric": "test_rmse (scratch vs pretrain->transfer)",
                **rows,
                **{k + "_mean": float(np.mean(v)) for k, v in rows.items()},
            }
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
            continue

        ref_scores, our_scores = [], []
        for seed in seeds:
            t0 = time.time()
            r = train_reference(train_g, val_g, test_g, seed, inner_task,
                                args.epochs, args.patience, quiet=False,
                                n_tasks=n_tasks)
            print(f"reference seed {seed}: {r:.5f} [{time.time()-t0:.0f}s]",
                  flush=True)
            ref_scores.append(r)
            t0 = time.time()
            o = train_ours(train_g, val_g, test_g, seed, inner_task,
                           args.epochs, args.patience,
                           exp_dir=f"/tmp/ab_{task}_{seed}", n_tasks=n_tasks)
            print(f"fragnet_tpu seed {seed}: {o:.5f} [{time.time()-t0:.0f}s]",
                  flush=True)
            our_scores.append(o)
        metric = {"regr": "test_rmse", "clsf": "test_roc_auc",
                  "multitask": "test_mean_per_task_roc_auc"}[task]
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
