"""Dataset-creation CLI — the analog of fragnet/data_create/
(create_pretrain_datasets.py: sharded creation in chunks with scratch/add
modes; create_finetune_datasets.py: router by dataset name).

Usage:
    # finetune data: registry dataset (CSV file or synthetic fallback)
    python -m fragnet_tpu.data.create finetune --dataset esol \
        [--csv path.csv] --out data/esol [--split scaffold]

    # pretrain data: SMILES csv (or synthetic), sharded pickles
    python -m fragnet_tpu.data.create pretrain [--csv smiles.csv] \
        --out data/pt --shard_size 1000 [--mode scratch|add] [--num_conf 1]

    # DTA / CDRP synthetic or CSV
    python -m fragnet_tpu.data.create dta  --out data/dta  [--csv davis.csv]
    python -m fragnet_tpu.data.create cdrp --out data/cdrp
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np
import pandas as pd


def create_finetune(args) -> None:
    from fragnet_tpu.data.datasets import FinetuneData, save_pickle_dataset
    from fragnet_tpu.data.moleculenet import (
        load_moleculenet,
        load_moleculenet_csv,
        target_columns,
    )
    from fragnet_tpu.data.splitters import random_split, scaffold_split

    if args.csv:
        df = load_moleculenet_csv(args.dataset, args.csv)
    else:
        df = load_moleculenet(args.dataset, data_dir=args.data_dir,
                              n_synthetic=args.n_synthetic, seed=args.seed)
        if df.attrs.get("synthetic"):
            print(f"[create] no CSV found — using synthetic stand-in "
                  f"({len(df)} molecules)")
    tcols = target_columns(df)
    smiles = list(df["smiles"])
    if args.split == "scaffold":
        tr, va, te = scaffold_split(smiles)
    else:
        tr, va, te = random_split(len(smiles), seed=args.seed)

    maker = FinetuneData(tcols if len(tcols) > 1 else tcols[0],
                         data_type=args.data_type, frag_type=args.frag_type)
    os.makedirs(args.out, exist_ok=True)
    for name, idx in (("train", tr), ("val", va), ("test", te)):
        part = df.iloc[idx].reset_index(drop=True)
        graphs = maker.get_ft_dataset(part, n_workers=args.workers)
        save_pickle_dataset(graphs, os.path.join(args.out, f"{name}.pkl"))
        print(f"[create] {name}: {len(graphs)} graphs "
              f"-> {args.out}/{name}.pkl")


def create_pretrain(args) -> None:
    """Sharded pretrain creation with scratch/add modes
    (create_pretrain_datasets.py:10-121)."""
    from fragnet_tpu.data.datasets import PretrainData, save_pickle_dataset

    if args.csv:
        df = pd.read_csv(args.csv)
        smiles = list(df["smiles"])
    else:
        from fragnet_tpu.data.synthetic import synthetic_dataset

        smiles = list(synthetic_dataset(n=args.n_synthetic,
                                        seed=args.seed)["smiles"])
        print(f"[create] synthetic pretrain SMILES: {len(smiles)}")

    os.makedirs(args.out, exist_ok=True)
    existing = sorted(glob.glob(os.path.join(args.out, "part_*.pkl")))
    start_shard = 0
    if args.mode == "add" and existing:
        start_shard = int(os.path.basename(existing[-1])[5:10]) + 1
        done = start_shard * args.shard_size
        smiles = smiles[done:]
        print(f"[create] add mode: resuming at shard {start_shard}")
    elif existing and args.mode == "scratch":
        for p in existing:
            os.remove(p)

    maker = PretrainData(data_type=args.data_type, frag_type=args.frag_type,
                         num_conf=args.num_conf)
    for k in range(0, len(smiles), args.shard_size):
        chunk = smiles[k : k + args.shard_size]
        graphs = maker.get_pt_dataset(chunk, seed=args.seed)
        shard = start_shard + k // args.shard_size
        path = os.path.join(args.out, f"part_{shard:05d}.pkl")
        save_pickle_dataset(graphs, path)
        print(f"[create] shard {shard}: {len(graphs)} graphs -> {path}")


def create_dta(args) -> None:
    from fragnet_tpu.data.datasets import save_pickle_dataset
    from fragnet_tpu.data.dta import build_dta_graphs, synthetic_dta_dataset

    if args.csv:
        df = pd.read_csv(args.csv)
    else:
        df = synthetic_dta_dataset(n=args.n_synthetic, seed=args.seed)
        print(f"[create] synthetic DTA pairs: {len(df)}")
    graphs = build_dta_graphs(df, data_type=args.data_type,
                              frag_type=args.frag_type, seed=args.seed)
    os.makedirs(args.out, exist_ok=True)
    save_pickle_dataset(graphs, os.path.join(args.out, "dta.pkl"))
    print(f"[create] {len(graphs)} graphs -> {args.out}/dta.pkl")


def create_cdrp(args) -> None:
    from fragnet_tpu.data.cdrp import build_cdrp_graphs, synthetic_cdrp_dataset
    from fragnet_tpu.data.datasets import save_pickle_dataset

    if args.csv and args.gene_csv:
        df = pd.read_csv(args.csv)
        gene_df = pd.read_csv(args.gene_csv, index_col=0)
    else:
        df, gene_df = synthetic_cdrp_dataset(n=args.n_synthetic, seed=args.seed)
        print(f"[create] synthetic CDRP pairs: {len(df)}")
    graphs = build_cdrp_graphs(df, gene_df, data_type=args.data_type,
                               frag_type=args.frag_type, seed=args.seed)
    os.makedirs(args.out, exist_ok=True)
    save_pickle_dataset(graphs, os.path.join(args.out, "cdrp.pkl"))
    print(f"[create] {len(graphs)} graphs -> {args.out}/cdrp.pkl")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--out", required=True)
    common.add_argument("--csv", default=None)
    common.add_argument("--data_type", default="exp1s")
    common.add_argument("--frag_type", default="brics")
    common.add_argument("--seed", type=int, default=42)
    common.add_argument("--n_synthetic", type=int, default=256)
    common.add_argument("--workers", type=int, default=0)

    ft = sub.add_parser("finetune", parents=[common])
    ft.add_argument("--dataset", required=True)
    ft.add_argument("--data_dir", default=None)
    ft.add_argument("--split", default="scaffold",
                    choices=["scaffold", "random"])
    ft.set_defaults(fn=create_finetune)

    pt = sub.add_parser("pretrain", parents=[common])
    pt.add_argument("--shard_size", type=int, default=1000)
    pt.add_argument("--mode", default="scratch", choices=["scratch", "add"])
    pt.add_argument("--num_conf", type=int, default=1)
    pt.set_defaults(fn=create_pretrain)

    dta = sub.add_parser("dta", parents=[common])
    dta.set_defaults(fn=create_dta)

    cdrp = sub.add_parser("cdrp", parents=[common])
    cdrp.add_argument("--gene_csv", default=None)
    cdrp.set_defaults(fn=create_cdrp)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
