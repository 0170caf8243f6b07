"""Worked end-to-end example — the analog of the reference's demo notebook
(fragnet/notebooks/FragNet.ipynb, 47 cells: install -> load -> predict ->
all four interpretability outputs; also vizualize/app.py:187-297).

One command runs the full loop on a real molecule:

    python examples/demo.py --out /tmp/fragnet_demo

Steps (each printed as it runs):
  1. build a small ESOL-style dataset (synthetic SMILES + solubility-like
     targets — this environment has no network; point --csv at a real
     ESOL csv to use measured data)
  2. finetune FragNet for a few epochs (full production path: scaffold
     split, early stopping, checkpoint)
  3. featurize the demo molecule (ibuprofen by default) and predict
  4. produce ALL FOUR interpretability levels — atom / bond / fragment /
     fragment-connection attention maps AND masking contributions — as a
     standalone HTML report plus stdout tables.

See examples/README.md for the narrated walkthrough.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/fragnet_demo")
    ap.add_argument("--smiles", default="CC(C)Cc1ccc(cc1)C(C)C(=O)O",
                    help="demo molecule (default: ibuprofen)")
    ap.add_argument("--csv", default=None,
                    help="optional real dataset csv (smiles,y columns)")
    ap.add_argument("--ckpt", default=None,
                    help="skip training and interpret with this checkpoint")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--n-synthetic", type=int, default=48)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from fragnet_tpu.config import load_config

    opt = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "ft", "esol.yaml"))
    opt.set_path("exp_dir", args.out)
    opt.set_path("finetune.n_epochs", args.epochs)
    opt.set_path("finetune.es_patience", max(2, args.epochs))
    if args.csv:
        opt.set_path("finetune.data.csv", args.csv)
    else:
        opt.set_path("finetune.data.n_synthetic", args.n_synthetic)

    ckpt = args.ckpt
    if ckpt is None:
        print(f"== 1-2/4 train a small FragNet ({args.epochs} epochs) ==")
        from fragnet_tpu.train.finetune import run_finetune

        rmse, ckpt = run_finetune(opt, quiet=False)
        print(f"test rmse: {rmse:.4f}  checkpoint: {ckpt}")
    else:
        print(f"== 1-2/4 using provided checkpoint: {ckpt} ==")

    print(f"== 3/4 featurize + predict {args.smiles} ==")
    import jax

    from fragnet_tpu.interp.attention import FragNetInterpreter
    from fragnet_tpu.train.checkpoint import load_params
    from fragnet_tpu.train.finetune import build_model

    model = build_model(opt, n_classes=1)
    interp = FragNetInterpreter(model, None)
    _, _, batch = interp.featurize(args.smiles)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    interp.params = load_params(params, ckpt)

    result = interp.interpret(args.smiles, with_contributions=True)
    print(f"prediction: {result.prediction:.4f}")

    print("== 4/4 all four interpretability levels ==")
    from fragnet_tpu.interp.render import render_report

    report = render_report(result, os.path.join(args.out, "report.html"))

    def table(name, weights, contribs):
        print(f"\n{name:^44}")
        print(f"{'idx':>4} {'attention':>10} {'contribution':>13}")
        for i, (w, c) in enumerate(zip(weights, contribs)):
            print(f"{i:>4} {w:>10.4f} {c:>+13.4f}")

    table("ATOMS", result.atom_weights, result.atom_contrib)
    table("BONDS", result.bond_weights, result.bond_contrib)
    table("FRAGMENTS", result.frag_weights, result.frag_contrib)
    table("FRAGMENT-CONNECTIONS", result.fconn_weights, result.fconn_contrib)
    print(f"\nHTML report (atom/bond/fragment/connection attention images, "
          f"contribution maps, per-level tables): {report}")


if __name__ == "__main__":
    main()
