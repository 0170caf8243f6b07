#!/usr/bin/env bash
# Install smoke test — analog of the reference install_cpu.sh:8-16, which
# runs the full ESOL data-creation pipeline end-to-end after install.
# Exercises: dataset creation (CSV-or-synthetic) -> featurization -> split ->
# pickles -> finetune for 2 epochs -> checkpoint + predictions.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT="${SMOKE_OUT:-/tmp/fragnet_smoke}"
rm -rf "$OUT"
mkdir -p "$OUT"

echo "== 1/4 dataset creation (esol) =="
python -m fragnet_tpu.data.create finetune --dataset esol \
    --out "$OUT/esol" --n_synthetic 32 --split scaffold

echo "== 2/4 finetune (2 epochs) =="
python -m fragnet_tpu.train.finetune --config configs/ft/esol.yaml \
    finetune.train.path="$OUT/esol/train.pkl" \
    finetune.val.path="$OUT/esol/val.pkl" \
    finetune.test.path="$OUT/esol/test.pkl" \
    finetune.n_epochs=2 finetune.es_patience=5 \
    exp_dir="$OUT/exp"

echo "== 3/4 artifacts =="
test -f "$OUT/exp/ft.ckpt"
test -f "$OUT/exp/preds_seed_42.pkl"
test -f "$OUT/exp/scalars.jsonl"

echo "== 4/4 worked example (interpretability report) =="
python examples/demo.py --out "$OUT/demo" --ckpt "$OUT/exp/ft.ckpt" \
    --smiles "CC(C)Cc1ccc(cc1)C(C)C(=O)O" > "$OUT/demo_stdout.txt"
test -f "$OUT/demo/report.html"
for section in "atom table" "bond table" "fragment table" "fragment-connection table" "atoms (attention)" "bonds (attention)" "fragments (attention)" "connections (attention)"; do
    grep -q "$section" "$OUT/demo/report.html" || { echo "missing: $section"; exit 1; }
done
grep -q "FRAGMENT-CONNECTIONS" "$OUT/demo_stdout.txt"
echo "smoke OK (incl. demo report)"
