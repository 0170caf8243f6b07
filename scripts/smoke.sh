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

echo "== 1/3 dataset creation (esol) =="
python -m fragnet_tpu.data.create finetune --dataset esol \
    --out "$OUT/esol" --n_synthetic 32 --split scaffold

echo "== 2/3 finetune (2 epochs) =="
python -m fragnet_tpu.train.finetune --config configs/ft/esol.yaml \
    finetune.train.path="$OUT/esol/train.pkl" \
    finetune.val.path="$OUT/esol/val.pkl" \
    finetune.test.path="$OUT/esol/test.pkl" \
    finetune.n_epochs=2 finetune.es_patience=5 \
    exp_dir="$OUT/exp"

echo "== 3/3 artifacts =="
test -f "$OUT/exp/ft.ckpt"
test -f "$OUT/exp/preds_seed_42.pkl"
test -f "$OUT/exp/scalars.jsonl"
echo "smoke OK"
