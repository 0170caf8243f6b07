"""End-to-end ACCURACY parity: the unmodified reference (CPU torch via
parity/torch_shim.py) and fragnet_tpu trained A/B on the same graphs, same
scaffold split, same recipe/seed, compared on test RMSE — the 1-seed test
version of scripts/ab_accuracy.py (SURVEY §6's measured-baseline
obligation; full 3-seed numbers live in ABRESULTS.json / BASELINE.md)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

# multi-minute test (two full CPU training runs): slow tier only
pytestmark = pytest.mark.slow


def test_reference_vs_fragnet_tpu_rmse():
    from scripts.ab_accuracy import build_shared, train_ours, train_reference

    train_g, val_g, test_g = build_shared("regr", n=80)
    assert len(test_g) >= 4
    kw = dict(n_epochs=40, patience=10)
    ref = train_reference(train_g, val_g, test_g, seed=0, task="regr", **kw)
    ours = train_ours(train_g, val_g, test_g, seed=0, task="regr",
                      exp_dir="/tmp/e2e_parity", **kw)
    # both must actually learn (constant-predictor RMSE on the synthetic
    # solubility target is ~1.3) and land in the same quality regime;
    # single-seed small-data training has real variance, so the gate is a
    # regime check, not an equality check (3-seed means: ABRESULTS.json)
    assert ref < 1.0, f"reference failed to learn: rmse={ref}"
    assert ours < 1.0, f"fragnet_tpu failed to learn: rmse={ours}"
    assert abs(ref - ours) < 0.35 * max(ref, ours) + 0.1, (ref, ours)
