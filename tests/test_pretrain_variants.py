"""Pretrain variant tests: input-masked model (Masked2), structure/property
auxiliary pretraining (pretrain_gat_mol/str analogs), ring-count target."""

import jax
import numpy as np
import pytest

from fragnet_tpu.config import Config


class TestMasked2:
    def test_masking_changes_output_and_respects_determinism(self, ft_graphs):
        import jax.numpy as jnp

        from fragnet_tpu.graphs.hiergraph import pad_batch, spec_for
        from fragnet_tpu.model.pretrain import FragNetPreTrainMasked2

        spec = spec_for(ft_graphs, batch_size=len(ft_graphs))
        b = jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None,
            pad_batch(ft_graphs, spec, with_targets=True))
        model = FragNetPreTrainMasked2(num_layer=1, num_heads=2, emb_dim=32)
        params = model.init(jax.random.PRNGKey(0), b, deterministic=True)
        det = model.apply(params, b, deterministic=True)
        det2 = model.apply(params, b, deterministic=True)
        np.testing.assert_allclose(np.asarray(det[0]), np.asarray(det2[0]))
        r1 = model.apply(params, b, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1),
                               "mask": jax.random.PRNGKey(2)})
        r2 = model.apply(params, b, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1),
                               "mask": jax.random.PRNGKey(3)})
        # different mask rng → different predictions (input masking is live)
        assert not np.allclose(np.asarray(r1[0]), np.asarray(r2[0]))


class TestRingCount:
    @pytest.mark.parametrize("smiles,expect", [
        ("CCO", 0),
        ("c1ccccc1", 1),
        ("c1ccc2ccccc2c1", 2),
        ("C1CC1.C1CC1", 2),
        ("[Na+].[Cl-]", 0),
    ])
    def test_counts(self, smiles, expect):
        from fragnet_tpu.chem import engine
        from fragnet_tpu.train.pretrain import structure_ring_count

        mol, _ = engine.mol_3d(smiles)
        assert structure_ring_count(mol) == expect


class TestAuxPretrain:
    def test_structure_mode_end_to_end(self, tmp_path):
        from fragnet_tpu.train.pretrain import run_pretrain

        opt = Config({
            "seed": 0,
            "exp_dir": str(tmp_path / "pt_str"),
            "pretrain": {
                "mode": "structure",
                "loss": "cel",
                "n_classes": 8,
                "n_synthetic": 16,
                "batch_size": 8,
                "n_epochs": 2,
                "es_patience": 5,
                "model": {"num_layer": 1, "num_heads": 2, "emb_dim": 32},
            },
        })
        best, ckpt = run_pretrain(opt, quiet=True)
        assert best is not None and np.isfinite(best)
        import os

        assert os.path.exists(ckpt)
        assert os.path.exists(str(tmp_path / "pt_str" / "scalars.jsonl"))

    def test_property_mode_mse(self, tmp_path):
        from fragnet_tpu.train.pretrain import run_pretrain

        opt = Config({
            "seed": 0,
            "exp_dir": str(tmp_path / "pt_prop"),
            "pretrain": {
                "mode": "property",
                "loss": "mse",
                "n_synthetic": 16,
                "batch_size": 8,
                "n_epochs": 2,
                "es_patience": 5,
                "model": {"num_layer": 1, "num_heads": 2, "emb_dim": 32},
            },
        })
        best, ckpt = run_pretrain(opt, quiet=True)
        assert best is not None and np.isfinite(best)

    def test_masked2_model_version_routes(self, tmp_path):
        from fragnet_tpu.train.pretrain import run_pretrain

        opt = Config({
            "seed": 0,
            "exp_dir": str(tmp_path / "pt_m2"),
            "pretrain": {
                "model_version": "gat2_masked2",
                "n_synthetic": 8,
                "batch_size": 8,
                "n_epochs": 1,
                "es_patience": 5,
                "val_every": 1,
                "model": {"num_layer": 1, "num_heads": 2, "emb_dim": 32},
            },
        })
        best, ckpt = run_pretrain(opt, quiet=True)
        assert best is not None and np.isfinite(best)
