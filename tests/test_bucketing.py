"""Bucketed-padding policy tests (SURVEY §7 step 7; VERDICT r1 weak #7)."""

import numpy as np
import pytest

from fragnet_tpu.data.batcher import BatchLoader, BucketedBatchLoader
from fragnet_tpu.graphs.hiergraph import spec_for


class TestBucketedLoader:
    def test_delivers_every_graph_once(self, ft_graphs):
        loader = BucketedBatchLoader(ft_graphs, batch_size=3, n_buckets=3,
                                     to_device=False)
        total = 0
        for b in loader:
            total += int(np.asarray(b.graph_mask).sum())
        assert total == len(ft_graphs)

    def test_shuffled_epochs_cover_everything(self, ft_graphs):
        loader = BucketedBatchLoader(ft_graphs, batch_size=3, n_buckets=2,
                                     shuffle=True, seed=1, to_device=False)
        for _ in range(2):
            total = sum(int(np.asarray(b.graph_mask).sum()) for b in loader)
            assert total == len(ft_graphs)

    def test_small_bucket_pads_less(self, ft_graphs):
        global_spec = spec_for(ft_graphs, batch_size=3)
        loader = BucketedBatchLoader(ft_graphs, batch_size=3, n_buckets=3,
                                     to_device=False)
        specs = loader.specs
        assert len(specs) >= 2
        # the smallest bucket's edge cap must undercut the global p95 spec
        assert min(s.n_edges for s in specs) < global_spec.n_edges
        assert min(s.n_atoms for s in specs) < global_spec.n_atoms

    def test_batch_shapes_match_bucket_spec(self, ft_graphs):
        loader = BucketedBatchLoader(ft_graphs, batch_size=3, n_buckets=2,
                                     to_device=False)
        shapes = set()
        for b in loader:
            shapes.add(b.x_atoms.shape)
        assert 1 <= len(shapes) <= 2  # bounded variant count

    def test_prefetch_equivalent(self, ft_graphs):
        loader = BucketedBatchLoader(ft_graphs, batch_size=3, n_buckets=2,
                                     to_device=False)
        direct = sum(int(np.asarray(b.graph_mask).sum()) for b in loader)
        pre = sum(int(np.asarray(b.graph_mask).sum())
                  for b in loader.prefetch())
        assert direct == pre == len(ft_graphs)


class TestBucketedTraining:
    def test_run_finetune_with_buckets(self, tmp_path):
        from fragnet_tpu.config import Config
        from fragnet_tpu.data.datasets import build_graphs
        from fragnet_tpu.data.synthetic import synthetic_dataset
        from fragnet_tpu.train.finetune import run_finetune

        df = synthetic_dataset(n=20, seed=0)
        tcol = [c for c in df.columns if c != "smiles"][0]
        graphs = build_graphs(list(df["smiles"]), [[y] for y in df[tcol]])
        tr, va, te = graphs[:12], graphs[12:16], graphs[16:]
        opt = Config({
            "seed": 0,
            "exp_dir": str(tmp_path / "exp"),
            "finetune": {
                "model": {"num_layer": 1, "num_heads": 2, "emb_dim": 32,
                          "h1": 16, "h2": 16, "h3": 16, "h4": 16,
                          "drop_ratio": 0.0},
                "batch_size": 4, "lr": 1e-3, "n_epochs": 2,
                "es_patience": 5, "n_buckets": 2,
            },
        })
        value, _ = run_finetune(opt, quiet=True,
                                datasets=(tr, va, te, 1, "regr"))
        assert np.isfinite(value)
