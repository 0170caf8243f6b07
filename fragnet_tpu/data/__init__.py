"""Datasets: featurization pipelines, splitters, batching, synthetic data.

Covers the reference's dataset layer (fragnet/dataset/*): finetune/pretrain
dataset creation, pickle persistence, scaffold splitters (MoleBert
deterministic — the split used for published numbers — and DeepChem-style),
MoleculeNet CSV loading, DTA/CDRP creators, plus a synthetic molecule
generator for data-free environments.
"""

from fragnet_tpu.data.datasets import (
    FinetuneData,
    build_graphs,
    load_pickle_dataset,
    save_pickle_dataset,
)
from fragnet_tpu.data.batcher import BatchLoader
from fragnet_tpu.data.splitters import random_split, scaffold_split
from fragnet_tpu.data.synthetic import synthetic_dataset

__all__ = [
    "FinetuneData",
    "build_graphs",
    "load_pickle_dataset",
    "save_pickle_dataset",
    "BatchLoader",
    "random_split",
    "scaffold_split",
    "synthetic_dataset",
]
