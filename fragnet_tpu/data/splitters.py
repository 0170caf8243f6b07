"""Dataset splitters.

* ``scaffold_split``        — deterministic MoleBert split (the split behind
  the reference's published numbers, fragnet/dataset/splitters_molebert.py:
  32-136): group by Murcko scaffold, sort scaffold sets (by size desc, then
  first-appearance), fill train/val/test to 80/10/10.
* ``random_scaffold_split`` — scaffold groups shuffled into splits
  (splitters_molebert.py:137-209).
* ``random_split``          — seeded uniform split (splitters_molebert.py:210).
* ``cv_random_split``       — k-fold (splitters_molebert.py:283).
* ``deepchem_scaffold_split`` — DeepChem-style greedy large-sets-first
  (fragnet/dataset/splitters.py:53-173).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from fragnet_tpu.chem import engine


def generate_scaffold(smiles: str, include_chirality: bool = False) -> Optional[str]:
    return engine.murcko_scaffold_smiles(smiles, include_chirality)


def _scaffold_sets(smiles_list: Sequence[str]) -> Dict[str, List[int]]:
    sets: Dict[str, List[int]] = defaultdict(list)
    for i, s in enumerate(smiles_list):
        sc = generate_scaffold(s)
        if sc is None:
            sc = f"__invalid_{i}"
        sets[sc].append(i)
    return sets


def scaffold_split(
    smiles_list: Sequence[str],
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
) -> Tuple[List[int], List[int], List[int]]:
    """Deterministic MoleBert scaffold split (splitters_molebert.py:32-136):
    scaffold sets sorted by (set size desc, first index asc); greedily fill
    train until the train cutoff, then valid, then test."""
    np.testing.assert_almost_equal(frac_train + frac_valid + frac_test, 1.0)
    n = len(smiles_list)
    sets = _scaffold_sets(smiles_list)
    # MoleBert: sort sets by size (desc), tie-break by smallest index
    all_sets = sorted(
        sets.values(), key=lambda s: (len(s), s[0]), reverse=True
    )
    train_cutoff = frac_train * n
    valid_cutoff = (frac_train + frac_valid) * n
    train, valid, test = [], [], []
    for group in all_sets:
        if len(train) + len(group) > train_cutoff:
            if len(train) + len(valid) + len(group) > valid_cutoff:
                test.extend(group)
            else:
                valid.extend(group)
        else:
            train.extend(group)
    assert len(set(train) & set(valid)) == 0
    assert len(set(valid) & set(test)) == 0
    return train, valid, test


def random_scaffold_split(
    smiles_list: Sequence[str],
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
    seed: int = 0,
) -> Tuple[List[int], List[int], List[int]]:
    rng = np.random.default_rng(seed)
    groups = list(_scaffold_sets(smiles_list).values())
    perm = rng.permutation(len(groups))
    n = len(smiles_list)
    n_train = int(frac_train * n)
    n_valid = int(frac_valid * n)
    train, valid, test = [], [], []
    for gi in perm:
        g = groups[gi]
        if len(train) + len(g) <= n_train:
            train.extend(g)
        elif len(valid) + len(g) <= n_valid:
            valid.extend(g)
        else:
            test.extend(g)
    return train, valid, test


def deepchem_scaffold_split(
    smiles_list: Sequence[str],
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
) -> Tuple[List[int], List[int], List[int]]:
    """DeepChem ScaffoldSplitter (splitters.py:53-173): sets sorted by size
    desc; fill train, spill to valid, then test."""
    sets = _scaffold_sets(smiles_list)
    groups = sorted(sets.values(), key=lambda s: (len(s), -min(s)), reverse=True)
    n = len(smiles_list)
    train_cut = frac_train * n
    valid_cut = (frac_train + frac_valid) * n
    train, valid, test = [], [], []
    for g in groups:
        if len(train) + len(g) > train_cut:
            if len(train) + len(valid) + len(g) > valid_cut:
                test.extend(g)
            else:
                valid.extend(g)
        else:
            train.extend(g)
    return train, valid, test


def random_split(
    n: int,
    frac_train: float = 0.8,
    frac_valid: float = 0.1,
    frac_test: float = 0.1,
    seed: int = 0,
) -> Tuple[List[int], List[int], List[int]]:
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_train = int(frac_train * n)
    n_valid = int(frac_valid * n)
    return (
        perm[:n_train].tolist(),
        perm[n_train : n_train + n_valid].tolist(),
        perm[n_train + n_valid :].tolist(),
    )


def cv_random_split(n: int, n_folds: int = 5, seed: int = 0) -> List[Tuple[List[int], List[int]]]:
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    folds = np.array_split(perm, n_folds)
    out = []
    for k in range(n_folds):
        val = folds[k].tolist()
        train = np.concatenate([folds[j] for j in range(n_folds) if j != k]).tolist()
        out.append((train, val))
    return out
