"""Cancer drug response prediction (CDRP) model.

Reference: fragnet/model/cdrp/model.py — drug encoder + gene-expression MLP
(903 → 1024 → 256 → 64 → 256, ReLU after EVERY layer incl. the last,
MLP:6-22) → concat → 2-layer head (:25-43).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from fragnet_tpu.model.finetune import FragNetFineTuneBase
from fragnet_tpu.model.layers import torch_linear_init


class GeneMLP(nn.Module):
    gene_dim: int = 903
    hidden_dims: tuple = (1024, 256, 64)
    out_dim: int = 256

    @nn.compact
    def __call__(self, v):
        dims = list(self.hidden_dims) + [self.out_dim]
        for i, d in enumerate(dims):
            v = nn.relu(nn.Dense(d, kernel_init=torch_linear_init,
                                 name=f"predictor_{i}")(v))
        return v


class CDRPModel(nn.Module):
    num_layer: int = 4
    num_heads: int = 4
    drop_ratio: float = 0.15
    emb_dim: int = 128
    atom_features: int = 167
    frag_features: int = 167
    edge_features: int = 17
    fedge_in: int = 6
    fbond_edge_in: int = 6
    gene_dim: int = 903

    def setup(self):
        self.drug_model = FragNetFineTuneBase(
            num_layer=self.num_layer, num_heads=self.num_heads,
            drop_ratio=self.drop_ratio, emb_dim=self.emb_dim,
            atom_features=self.atom_features, frag_features=self.frag_features,
            edge_features=self.edge_features, fedge_in=self.fedge_in,
            fbond_edge_in=self.fbond_edge_in,
        )
        self.cell_model = GeneMLP(gene_dim=self.gene_dim)
        self.fc1 = nn.Dense(128, kernel_init=torch_linear_init)
        self.fc2 = nn.Dense(1, kernel_init=torch_linear_init)

    def __call__(self, batch, deterministic: bool = True):
        drug_enc = self.drug_model.encode(batch, deterministic=deterministic)
        cell_enc = self.cell_model(batch.gene_expr.astype(jnp.float32))
        cat = jnp.concatenate([drug_enc, cell_enc], axis=1)
        return self.fc2(self.fc1(cat))
