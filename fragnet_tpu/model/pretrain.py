"""Pretrain wrappers: FragNet encoder + PretrainTask head, plus the masked
variants. Reference: model/gat/pretrain_heads.py:105-236 and
model/gat/gat2_pretrain.py."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fragnet_tpu.model.fragnet import FragNet
from fragnet_tpu.model.heads import PretrainTask


class FragNetPreTrain(nn.Module):
    """Encoder + 4-target geometric head (pretrain_heads.py:105-131)."""

    num_layer: int = 4
    drop_ratio: float = 0.15
    num_heads: int = 4
    emb_dim: int = 128
    atom_features: int = 167
    frag_features: int = 167
    edge_features: int = 17
    fedge_in: int = 6
    fbond_edge_in: int = 6
    dtype: Optional[object] = None  # encoder compute dtype (None → f32)

    def setup(self):
        self.pretrain = FragNet(
            num_layer=self.num_layer,
            drop_ratio=self.drop_ratio,
            emb_dim=self.emb_dim,
            atom_features=self.atom_features,
            frag_features=self.frag_features,
            edge_features=self.edge_features,
            fedge_in=self.fedge_in,
            fbond_edge_in=self.fbond_edge_in,
            num_heads=self.num_heads,
            dtype=self.dtype if self.dtype is not None else jnp.float32,
        )
        self.head = PretrainTask(dim_in=self.emb_dim, dim_out=1)

    def __call__(self, batch, deterministic: bool = True):
        x_atoms, x_frags, e_edge, _ = self.pretrain(batch, deterministic=deterministic)
        return self.head(x_atoms, x_frags, e_edge, batch)


class FragNetPreTrainMasked(FragNetPreTrain):
    """Masks 15% of atom *embeddings* after encoding (gat2_pretrain.py:47-52).
    The mask is sampled from the 'mask' RNG stream when not deterministic."""

    mask_ratio: float = 0.15

    def __call__(self, batch, deterministic: bool = True):
        x_atoms, x_frags, e_edge, _ = self.pretrain(batch, deterministic=deterministic)
        if not deterministic:
            rng = self.make_rng("mask")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.mask_ratio, (x_atoms.shape[0], 1)
            ).astype(x_atoms.dtype)
            x_atoms = x_atoms * keep
        return self.head(x_atoms, x_frags, e_edge, batch)


def mask_atom_features(rng: jax.Array, x_atoms: jnp.ndarray,
                       ratio: float = 0.3) -> jnp.ndarray:
    """Input-level atom feature masking to −1 (reference data.py:1189-1193,
    used by FragNetPreTrainMasked2 / pretrain_heads.py:219-228)."""
    mask = jax.random.bernoulli(rng, ratio, (x_atoms.shape[0], 1))
    return jnp.where(mask, -1.0, x_atoms)


class FragNetPreTrainMasked2(FragNetPreTrain):
    """Masks 30% of RAW atom input features to −1 before the encoder
    (pretrain_heads.py:219-228: ``mask_atom_features`` on ``x_atoms``).
    Mask is sampled from the 'mask' RNG stream when training; padded rows
    stay zero via the downstream atom_mask."""

    input_mask_ratio: float = 0.3

    def __call__(self, batch, deterministic: bool = True):
        if not deterministic:
            rng = self.make_rng("mask")
            masked = mask_atom_features(rng, batch.x_atoms,
                                        self.input_mask_ratio)
            batch = batch.replace(x_atoms=masked)
        x_atoms, x_frags, e_edge, _ = self.pretrain(
            batch, deterministic=deterministic)
        return self.head(x_atoms, x_frags, e_edge, batch)
