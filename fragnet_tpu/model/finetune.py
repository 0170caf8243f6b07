"""Finetune wrappers: encoder → masked sum-pool (atoms & frags by graph) →
concat → FTHead. Reference: gat2.py:758-826 (FragNetFineTune) and
train/finetune/finetune_dta.py:64-106 (FragNetFineTuneBase, encoder-only)."""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from fragnet_tpu.model.fragnet import FragNet
from fragnet_tpu.model.heads import FTHEADS
from fragnet_tpu.model.layers import LayerHooks
from fragnet_tpu.ops.segment import segment_sum


class FragNetFineTuneBase(nn.Module):
    """Encoder + pooling; returns the (G, 2*emb) graph representation."""

    num_layer: int = 4
    drop_ratio: float = 0.15
    num_heads: int = 4
    emb_dim: int = 128
    atom_features: int = 167
    frag_features: int = 167
    edge_features: int = 17
    fedge_in: int = 6
    fbond_edge_in: int = 6
    dtype: Any = jnp.float32
    ep_axis: Any = None

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
            dtype=self.dtype,
            ep_axis=self.ep_axis,
        )

    def encode(self, batch, deterministic: bool = True,
               hooks: Optional[List[LayerHooks]] = None,
               return_attentions: bool = False):
        out = self.pretrain(
            batch, deterministic=deterministic, hooks=hooks,
            return_attentions=return_attentions,
        )
        if return_attentions:
            x_atoms, x_frags, _, _, attn = out
        else:
            x_atoms, x_frags, _, _ = out
            attn = None
        G = batch.y.shape[0]
        x_frags_pooled = segment_sum(x_frags, batch.frag_batch, G, mask=batch.frag_mask)
        x_atoms_pooled = segment_sum(x_atoms, batch.atom_batch, G, mask=batch.atom_mask)
        rep = jnp.concatenate([x_atoms_pooled, x_frags_pooled], axis=1)
        return (rep, attn) if return_attentions else rep

    def __call__(self, batch, deterministic: bool = True):
        return self.encode(batch, deterministic=deterministic)


class FragNetFineTune(nn.Module):
    """The flagship finetune model (gat2.py:758-826)."""

    n_classes: int = 1
    atom_features: int = 167
    frag_features: int = 167
    edge_features: int = 17
    fedge_in: int = 6
    fbond_edge_in: int = 6
    num_layer: int = 4
    num_heads: int = 4
    drop_ratio: float = 0.15
    h1: int = 256
    h2: int = 256
    h3: int = 256
    h4: int = 256
    act: str = "celu"
    emb_dim: int = 128
    fthead: str = "FTHead3"
    dtype: Any = jnp.float32
    ep_axis: Any = None

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
            dtype=self.dtype,
            ep_axis=self.ep_axis,
        )
        cls = FTHEADS[self.fthead]
        if self.fthead == "FTHead1":
            self.head = cls(n_classes=self.n_classes)
        elif self.fthead == "FTHead2":
            self.head = cls(n_classes=self.n_classes, input_dim=self.emb_dim)
        elif self.fthead == "FTHead3":
            self.head = cls(
                n_classes=self.n_classes, input_dim=self.emb_dim,
                h1=self.h1, h2=self.h2, h3=self.h3, h4=self.h4,
                drop_ratio=self.drop_ratio, act=self.act,
            )
        elif self.fthead == "FTHead4":
            self.head = cls(
                n_classes=self.n_classes, h1=self.h1,
                drop_ratio=self.drop_ratio, act=self.act,
            )
        else:
            self.head = cls(
                n_classes=self.n_classes, input_dim=self.emb_dim,
                h1=self.h1, h2=self.h2, drop_ratio=self.drop_ratio, act=self.act,
            )

    def __call__(self, batch, deterministic: bool = True,
                 hooks: Optional[List[LayerHooks]] = None,
                 return_attentions: bool = False):
        out = self.pretrain(
            batch, deterministic=deterministic, hooks=hooks,
            return_attentions=return_attentions,
        )
        if return_attentions:
            x_atoms, x_frags, _, _, attn = out
        else:
            x_atoms, x_frags, _, _ = out
            attn = None
        G = batch.y.shape[0]
        x_frags_pooled = segment_sum(x_frags, batch.frag_batch, G, mask=batch.frag_mask)
        x_atoms_pooled = segment_sum(x_atoms, batch.atom_batch, G, mask=batch.atom_mask)
        cat = jnp.concatenate([x_atoms_pooled, x_frags_pooled], axis=1)
        pred = self.head(cat, deterministic=deterministic).astype(jnp.float32)
        if return_attentions:
            return pred, attn
        return pred
