"""Drug–target affinity (DTA) models.

Reference: fragnet/model/dta/model.py — DTAModel (FragNet drug encoder +
BERT-style protein transformer, :83-104) and DTAModel2 (GraphDTA-style CNN
protein encoder, :107-146). The protein transformer is re-designed as a
standard flax encoder (the reference vendors DeepTTC's
Encoder_MultipleLayers); sizes match: vocab 25+pad, emb 128, 8 layers,
8 heads, intermediate 512, max position 1000, CLS-token readout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fragnet_tpu.model.finetune import FragNetFineTuneBase
from fragnet_tpu.model.layers import torch_linear_init


class _EncoderLayer(nn.Module):
    """One BERT encoder block — scanned over depth (compile once)."""

    emb_dim: int
    n_heads: int
    intermediate: int
    dropout: float
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, _):
        x, attn_mask = carry
        deterministic = self.deterministic
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name="attn",
        )(x, x, mask=attn_mask)
        x = nn.LayerNorm(epsilon=1e-12, name="ln1")(
            x + nn.Dropout(self.dropout, deterministic=deterministic)(a)
        )
        h = nn.Dense(self.intermediate, kernel_init=torch_linear_init,
                     name="ffn1")(x)
        h = nn.relu(h)  # DeepTTC Intermediate uses ReLU (drug_encoder.py:137-140)
        h = nn.Dense(self.emb_dim, kernel_init=torch_linear_init,
                     name="ffn2")(h)
        x = nn.LayerNorm(epsilon=1e-12, name="ln2")(
            x + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        )
        return (x, attn_mask), None


class ProteinTransformer(nn.Module):
    """BERT-style encoder over integer-encoded protein sequences; returns
    the first-token representation (dta/model.py:50-81). Depth is an
    ``nn.scan`` so XLA compiles ONE layer regardless of n_layers — unrolled
    transformer stacks made the train-step compile take minutes on the
    remote TPU compiler."""

    vocab_size: int = 26       # 25 amino-acid codes + padding id 0
    emb_dim: int = 128
    n_layers: int = 8
    n_heads: int = 8
    intermediate: int = 512
    max_len: int = 1000
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, deterministic: bool = True):
        mask = (tokens != 0)
        pos = jnp.arange(tokens.shape[1])[None, :]
        x = nn.Embed(self.vocab_size, self.emb_dim, name="word_embeddings")(tokens)
        x = x + nn.Embed(self.max_len, self.emb_dim,
                         name="position_embeddings")(pos)
        x = nn.LayerNorm(epsilon=1e-12)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)

        attn_mask = mask[:, None, None, :]
        stack = nn.scan(
            _EncoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.n_layers,
        )(name="layers", emb_dim=self.emb_dim, n_heads=self.n_heads,
          intermediate=self.intermediate, dropout=self.dropout,
          deterministic=deterministic)
        (x, _), _ = stack((x, attn_mask), None)
        return x[:, 0]


class ProteinCNN(nn.Module):
    """GraphDTA-style protein CNN (dta/model.py:107-146): embed, conv over
    the sequence axis, flatten, project to 300."""

    vocab_size: int = 26
    emb_dim: int = 300
    seq_len: int = 1000
    n_filters: int = 32
    kernel_size: int = 8
    out_dim: int = 300

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, deterministic: bool = True):
        x = nn.Embed(self.vocab_size, self.emb_dim, name="embedding_xt")(tokens)
        # reference convs over the SEQUENCE axis as channels:
        # Conv1d(in=1000, out=32, k=8) applied to (B, 1000, 300)
        x = nn.Conv(self.n_filters, kernel_size=(self.kernel_size,),
                    padding="VALID", name="conv_xt_1")(
            x.transpose(0, 2, 1)  # (B, 300, 1000) conv over emb axis
        ).transpose(0, 2, 1)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.out_dim, kernel_init=torch_linear_init,
                        name="fc1_xt")(x)


class DTAModel(nn.Module):
    """FragNet drug encoder + protein transformer → concat → 2-layer MLP
    (dta/model.py:83-104)."""

    num_layer: int = 4
    num_heads: int = 4
    drop_ratio: float = 0.15
    emb_dim: int = 128
    atom_features: int = 167
    frag_features: int = 167
    edge_features: int = 17
    fedge_in: int = 6
    fbond_edge_in: int = 6
    protein_encoder: str = "transformer"  # or "cnn" (DTAModel2)
    # protein-transformer hyperparams (reference fixes these at
    # dta/model.py:52-60; vocab is 25 there — a latent overflow for 'Z'
    # tokens (id 25), so the safe default here is 26)
    protein_vocab_size: int = 26
    protein_layers: int = 8
    protein_heads: int = 8
    protein_intermediate: int = 512
    protein_max_len: int = 1000

    def setup(self):
        self.drug_model = FragNetFineTuneBase(
            num_layer=self.num_layer, num_heads=self.num_heads,
            drop_ratio=self.drop_ratio, emb_dim=self.emb_dim,
            atom_features=self.atom_features, frag_features=self.frag_features,
            edge_features=self.edge_features, fedge_in=self.fedge_in,
            fbond_edge_in=self.fbond_edge_in,
        )
        if self.protein_encoder == "transformer":
            self.target_model = ProteinTransformer(
                vocab_size=self.protein_vocab_size, emb_dim=128,
                n_layers=self.protein_layers, n_heads=self.protein_heads,
                intermediate=self.protein_intermediate,
                max_len=self.protein_max_len,
            )
            target_dim = 128
        else:
            self.target_model = ProteinCNN()
            target_dim = 300
        self.fc1 = nn.Dense(128, kernel_init=torch_linear_init)
        self.fc2 = nn.Dense(1, kernel_init=torch_linear_init)

    def __call__(self, batch, deterministic: bool = True):
        drug_enc = self.drug_model.encode(batch, deterministic=deterministic)
        target_enc = self.target_model(batch.protein,
                                       deterministic=deterministic)
        cat = jnp.concatenate([drug_enc, target_enc], axis=1)
        return self.fc2(self.fc1(cat))
