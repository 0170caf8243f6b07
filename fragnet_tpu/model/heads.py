"""Prediction heads: FTHead1–5 (gat2.py:569-751) and the 3D-pretraining
PretrainTask head (model/gat/pretrain_heads.py:8-102)."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fragnet_tpu.model.layers import torch_linear_init
from fragnet_tpu.ops.segment import segment_sum


class _PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, alpha * x)


def make_activation(name: str) -> Callable:
    """The nine activation choices of FTHead3/4/5 (gat2.py:600-622).
    torch RReLU at eval uses slope (lower+upper)/2 = (1/8 + 1/3)/2."""
    table = {
        "relu": nn.relu,
        "silu": nn.silu,
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "celu": nn.celu,
        "selu": nn.selu,
        "rrelu": lambda x: jax.nn.leaky_relu(x, (1.0 / 8 + 1.0 / 3) / 2),
        "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
        "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
    }
    if name == "prelu":
        return _PReLU()
    if name not in table:
        raise ValueError(f"unknown activation {name!r}")
    return table[name]


class _MLPHead(nn.Module):
    """dims[0] -> ... -> dims[-1]; activation(dropout(linear)) between all but
    the final layer (the FTHead2/3/5 predictor loop, gat2.py:745-749)."""

    dims: Sequence[int]
    drop_ratio: float = 0.2
    act: str = "relu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        drop = nn.Dropout(rate=self.drop_ratio, deterministic=deterministic)
        act = make_activation(self.act)
        for i, d in enumerate(self.dims[:-1]):
            x = act(drop(nn.Dense(d, kernel_init=torch_linear_init,
                                  name=f"predictor_{i}")(x)))
        return nn.Dense(self.dims[-1], kernel_init=torch_linear_init,
                        name=f"predictor_{len(self.dims) - 1}")(x)


class FTHead1(nn.Module):
    """2-layer head: dropout→lin1→relu→dropout→out (gat2.py:569-588)."""

    emb_dim: int = 128
    h1: int = 128
    drop_ratio: float = 0.2
    n_classes: int = 1

    @nn.compact
    def __call__(self, enc, deterministic: bool = True):
        drop = nn.Dropout(rate=self.drop_ratio, deterministic=deterministic)
        x = drop(enc)
        x = nn.Dense(self.h1, kernel_init=torch_linear_init, name="lin1")(x)
        x = nn.relu(x)
        x = drop(x)
        return nn.Dense(self.n_classes, kernel_init=torch_linear_init, name="out")(x)


class FTHead2(nn.Module):
    """Fixed 1024/1024/512 relu head with dropout 0.1 (gat2.py:728-751)."""

    input_dim: int = 128
    n_classes: int = 1

    @nn.compact
    def __call__(self, enc, deterministic: bool = True):
        head = _MLPHead(
            dims=[1024, 1024, 512, self.n_classes], drop_ratio=0.1, act="relu"
        )
        return head(enc, deterministic=deterministic)


class FTHead3(nn.Module):
    """h1–h4 + activation choice (gat2.py:678-725) — the production head."""

    input_dim: int = 128
    h1: int = 128
    h2: int = 1024
    h3: int = 1024
    h4: int = 512
    drop_ratio: float = 0.2
    n_classes: int = 1
    act: str = "relu"

    @nn.compact
    def __call__(self, enc, deterministic: bool = True):
        head = _MLPHead(
            dims=[self.h1, self.h2, self.h3, self.h4, self.n_classes],
            drop_ratio=self.drop_ratio,
            act=self.act,
        )
        return head(enc, deterministic=deterministic)


class FTHead4(nn.Module):
    """Single hidden layer + activation choice (gat2.py:640-675)."""

    input_dim: int = 128
    h1: int = 128
    act: str = "relu"
    n_classes: int = 1
    drop_ratio: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        drop = nn.Dropout(rate=self.drop_ratio, deterministic=deterministic)
        act = make_activation(self.act)
        x = drop(x)
        x = nn.Dense(self.h1, kernel_init=torch_linear_init, name="dense")(x)
        x = act(x)
        x = drop(x)
        return nn.Dense(self.n_classes, kernel_init=torch_linear_init,
                        name="out_proj")(x)


class FTHead5(nn.Module):
    """h1, h2 two-hidden-layer variant (gat2.py:591-637)."""

    input_dim: int = 128
    h1: int = 128
    h2: int = 1024
    drop_ratio: float = 0.2
    n_classes: int = 1
    act: str = "relu"

    @nn.compact
    def __call__(self, enc, deterministic: bool = True):
        head = _MLPHead(
            dims=[self.h1, self.h2, self.n_classes],
            drop_ratio=self.drop_ratio,
            act=self.act,
        )
        return head(enc, deterministic=deterministic)


FTHEADS = {
    "FTHead1": FTHead1,
    "FTHead2": FTHead2,
    "FTHead3": FTHead3,
    "FTHead4": FTHead4,
    "FTHead5": FTHead5,
}


class _HalvingMLP(nn.Module):
    """dim_in → dim_in/2 → ... → dim_out ladder used by each PretrainTask
    sub-head (pretrain_heads.py:27-57)."""

    dim_in: int
    dim_out: int = 1
    L: int = 2
    pre_activation: bool = False  # bond-length head activates before each linear

    @nn.compact
    def __call__(self, x):
        if self.pre_activation:
            for l in range(self.L):
                x = nn.Dense(self.dim_in // 2 ** (l + 1),
                             kernel_init=torch_linear_init, name=f"layers_{l}")(nn.relu(x))
            return nn.Dense(self.dim_out, kernel_init=torch_linear_init,
                            name=f"layers_{self.L}")(nn.relu(x))
        for l in range(self.L):
            x = nn.relu(
                nn.Dense(self.dim_in // 2 ** (l + 1),
                         kernel_init=torch_linear_init, name=f"layers_{l}")(x)
            )
        return nn.Dense(self.dim_out, kernel_init=torch_linear_init,
                        name=f"layers_{self.L}")(x)


class PretrainTask(nn.Module):
    """UniMol-style geometric pretraining head (pretrain_heads.py:8-102):
    bond-length head on [h_src ‖ h_dst ‖ e], bond-angle head on atoms,
    dihedral head on edges, graph-level energy head on pooled concat."""

    dim_in: int = 128
    dim_out: int = 1
    L: int = 2

    @nn.compact
    def __call__(self, x_atoms, x_frags, edge_attr, batch):
        # bond length: reduce 3*dim → dim then activated ladder
        pair = jnp.concatenate(
            [x_atoms[batch.edge_src], x_atoms[batch.edge_dst], edge_attr], axis=1
        )
        bl = nn.Dense(self.dim_in, kernel_init=torch_linear_init,
                      name="bl_reduce_layer")(pair)
        bl = _HalvingMLP(self.dim_in, self.dim_out, self.L,
                         pre_activation=True, name="bl_layers")(bl)

        ba = _HalvingMLP(self.dim_in, self.dim_out, self.L, name="ba_layers")(x_atoms)
        da = _HalvingMLP(self.dim_in, self.dim_out, self.L, name="da_layers")(edge_attr)

        G = batch.y.shape[0]
        x_frags_pooled = segment_sum(x_frags, batch.frag_batch, G, mask=batch.frag_mask)
        x_atoms_pooled = segment_sum(x_atoms, batch.atom_batch, G, mask=batch.atom_mask)
        graph_rep = jnp.concatenate([x_atoms_pooled, x_frags_pooled], axis=1)
        energy = _HalvingMLP(self.dim_in * 2, self.dim_out, self.L,
                             name="FC_layers")(graph_rep)
        return bl, ba, da, energy
