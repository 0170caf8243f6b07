"""Ablation model family: the reference's v1 GAT and GCN/GIN baselines.

* ``FragNetV1`` — fragnet/model/gat/gat.py:11-133: 3-head GAT over the bond
  graph (attention vector spans [h_dst ‖ cos-angle ‖ h_src]), a
  GCN-normalized (deg^-1/2 symmetric) atom pass that consumes the *new* bond
  features only through the (computed-but-unused) edge embedding, fragment
  state recomputed from atoms + neighbor-sum + frag MLP. Every layer re-reads
  the RAW bond-graph node features (gat.py:160-180 passes the same
  ``node_features_bonds`` to all four layers).
* ``FragNetGCNv1`` — fragnet/model/gcn/gcn.py:11-96: no bond graph at all;
  self-loop-augmented GCN atom pass + fragment MLP.
* ``FragNetGIN`` — fragnet/model/gcn/gcn3.py:11-116 ("gin as implemented in
  pretrain-gnns"): bond graph aggregated additively (edge attr embed + source
  features, no attention), self-loops on the bond graph carry cos-angle 1.5
  (gcn3.py:52-55), atom pass is additive message = edge_attr + h_src.
  NOTE: the reference's gcn3 ``FragNet.forward`` unpacks three values from a
  two-value layer (gcn3.py:168) and would raise; the two-value contract is
  implemented here.

Dim deviation (documented): the reference hard-codes self-loop attr widths
(12 at gat.py:88, gcn.py:41; 128 at gcn3.py:73) for its legacy 12-dim feature
set; widths here follow the configured feature dims so the exp1s 17-dim stack
works. v1's per-head split uses ``edge_in // 3`` exactly as the reference
(gat.py:33) — for 17-dim bonds that projects to 15 dims.

Reference modules that never affect forward (frag_embed, frag_message_mlp,
atom_mlp, bias — gat.py:18-31) are not created; the checkpoint importer skips
their entries (same policy as model/layers.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from fragnet_tpu.model.layers import torch_linear_init, xavier_gain
from fragnet_tpu.ops.segment import gat_attention_pass, segment_sum


def _gcn_atom_pass(x, src, dst, e_mask, atom_mask):
    """Symmetric-degree-normalized sum aggregation (gat.py:93-101)."""
    A = x.shape[0]
    deg = segment_sum(e_mask, src, A)
    dis = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    norm = dis[src] * dis[dst] * e_mask
    msg = x[src] * norm[:, None]
    return segment_sum(msg, dst, A) * atom_mask[:, None]


def _frag_neighbor_mlp(x_atoms_new, batch, frag_mlp0, frag_mlp1):
    """x_frags = scatter(atoms) → neighbor sum → frag_mlp (gat.py:104-111)."""
    F = batch.x_frags.shape[0]
    x_frags = segment_sum(x_atoms_new, batch.atom_to_frag, F)
    fmsg = x_frags[batch.frag_src] * batch.fconn_mask[:, None]
    frag_sum = segment_sum(fmsg, batch.frag_dst, F)
    h = nn.relu(frag_mlp0(frag_sum))
    return frag_mlp1(h) * batch.frag_mask[:, None]


class FragNetLayerV1(nn.Module):
    """gat.py:11-113 — 3-head bond GAT + GCN atom pass + frag MLP."""

    atom_in: int = 167
    atom_out: int = 128
    edge_in: int = 17
    edge_out: int = 128  # constructor-time width of the unused edge_embed
    num_heads: int = 3

    @nn.compact
    def __call__(self, x_atoms, nf_bonds, batch):
        H = self.num_heads
        edge_out_ph = self.edge_in // H  # gat.py:33 overwrite
        A, E = x_atoms.shape[0], nf_bonds.shape[0]

        nf_b = nn.Dense(edge_out_ph * H, kernel_init=xavier_gain,
                        name="projection_b")(nf_bonds).reshape(E, H, edge_out_ph)
        a_b = self.param("a_b", xavier_gain, (H, 2 * edge_out_ph + 1))
        ea_h = jnp.broadcast_to(
            batch.ea_bonds[:, None, :], (batch.ea_bonds.shape[0], H, 1))
        bond_out, _ = gat_attention_pass(
            nf_b, ea_h, batch.bg_src, batch.bg_dst, a_b, E,
            edge_mask=batch.bg_mask)
        new_bond_features = (
            bond_out.reshape(E, -1) * batch.edge_mask[:, None])

        # edge embedding computed but unused in the message (gat.py:92 quirk)
        _ = nn.Dense(self.edge_out, kernel_init=torch_linear_init,
                     name="edge_embed")(new_bond_features)

        sl = jnp.arange(A, dtype=batch.edge_src.dtype)
        src = jnp.concatenate([batch.edge_src, sl])
        dst = jnp.concatenate([batch.edge_dst, sl])
        e_mask = jnp.concatenate(
            [batch.edge_mask, jnp.ones((A,), x_atoms.dtype)])
        x = nn.Dense(self.atom_out, kernel_init=torch_linear_init,
                     name="atom_embed")(x_atoms)
        x_atoms_new = _gcn_atom_pass(x, src, dst, e_mask, batch.atom_mask)

        f0 = nn.Dense(2 * self.atom_out, kernel_init=torch_linear_init,
                      name="frag_mlp_0")
        f1 = nn.Dense(self.atom_out, kernel_init=torch_linear_init,
                      name="frag_mlp_1")
        x_frags_new = _frag_neighbor_mlp(x_atoms_new, batch, f0, f1)
        return x_atoms_new, x_frags_new


class FragNetLayerGCNv1(nn.Module):
    """gcn.py:11-75 — GCN atom pass only (no bond graph)."""

    atom_in: int = 167
    atom_out: int = 128
    edge_in: int = 17
    edge_out: int = 128

    @nn.compact
    def __call__(self, x_atoms, batch):
        A = x_atoms.shape[0]
        sl = jnp.arange(A, dtype=batch.edge_src.dtype)
        src = jnp.concatenate([batch.edge_src, sl])
        dst = jnp.concatenate([batch.edge_dst, sl])
        e_mask = jnp.concatenate(
            [batch.edge_mask, jnp.ones((A,), x_atoms.dtype)])

        # computed-but-unused edge embed (gcn.py:47 quirk)
        _ = nn.Dense(self.edge_out, kernel_init=torch_linear_init,
                     name="edge_embed")(batch.edge_attr)
        x = nn.Dense(self.atom_out, kernel_init=torch_linear_init,
                     name="atom_embed")(x_atoms)
        x_atoms_new = _gcn_atom_pass(x, src, dst, e_mask, batch.atom_mask)

        f0 = nn.Dense(2 * self.atom_out, kernel_init=torch_linear_init,
                      name="frag_mlp_0")
        f1 = nn.Dense(self.atom_out, kernel_init=torch_linear_init,
                      name="frag_mlp_1")
        x_frags_new = _frag_neighbor_mlp(x_atoms_new, batch, f0, f1)
        return x_atoms_new, x_frags_new


class FragNetLayerGIN(nn.Module):
    """gcn3.py:11-116 — additive (GIN-style) bond + atom aggregation."""

    atom_in: int = 167
    atom_out: int = 128
    edge_in: int = 17
    edge_out: int = 128

    @nn.compact
    def __call__(self, x_atoms, nf_bonds, batch):
        A, E = x_atoms.shape[0], nf_bonds.shape[0]

        # bond graph + self-loops carrying cos-angle 1.5 (gcn3.py:52-55)
        slb = jnp.arange(E, dtype=batch.bg_src.dtype)
        bsrc = jnp.concatenate([batch.bg_src, slb])
        bdst = jnp.concatenate([batch.bg_dst, slb])
        ea = jnp.concatenate(
            [batch.ea_bonds,
             1.5 * jnp.ones((E, 1), batch.ea_bonds.dtype)], axis=0)
        b_mask = jnp.concatenate([batch.bg_mask, batch.edge_mask])

        ea_emb = nn.Dense(self.edge_out, kernel_init=torch_linear_init,
                          name="edge_attr_bond_embed")(ea)
        nf_b = nn.Dense(self.edge_out, kernel_init=torch_linear_init,
                        name="edge_embed")(nf_bonds)
        msg_b = (ea_emb + nf_b[bsrc]) * b_mask[:, None]
        new_bond_features = (
            segment_sum(msg_b, bdst, E) * batch.edge_mask[:, None])

        # atom graph: additive message = edge_attr + h_src (gcn3.py:85-97)
        sl = jnp.arange(A, dtype=batch.edge_src.dtype)
        src = jnp.concatenate([batch.edge_src, sl])
        dst = jnp.concatenate([batch.edge_dst, sl])
        e_attr = jnp.concatenate(
            [new_bond_features, jnp.zeros((A, self.edge_out), x_atoms.dtype)],
            axis=0)
        e_mask = jnp.concatenate(
            [batch.edge_mask, jnp.ones((A,), x_atoms.dtype)])
        x = nn.Dense(self.atom_out, kernel_init=torch_linear_init,
                     name="atom_embed")(x_atoms)
        msg = (e_attr + x[src]) * e_mask[:, None]
        x_atoms_new = segment_sum(msg, dst, A) * batch.atom_mask[:, None]

        f0 = nn.Dense(2 * self.atom_out, kernel_init=torch_linear_init,
                      name="frag_mlp_0")
        f1 = nn.Dense(self.atom_out, kernel_init=torch_linear_init,
                      name="frag_mlp_1")
        x_frags_new = _frag_neighbor_mlp(x_atoms_new, batch, f0, f1)
        return x_atoms_new, x_frags_new


class _AblationEncoder(nn.Module):
    """Shared stack driver: dropout on raw inputs, ReLU between layers,
    raw bond-graph features re-fed to every layer (gat.py:160-180)."""

    kind: str = "gat"  # gat | gcn | gcn3
    num_layer: int = 4
    drop_ratio: float = 0.15
    emb_dim: int = 128
    atom_features: int = 167
    edge_features: int = 17

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        drop = nn.Dropout(rate=self.drop_ratio, deterministic=deterministic)
        x_atoms = drop(batch.x_atoms)
        for i in range(self.num_layer):
            a_in = self.atom_features if i == 0 else self.emb_dim
            if self.kind == "gat":
                layer = FragNetLayerV1(
                    atom_in=a_in, atom_out=self.emb_dim,
                    edge_in=self.edge_features, edge_out=self.emb_dim,
                    name=f"layers_{i}")
                x_atoms, x_frags = layer(x_atoms, batch.nf_bonds, batch)
            elif self.kind == "gcn3":
                layer = FragNetLayerGIN(
                    atom_in=a_in, atom_out=self.emb_dim,
                    edge_in=self.edge_features, edge_out=self.emb_dim,
                    name=f"layers_{i}")
                x_atoms, x_frags = layer(x_atoms, batch.nf_bonds, batch)
            else:
                layer = FragNetLayerGCNv1(
                    atom_in=a_in, atom_out=self.emb_dim,
                    edge_in=self.edge_features, edge_out=self.emb_dim,
                    name=f"layers_{i}")
                x_atoms, x_frags = layer(x_atoms, batch)
            x_atoms, x_frags = nn.relu(x_atoms), nn.relu(x_frags)
        return x_atoms, x_frags


class _AblationFineTune(nn.Module):
    """Shared finetune wrapper: pooled concat → lin1(2emb→2emb) → relu →
    dropout → out (gat.py:216-242, gcn.py:141-170, gcn3.py:216-246)."""

    kind: str = "gat"
    n_classes: int = 1
    num_layer: int = 4
    drop_ratio: float = 0.15
    emb_dim: int = 128
    atom_features: int = 167
    edge_features: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        x_atoms, x_frags = _AblationEncoder(
            kind=self.kind, num_layer=self.num_layer,
            drop_ratio=self.drop_ratio, emb_dim=self.emb_dim,
            atom_features=self.atom_features,
            edge_features=self.edge_features, name="pretrain",
        )(batch, deterministic=deterministic)
        G = batch.y.shape[0]
        fp = segment_sum(x_frags, batch.frag_batch, G, mask=batch.frag_mask)
        ap = segment_sum(x_atoms, batch.atom_batch, G, mask=batch.atom_mask)
        drop = nn.Dropout(rate=0.15, deterministic=deterministic)
        x = drop(jnp.concatenate([ap, fp], axis=1))
        x = nn.relu(nn.Dense(2 * self.emb_dim, kernel_init=torch_linear_init,
                             name="lin1")(x))
        x = drop(x)
        return nn.Dense(self.n_classes, kernel_init=torch_linear_init,
                        name="out")(x).astype(jnp.float32)


def FragNetFineTuneV1(**kw):
    return _AblationFineTune(kind="gat", **kw)


def FragNetFineTuneGCNv1(**kw):
    return _AblationFineTune(kind="gcn", **kw)


def FragNetFineTuneGIN(**kw):
    return _AblationFineTune(kind="gcn3", **kw)
