"""Model variants: gat2_lite, gat2_edge, gcn — the ablation family selectable
via ``model_version`` (reference: train/finetune/finetune_gat2.py:92-211).

* Lite (gat2_lite.py): atom + bond levels only; fragments are still pooled
  from atoms each layer (gat2_lite.py:140) but receive no message passing —
  the reference's mode "for very large graph structures"
  (finetune_gat2.py:141-143).
* Edge (gat2_edge.py): the fragment graph attends over transformed raw
  connection features (cnx_attr_transform, gat2_edge.py:34,142-145) instead
  of the learned fconn line graph. (The reference hard-codes the cnx input
  dim to 8; we take it from ``fedge_in`` — 6 for exp1s data.)
* GCN (gcn/gcn2.py): no attention; symmetric-degree-normalized atom
  convolution (self-loops included) + fragment sum + frag_mlp; raw edge
  features are embedded but unused in the message (gcn2.py:45-56 quirk kept).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fragnet_tpu.model.heads import FTHEADS
from fragnet_tpu.model.layers import torch_linear_init, xavier_gain
from fragnet_tpu.ops.segment import gat_attention_pass, segment_sum


# ---------------------------------------------------------------------------
# lite
# ---------------------------------------------------------------------------

class FragNetLayerLite(nn.Module):
    atom_in: int = 128
    atom_out: int = 128
    edge_in: int = 128
    edge_out: int = 128
    bond_edge_in: int = 1
    num_heads: int = 4

    @nn.compact
    def __call__(self, x_atoms, nf_bonds, batch):
        H = self.num_heads
        edge_out_ph = self.edge_out // H
        A, E = x_atoms.shape[0], nf_bonds.shape[0]

        ea_b = nn.Dense(edge_out_ph, kernel_init=torch_linear_init,
                        name="edge_attr_bond_embed")(batch.ea_bonds)
        ea_b = jnp.broadcast_to(ea_b[:, None, :], (ea_b.shape[0], H, edge_out_ph))
        nf_b = nn.Dense(edge_out_ph * H, kernel_init=xavier_gain,
                        name="projection_b")(nf_bonds).reshape(E, H, edge_out_ph)
        a_b = self.param("a_b", xavier_gain, (H, 3 * edge_out_ph))
        bond_out, _ = gat_attention_pass(
            nf_b, ea_b, batch.bg_src, batch.bg_dst, a_b, E, edge_mask=batch.bg_mask
        )
        new_bond_features = bond_out.reshape(E, -1) * batch.edge_mask[:, None]

        sl = jnp.arange(A, dtype=batch.edge_src.dtype)
        src = jnp.concatenate([batch.edge_src, sl])
        dst = jnp.concatenate([batch.edge_dst, sl])
        e_attr = jnp.concatenate(
            [new_bond_features, jnp.zeros((A, self.edge_out), x_atoms.dtype)], axis=0
        )
        e_mask = jnp.concatenate([batch.edge_mask, jnp.ones((A,), x_atoms.dtype)])
        atom_out_ph = self.atom_out // H
        nf_a = nn.Dense(atom_out_ph * H, kernel_init=torch_linear_init,
                        name="projection_a")(x_atoms).reshape(A, H, atom_out_ph)
        a = self.param("a", xavier_gain, (H, 2 * atom_out_ph + self.edge_out))
        e_attr_h = jnp.broadcast_to(e_attr[:, None, :], (e_attr.shape[0], H, self.edge_out))
        atom_feats, _ = gat_attention_pass(nf_a, e_attr_h, src, dst, a, A, edge_mask=e_mask)
        x_atoms_new = atom_feats.reshape(A, -1) * batch.atom_mask[:, None]

        F = batch.x_frags.shape[0]
        x_frags = segment_sum(x_atoms_new, batch.atom_to_frag, F)
        return x_atoms_new, x_frags, new_bond_features


class FragNetLite(nn.Module):
    num_layer: int = 4
    drop_ratio: float = 0.15
    emb_dim: int = 128
    atom_features: int = 167
    edge_features: int = 17
    num_heads: int = 4

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        drop = nn.Dropout(rate=self.drop_ratio, deterministic=deterministic)
        act = nn.relu
        x_atoms = drop(batch.x_atoms)
        layers = [
            FragNetLayerLite(
                atom_in=self.atom_features if i == 0 else self.emb_dim,
                atom_out=self.emb_dim,
                edge_in=self.edge_features if i == 0 else self.emb_dim,
                edge_out=self.emb_dim,
                num_heads=self.num_heads,
                name=f"layers_{i}",
            )
            for i in range(self.num_layer)
        ]
        x_atoms, x_frags, edge_f = layers[0](x_atoms, batch.nf_bonds, batch)
        x_atoms, x_frags = act(drop(x_atoms)), act(drop(x_frags))
        edge_f = act(drop(edge_f))
        for layer in layers[1:]:
            x_atoms, x_frags, edge_f = layer(x_atoms, edge_f, batch)
            x_atoms, x_frags = act(drop(x_atoms)), act(drop(x_frags))
            edge_f = act(drop(edge_f))
        return x_atoms, x_frags, edge_f


# ---------------------------------------------------------------------------
# edge variant
# ---------------------------------------------------------------------------

class FragNetLayerEdge(nn.Module):
    atom_in: int = 128
    atom_out: int = 128
    edge_in: int = 128
    edge_out: int = 128
    cnx_in: int = 6
    bond_edge_in: int = 1
    num_heads: int = 4
    add_frag_self_loops: bool = False

    @nn.compact
    def __call__(self, x_atoms, nf_bonds, batch):
        H = self.num_heads
        edge_out_ph = self.edge_out // H
        A, E = x_atoms.shape[0], nf_bonds.shape[0]

        ea_b = nn.Dense(edge_out_ph, kernel_init=torch_linear_init,
                        name="edge_attr_bond_embed")(batch.ea_bonds)
        ea_b = jnp.broadcast_to(ea_b[:, None, :], (ea_b.shape[0], H, edge_out_ph))
        nf_b = nn.Dense(edge_out_ph * H, kernel_init=xavier_gain,
                        name="projection_b")(nf_bonds).reshape(E, H, edge_out_ph)
        a_b = self.param("a_b", xavier_gain, (H, 3 * edge_out_ph))
        bond_out, _ = gat_attention_pass(
            nf_b, ea_b, batch.bg_src, batch.bg_dst, a_b, E, edge_mask=batch.bg_mask
        )
        new_bond_features = bond_out.reshape(E, -1) * batch.edge_mask[:, None]

        sl = jnp.arange(A, dtype=batch.edge_src.dtype)
        src = jnp.concatenate([batch.edge_src, sl])
        dst = jnp.concatenate([batch.edge_dst, sl])
        e_attr = jnp.concatenate(
            [new_bond_features, jnp.zeros((A, self.edge_out), x_atoms.dtype)], axis=0
        )
        e_mask = jnp.concatenate([batch.edge_mask, jnp.ones((A,), x_atoms.dtype)])
        atom_out_ph = self.atom_out // H
        nf_a = nn.Dense(atom_out_ph * H, kernel_init=torch_linear_init,
                        name="projection_a")(x_atoms).reshape(A, H, atom_out_ph)
        a = self.param("a", xavier_gain, (H, 2 * atom_out_ph + self.edge_out))
        e_attr_h = jnp.broadcast_to(e_attr[:, None, :], (e_attr.shape[0], H, self.edge_out))
        atom_feats, _ = gat_attention_pass(nf_a, e_attr_h, src, dst, a, A, edge_mask=e_mask)
        x_atoms_new = atom_feats.reshape(A, -1) * batch.atom_mask[:, None]

        F = batch.x_frags.shape[0]
        x_frags = segment_sum(x_atoms_new, batch.atom_to_frag, F)

        # fragment graph over transformed RAW connection attrs (gat2_edge.py:142-145)
        frag_src, frag_dst, fconn_mask = batch.frag_src, batch.frag_dst, batch.fconn_mask
        cnx = nn.Dense(self.edge_out, kernel_init=torch_linear_init,
                       name="cnx_attr_transform")(batch.cnx_attr)
        if self.add_frag_self_loops:
            slf = jnp.arange(F, dtype=frag_src.dtype)
            frag_src = jnp.concatenate([frag_src, slf])
            frag_dst = jnp.concatenate([frag_dst, slf])
            cnx = jnp.concatenate([cnx, jnp.zeros((F, self.edge_out), cnx.dtype)])
            fconn_mask = jnp.concatenate([fconn_mask, jnp.ones((F,), fconn_mask.dtype)])
        nf_f = x_frags.reshape(F, H, -1)
        f = self.param("f", xavier_gain, (H, 2 * (self.atom_out // H) + self.edge_out))
        cnx_h = jnp.broadcast_to(cnx[:, None, :], (cnx.shape[0], H, self.edge_out))
        frag_out, _ = gat_attention_pass(
            nf_f, cnx_h, frag_src, frag_dst, f, F, edge_mask=fconn_mask
        )
        x_frags_new = frag_out.reshape(F, -1) * batch.frag_mask[:, None]
        return x_atoms_new, x_frags_new, new_bond_features


class FragNetEdge(nn.Module):
    num_layer: int = 4
    drop_ratio: float = 0.15
    emb_dim: int = 128
    atom_features: int = 167
    edge_features: int = 17
    cnx_in: int = 6
    num_heads: int = 4
    add_frag_self_loops: bool = False

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        drop = nn.Dropout(rate=self.drop_ratio, deterministic=deterministic)
        act = nn.relu
        x_atoms = drop(batch.x_atoms)
        layers = [
            FragNetLayerEdge(
                atom_in=self.atom_features if i == 0 else self.emb_dim,
                atom_out=self.emb_dim,
                edge_in=self.edge_features if i == 0 else self.emb_dim,
                edge_out=self.emb_dim,
                cnx_in=self.cnx_in,
                num_heads=self.num_heads,
                add_frag_self_loops=self.add_frag_self_loops,
                name=f"layers_{i}",
            )
            for i in range(self.num_layer)
        ]
        x_atoms, x_frags, edge_f = layers[0](x_atoms, batch.nf_bonds, batch)
        x_atoms, x_frags = act(drop(x_atoms)), act(drop(x_frags))
        edge_f = act(drop(edge_f))
        for layer in layers[1:]:
            x_atoms, x_frags, edge_f = layer(x_atoms, edge_f, batch)
            x_atoms, x_frags = act(drop(x_atoms)), act(drop(x_frags))
            edge_f = act(drop(edge_f))
        return x_atoms, x_frags, edge_f


# ---------------------------------------------------------------------------
# gcn
# ---------------------------------------------------------------------------

class FragNetLayerGCN(nn.Module):
    atom_in: int = 128
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
            [batch.edge_mask, jnp.ones((A,), x_atoms.dtype)]
        )

        x = nn.Dense(self.atom_out, kernel_init=torch_linear_init,
                     name="atom_embed")(x_atoms)
        # edge embed exists but is unused in the message (gcn2.py quirk)
        _ = nn.Dense(self.edge_out, kernel_init=torch_linear_init,
                     name="edge_embed")(batch.edge_attr)

        deg = segment_sum(e_mask, src, A)
        dis = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        norm = dis[src] * dis[dst] * e_mask
        msg = x[src] * norm[:, None]
        x_atoms_new = segment_sum(msg, dst, A) * batch.atom_mask[:, None]

        F = batch.x_frags.shape[0]
        x_frags = segment_sum(x_atoms_new, batch.atom_to_frag, F)
        fmsg = x_frags[batch.frag_src] * batch.fconn_mask[:, None]
        frag_sum = segment_sum(fmsg, batch.frag_dst, F)
        h = nn.Dense(2 * self.atom_out, kernel_init=torch_linear_init,
                     name="frag_mlp_0")(frag_sum)
        x_frags_new = nn.Dense(self.atom_out, kernel_init=torch_linear_init,
                               name="frag_mlp_1")(nn.relu(h))
        x_frags_new = x_frags_new * batch.frag_mask[:, None]
        return x_atoms_new, x_frags_new


class FragNetGCN(nn.Module):
    num_layer: int = 4
    drop_ratio: float = 0.15
    emb_dim: int = 128
    atom_features: int = 167
    edge_features: int = 17

    @nn.compact
    def __call__(self, batch, deterministic: bool = True):
        drop = nn.Dropout(rate=self.drop_ratio, deterministic=deterministic)
        act = nn.relu
        x_atoms = drop(batch.x_atoms)
        layers = [
            FragNetLayerGCN(
                atom_in=self.atom_features if i == 0 else self.emb_dim,
                atom_out=self.emb_dim,
                edge_in=self.edge_features,
                edge_out=self.emb_dim,
                name=f"layers_{i}",
            )
            for i in range(self.num_layer)
        ]
        x_atoms, x_frags = layers[0](x_atoms, batch)
        x_atoms, x_frags = act(drop(x_atoms)), act(drop(x_frags))
        for layer in layers[1:]:
            x_atoms, x_frags = layer(x_atoms, batch)
            x_atoms, x_frags = act(drop(x_atoms)), act(drop(x_frags))
        return x_atoms, x_frags


# ---------------------------------------------------------------------------
# finetune wrappers
# ---------------------------------------------------------------------------

class _PooledHead(nn.Module):
    n_classes: int = 1
    emb_dim: int = 128
    h1: int = 256
    h2: int = 256
    h3: int = 256
    h4: int = 256
    act: str = "celu"
    drop_ratio: float = 0.15
    fthead: str = "FTHead3"

    def build_head(self):
        cls = FTHEADS[self.fthead]
        if self.fthead == "FTHead3":
            return cls(n_classes=self.n_classes, input_dim=self.emb_dim,
                       h1=self.h1, h2=self.h2, h3=self.h3, h4=self.h4,
                       drop_ratio=self.drop_ratio, act=self.act)
        if self.fthead == "FTHead4":
            return cls(n_classes=self.n_classes, h1=self.h1,
                       drop_ratio=self.drop_ratio, act=self.act)
        if self.fthead == "FTHead2":
            return cls(n_classes=self.n_classes, input_dim=self.emb_dim)
        if self.fthead == "FTHead5":
            return cls(n_classes=self.n_classes, input_dim=self.emb_dim,
                       h1=self.h1, h2=self.h2, drop_ratio=self.drop_ratio,
                       act=self.act)
        return cls(n_classes=self.n_classes)

    def pool_and_predict(self, x_atoms, x_frags, batch, head, deterministic):
        G = batch.y.shape[0]
        fp = segment_sum(x_frags, batch.frag_batch, G, mask=batch.frag_mask)
        ap = segment_sum(x_atoms, batch.atom_batch, G, mask=batch.atom_mask)
        return head(jnp.concatenate([ap, fp], axis=1), deterministic=deterministic)


class FragNetFineTuneLite(_PooledHead):
    num_layer: int = 4
    num_heads: int = 4
    atom_features: int = 167
    frag_features: int = 167
    edge_features: int = 17
    fedge_in: int = 6
    fbond_edge_in: int = 6

    def setup(self):
        self.pretrain = FragNetLite(
            num_layer=self.num_layer, drop_ratio=self.drop_ratio,
            emb_dim=self.emb_dim, atom_features=self.atom_features,
            edge_features=self.edge_features, num_heads=self.num_heads,
        )
        self.head = self.build_head()

    def __call__(self, batch, deterministic: bool = True):
        x_atoms, x_frags, _ = self.pretrain(batch, deterministic=deterministic)
        return self.pool_and_predict(x_atoms, x_frags, batch, self.head,
                                     deterministic)


class FragNetFineTuneEdge(_PooledHead):
    num_layer: int = 4
    num_heads: int = 4
    atom_features: int = 167
    frag_features: int = 167
    edge_features: int = 17
    fedge_in: int = 6
    fbond_edge_in: int = 6

    def setup(self):
        self.pretrain = FragNetEdge(
            num_layer=self.num_layer, drop_ratio=self.drop_ratio,
            emb_dim=self.emb_dim, atom_features=self.atom_features,
            edge_features=self.edge_features, cnx_in=self.fedge_in,
            num_heads=self.num_heads,
        )
        self.head = self.build_head()

    def __call__(self, batch, deterministic: bool = True):
        x_atoms, x_frags, _ = self.pretrain(batch, deterministic=deterministic)
        return self.pool_and_predict(x_atoms, x_frags, batch, self.head,
                                     deterministic)


class FragNetFineTuneGCN(_PooledHead):
    num_layer: int = 4
    num_heads: int = 4  # unused; kept for a uniform constructor surface
    atom_features: int = 167
    frag_features: int = 167
    edge_features: int = 17
    fedge_in: int = 6
    fbond_edge_in: int = 6

    def setup(self):
        self.pretrain = FragNetGCN(
            num_layer=self.num_layer, drop_ratio=self.drop_ratio,
            emb_dim=self.emb_dim, atom_features=self.atom_features,
            edge_features=self.edge_features,
        )
        self.head = self.build_head()

    def __call__(self, batch, deterministic: bool = True):
        x_atoms, x_frags = self.pretrain(batch, deterministic=deterministic)
        return self.pool_and_predict(x_atoms, x_frags, batch, self.head,
                                     deterministic)
