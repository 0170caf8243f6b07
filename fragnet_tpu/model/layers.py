"""FragNetLayer — the four-level attention layer as one pure function.

Re-designs fragnet/model/gat/gat2.py:40-330 (FragNetLayerA.forward) for TPU:
all five passes (bond-graph GAT → atom-graph GAT with self-loops → atom→frag
pooling → fconn-graph GAT → frag-graph GAT) are masked segment ops over
static-shape arrays; interpretability masks are traced index arguments
(vmap-able) instead of module mutation; attention vectors are always computed
and returned (XLA dead-code-eliminates them when unused).

Parameter parity notes (for the torch-checkpoint importer):
  * projection_b/a/fb, edge_attr_bond_embed, edge_attr_fbond_embed and the
    attention vectors a_b/a/f/f_a_b map 1:1 to the reference names.
  * The reference also constructs modules that never affect forward
    (atom_embed, frag_embed, edge_embed, bond_edge_embed, frag_message_mlp,
    atom_mlp, frag_mlp, bias, edge_attr_bond_embed2 — gat2.py:64-85); this
    layer does not create them, and the importer skips their entries.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

import os as _os

from fragnet_tpu.ops.dense_gat import dense_attr_gat_pass, dense_gat_pass

# Dense-kernel strategy knobs, defaults = the measured v5e optimum
# (BASELINE.md r4 experiment log):
#  * atom/frag (dynamic edge attrs): TCSR k_src=1 beats the dense-attr
#    kernel through the train step (47.2M vs 42.1M edges/s — the attr
#    backward needs a re-accumulate + a separate emit kernel), so
#    FRAGNET_DENSE_ATTR defaults OFF; the kernel stays available.
#  * bond: host-precomputed value planes ("planes"); the "attr" mode HUNG
#    on-device at bond-level shapes — do not enable it there.
#  * fconn: "planes" measured 49.3M vs "attr" 47.8M through the train step
#    once the parallel tile-dim semantics fixed the 7-plane DMA pathology.
_DENSE_ATTR = _os.environ.get("FRAGNET_DENSE_ATTR", "0") == "1"
_DENSE_BOND_MODE = _os.environ.get("FRAGNET_DENSE_BOND", "planes")
_DENSE_FC_MODE = _os.environ.get("FRAGNET_DENSE_FC", "planes")
from fragnet_tpu.ops.ell import ell_gat_pass
from fragnet_tpu.ops.pallas_gat import pallas_gat_pass, pallas_gat_pass_ep
from fragnet_tpu.ops.tcsr import EPTileMeta, TileMeta
from fragnet_tpu.ops.segment import gat_attention_pass, segment_sum

# torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_linear_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)
# xavier_uniform with gain 1.414 (reference gat2.py:111-115)
xavier_gain = nn.initializers.variance_scaling(
    2.0 * 1.414**2, "fan_avg", "uniform"
)


def _zero_rows(x: jnp.ndarray, idx: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Zero row(s) ``idx`` of x; idx < 0 (or None) is a no-op. Traced-friendly:
    uses a one-hot mask so it vmaps over attribution indices."""
    if idx is None:
        return x
    idx = jnp.asarray(idx)
    if idx.ndim == 0:
        idx = idx[None]
    hit = jnp.zeros((x.shape[0],), dtype=x.dtype)
    for k in range(idx.shape[0]):
        hit = hit + jax.nn.one_hot(idx[k], x.shape[0], dtype=x.dtype)
    return x * (1.0 - jnp.clip(hit, 0.0, 1.0))[:, None]


@struct.dataclass
class LayerHooks:
    """Interpretability masks, all optional traced values (−1 = disabled).

    * bond_mask:      zero bond-feature rows k, k+1      (gat2.py:171-177)
    * frag_bond_mask: zero fconn rows 2k, 2k+1           (gat2.py:274-278)
    * atom_mask:      zero one atom's hidden state       (gat2.py:227-232)
    * atom_zero_vec:  (A,) float mask; 1 → zero that atom's hidden state —
      the multi-atom form used by fragment attribution
      (vizualize/model_attr.py:115-133 zeroes whole-fragment atom sets)
    """

    bond_mask: Optional[jnp.ndarray] = None
    frag_bond_mask: Optional[jnp.ndarray] = None
    atom_mask: Optional[jnp.ndarray] = None
    atom_zero_vec: Optional[jnp.ndarray] = None


@struct.dataclass
class LayerAttn:
    atoms: jnp.ndarray   # (A, H) summed attention by source
    frags: jnp.ndarray   # (F, H)
    bonds: jnp.ndarray   # (E, H)
    fbonds: jnp.ndarray  # (C, H)


class FragNetLayer(nn.Module):
    """One four-level message-passing layer.

    ``dtype`` sets the activation/compute precision (params stay fp32;
    softmax logits are always fp32). bfloat16 halves HBM traffic on this
    bandwidth-bound workload."""

    atom_in: int = 128
    atom_out: int = 128
    edge_in: int = 128
    edge_out: int = 128
    fedge_in: int = 128
    bond_edge_in: int = 1
    fbond_edge_in: int = 6
    num_heads: int = 4
    dtype: Any = jnp.float32
    # edge-partitioned mode (dist/edge_partition.py): this layer runs inside
    # shard_map over mesh axis ``ep_axis`` with the per-level EDGE arrays
    # sharded and all node-space state replicated; segment stats combine via
    # pmax/psum (SURVEY.md §5.7 — the north-star scale-out mode).
    ep_axis: Any = None

    @nn.compact
    def __call__(
        self,
        x_atoms: jnp.ndarray,      # (A, atom_in)
        nf_bonds: jnp.ndarray,     # (E, edge_in) bond-graph node features
        nf_fbonds: jnp.ndarray,    # (C, fedge_in) fconn-graph node features
        batch,                     # HierGraphBatch (indices + masks + attrs)
        hooks: Optional[LayerHooks] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, LayerAttn]:
        hooks = hooks or LayerHooks()
        dt = self.dtype
        x_atoms = x_atoms.astype(dt)
        nf_bonds = nf_bonds.astype(dt)
        nf_fbonds = nf_fbonds.astype(dt)
        edge_mask = batch.edge_mask.astype(dt)
        atom_mask = batch.atom_mask.astype(dt)
        frag_mask = batch.frag_mask.astype(dt)
        fconn_mask = batch.fconn_mask.astype(dt)
        H = self.num_heads
        edge_out_ph = self.edge_out // H
        atom_out_ph = self.atom_out // H
        A = x_atoms.shape[0]
        E = nf_bonds.shape[0]
        C = nf_fbonds.shape[0]

        # ---- pass 1: bond-graph GAT (gat2.py:137-169) --------------------
        emb_b = nn.Dense(edge_out_ph, kernel_init=torch_linear_init, dtype=dt,
                         name="edge_attr_bond_embed")
        ea_b = emb_b(batch.ea_bonds.astype(dt))      # (EB, Dp)
        nf_b = nn.Dense(edge_out_ph * H, kernel_init=xavier_gain, dtype=dt,
                        name="projection_b")(nf_bonds)
        nf_b = nf_b.reshape(E, H, edge_out_ph)
        a_b = self.param("a_b", xavier_gain, (H, 3 * edge_out_ph))
        if self.ep_axis is None and batch.dp_bond is not None \
                and _DENSE_BOND_MODE == "attr" \
                and isinstance(batch.tm_bond, TileMeta):
            # adjacency-only dense kernel; w_ea scattered in-kernel
            tn_b = batch.dp_bond.shape[2]
            bond_out, attn_bonds = dense_attr_gat_pass(
                nf_b, ea_b, batch.bg_src, batch.bg_dst, batch.bg_mask,
                a_b, jax.lax.slice_in_dim(batch.dp_bond, 0, tn_b, axis=1),
                batch.tm_bond,
            )
        elif self.ep_axis is None and batch.dp_bond is not None:
            # dense zero-gather kernel (ops/dense_gat.py): the raw bond-graph
            # edge attr is the 1-dim cos-angle, so the embed Dense + a_ea
            # fold to (v, c) — basis-applied through the SAME module so
            # autodiff reaches its params
            Rb = batch.ea_bonds.shape[1]
            bias_row = emb_b(jnp.zeros((1, Rb), dt))
            Wt = emb_b(jnp.eye(Rb, dtype=dt)) - bias_row           # (Rb, Dp)
            a_ea = a_b[:, edge_out_ph:2 * edge_out_ph]
            v = Wt.astype(jnp.float32) @ a_ea.T.astype(jnp.float32)
            c = (bias_row.astype(jnp.float32)
                 @ a_ea.T.astype(jnp.float32)).reshape(H)
            bond_out, attn_bonds = dense_gat_pass(
                nf_b, batch.dp_bond, v, c, ea_b,
                batch.bg_src, batch.bg_dst, batch.bg_mask, a_b,
            )
        elif self.ep_axis is not None and isinstance(batch.tm_bond, EPTileMeta):
            # fused TCSR kernel on this shard's edge range + mesh combine
            bond_out, attn_bonds = pallas_gat_pass_ep(
                nf_b, ea_b, batch.bg_src, batch.bg_dst, batch.bg_mask,
                a_b, batch.tm_bond, axis=self.ep_axis,
            )
        elif self.ep_axis is not None:
            ea_bh = jnp.broadcast_to(
                ea_b[:, None, :], (ea_b.shape[0], H, edge_out_ph))
            bond_out, attn_bonds = gat_attention_pass(
                nf_b, ea_bh, batch.bg_src, batch.bg_dst, a_b, E,
                edge_mask=batch.bg_mask, axis_name=self.ep_axis,
            )
        elif isinstance(batch.tm_bond, TileMeta):
            bond_out, attn_bonds = pallas_gat_pass(
                nf_b, ea_b, batch.bg_src, batch.bg_dst, batch.bg_mask,
                a_b, batch.tm_bond,
            )
        elif batch.bg_nbr_edge is not None:
            bond_out, attn_bonds = ell_gat_pass(
                nf_b, ea_b, batch.bg_src, batch.bg_nbr_edge,
                batch.bg_nbr_mask, a_b, num_src_nodes=E,
            )
        else:
            ea_bh = jnp.broadcast_to(
                ea_b[:, None, :], (ea_b.shape[0], H, edge_out_ph)
            )
            bond_out, attn_bonds = gat_attention_pass(
                nf_b, ea_bh, batch.bg_src, batch.bg_dst, a_b, E,
                edge_mask=batch.bg_mask,
            )
        new_bond_features = bond_out.reshape(E, -1)
        new_bond_features = _zero_rows(
            new_bond_features,
            None if hooks.bond_mask is None
            else jnp.stack([hooks.bond_mask, hooks.bond_mask + 1]),
        )
        new_bond_features = new_bond_features * edge_mask[:, None]

        # ---- pass 2: atom-graph GAT with self-loops (gat2.py:178-224) ----
        # self-loops appended after real edges, zero edge attrs (gat2.py:179-185)
        sl = jnp.arange(A, dtype=batch.edge_src.dtype)
        src = jnp.concatenate([batch.edge_src, sl])
        dst = jnp.concatenate([batch.edge_dst, sl])
        if self.ep_axis is None:
            e_attr = jnp.concatenate(
                [new_bond_features, jnp.zeros((A, self.edge_out), x_atoms.dtype)], axis=0
            )
            e_mask = jnp.concatenate([batch.edge_mask, jnp.ones((A,), x_atoms.dtype)])
        else:
            # local slice of the replicated E-space bond features; self-loop
            # block participates on shard 0 only (exactly once globally)
            Es = batch.edge_src.shape[0]
            aidx = jax.lax.axis_index(self.ep_axis)
            e_attr = jnp.concatenate([
                jax.lax.dynamic_slice_in_dim(new_bond_features, aidx * Es, Es),
                jnp.zeros((A, self.edge_out), x_atoms.dtype),
            ], axis=0)
            sl_on = (aidx == 0).astype(x_atoms.dtype)
            e_mask = jnp.concatenate([
                jax.lax.dynamic_slice_in_dim(edge_mask, aidx * Es, Es),
                jnp.full((A,), 1.0, x_atoms.dtype) * sl_on,
            ])

        nf_a = nn.Dense(atom_out_ph * H, kernel_init=torch_linear_init, dtype=dt,
                        name="projection_a")(x_atoms)
        nf_a = nf_a.reshape(A, H, atom_out_ph)
        a = self.param("a", xavier_gain, (H, 2 * atom_out_ph + self.edge_out))
        if self.ep_axis is not None and isinstance(batch.tm_atom, EPTileMeta):
            # local slice of the replicated E-space bond features; the
            # appended self-loops are folded analytically in the combine
            Es = batch.edge_src.shape[0]
            aidx = jax.lax.axis_index(self.ep_axis)
            nb_local = jax.lax.dynamic_slice_in_dim(
                new_bond_features, aidx * Es, Es)
            atom_out_feats, attn_atoms_full = pallas_gat_pass_ep(
                nf_a, nb_local, batch.edge_src, batch.edge_dst,
                jax.lax.dynamic_slice_in_dim(edge_mask, aidx * Es, Es),
                a, batch.tm_atom, axis=self.ep_axis, self_loops=True,
            )
        elif self.ep_axis is not None:
            e_attr_h = jnp.broadcast_to(
                e_attr[:, None, :], (e_attr.shape[0], H, self.edge_out))
            atom_out_feats, attn_atoms_full = gat_attention_pass(
                nf_a, e_attr_h, src, dst, a, A, edge_mask=e_mask,
                axis_name=self.ep_axis,
            )
        elif _DENSE_ATTR and batch.dp_atom is not None \
                and isinstance(batch.tm_atom, TileMeta):
            # dense per-tile kernel with in-kernel edge-attr scatter
            # (ops/dense_gat.py); self-loops folded analytically
            atom_out_feats, attn_atoms_full = dense_attr_gat_pass(
                nf_a, new_bond_features, batch.edge_src, batch.edge_dst,
                batch.edge_mask, a, batch.dp_atom, batch.tm_atom,
                self_loops=True,
            )
        elif isinstance(batch.tm_atom, TileMeta):
            # self-loops (zero edge attrs, gat2.py:179-185) folded in-kernel
            atom_out_feats, attn_atoms_full = pallas_gat_pass(
                nf_a, new_bond_features, batch.edge_src, batch.edge_dst,
                batch.edge_mask, a, batch.tm_atom, self_loops=True,
            )
        elif batch.atom_nbr_edge is not None:
            atom_out_feats, attn_atoms_full = ell_gat_pass(
                nf_a, e_attr, src, batch.atom_nbr_edge,
                batch.atom_nbr_mask, a, num_src_nodes=A,
            )
        else:
            e_attr_h = jnp.broadcast_to(
                e_attr[:, None, :], (e_attr.shape[0], H, self.edge_out)
            )
            atom_out_feats, attn_atoms_full = gat_attention_pass(
                nf_a, e_attr_h, src, dst, a, A, edge_mask=e_mask,
            )
        x_atoms_new = atom_out_feats.reshape(A, -1)
        x_atoms_new = _zero_rows(x_atoms_new, hooks.atom_mask)
        if hooks.atom_zero_vec is not None:
            x_atoms_new = x_atoms_new * (1.0 - hooks.atom_zero_vec)[:, None]
        x_atoms_new = x_atoms_new * atom_mask[:, None]

        # ---- pass 3: atom → fragment pooling (gat2.py:234) ----------------
        # NOTE: incoming fragment state is recomputed from atoms every layer
        # (the reference overwrites its x_frags argument).
        F = batch.x_frags.shape[0]
        x_frags = segment_sum(x_atoms_new, batch.atom_to_frag, F)

        # ---- pass 4: fconn-graph GAT (gat2.py:238-278) --------------------
        emb_fb = nn.Dense(edge_out_ph, kernel_init=torch_linear_init,
                          dtype=dt, name="edge_attr_fbond_embed")
        ea_fb = emb_fb(batch.ea_fbonds.astype(dt))
        nf_fb = nn.Dense(edge_out_ph * H, kernel_init=torch_linear_init, dtype=dt,
                         name="projection_fb")(nf_fbonds)
        nf_fb = nf_fb.reshape(C, H, edge_out_ph)
        f_a_b = self.param("f_a_b", xavier_gain, (H, 3 * edge_out_ph))
        if self.ep_axis is None and batch.dp_fc is not None \
                and _DENSE_FC_MODE == "attr" \
                and isinstance(batch.tm_fc, TileMeta):
            tn_f = batch.dp_fc.shape[2]
            fbond_out, attn_fbonds = dense_attr_gat_pass(
                nf_fb, ea_fb, batch.fc_src, batch.fc_dst, batch.fc_mask,
                f_a_b, jax.lax.slice_in_dim(batch.dp_fc, 0, tn_f, axis=1),
                batch.tm_fc,
            )
        elif self.ep_axis is None and batch.dp_fc is not None:
            # dense zero-gather kernel: raw fconn attrs are the 6-dim
            # connection one-hot sums → rank-6 (v, c) fold
            Rf = batch.ea_fbonds.shape[1]
            bias_row = emb_fb(jnp.zeros((1, Rf), dt))
            Wt = emb_fb(jnp.eye(Rf, dtype=dt)) - bias_row
            a_ea = f_a_b[:, edge_out_ph:2 * edge_out_ph]
            v = Wt.astype(jnp.float32) @ a_ea.T.astype(jnp.float32)
            c = (bias_row.astype(jnp.float32)
                 @ a_ea.T.astype(jnp.float32)).reshape(H)
            fbond_out, attn_fbonds = dense_gat_pass(
                nf_fb, batch.dp_fc, v, c, ea_fb,
                batch.fc_src, batch.fc_dst, batch.fc_mask, f_a_b,
            )
        elif self.ep_axis is not None and isinstance(batch.tm_fc, EPTileMeta):
            fbond_out, attn_fbonds = pallas_gat_pass_ep(
                nf_fb, ea_fb, batch.fc_src, batch.fc_dst, batch.fc_mask,
                f_a_b, batch.tm_fc, axis=self.ep_axis,
            )
        elif self.ep_axis is not None:
            ea_fbh = jnp.broadcast_to(
                ea_fb[:, None, :], (ea_fb.shape[0], H, edge_out_ph))
            fbond_out, attn_fbonds = gat_attention_pass(
                nf_fb, ea_fbh, batch.fc_src, batch.fc_dst, f_a_b, C,
                edge_mask=batch.fc_mask, axis_name=self.ep_axis,
            )
        elif isinstance(batch.tm_fc, TileMeta):
            fbond_out, attn_fbonds = pallas_gat_pass(
                nf_fb, ea_fb, batch.fc_src, batch.fc_dst, batch.fc_mask,
                f_a_b, batch.tm_fc,
            )
        elif batch.fc_nbr_edge is not None:
            fbond_out, attn_fbonds = ell_gat_pass(
                nf_fb, ea_fb, batch.fc_src, batch.fc_nbr_edge,
                batch.fc_nbr_mask, f_a_b, num_src_nodes=C,
            )
        else:
            ea_fbh = jnp.broadcast_to(
                ea_fb[:, None, :], (ea_fb.shape[0], H, edge_out_ph)
            )
            fbond_out, attn_fbonds = gat_attention_pass(
                nf_fb, ea_fbh, batch.fc_src, batch.fc_dst, f_a_b, C,
                edge_mask=batch.fc_mask,
            )
        new_fbond_features = fbond_out.reshape(C, -1)
        new_fbond_features = _zero_rows(
            new_fbond_features,
            None if hooks.frag_bond_mask is None
            else jnp.stack([2 * hooks.frag_bond_mask, 2 * hooks.frag_bond_mask + 1]),
        )
        new_fbond_features = new_fbond_features * fconn_mask[:, None]

        # ---- pass 5: frag-graph GAT (gat2.py:283-316) ---------------------
        # fragment node features enter per-head WITHOUT projection
        nf_f = x_frags.reshape(F, H, -1)
        f = self.param("f", xavier_gain, (H, 2 * (self.atom_out // H) + self.edge_out))
        if self.ep_axis is not None and isinstance(batch.tm_frag, EPTileMeta):
            Cs = batch.frag_src.shape[0]
            aidx = jax.lax.axis_index(self.ep_axis)
            frag_out, attn_frags = pallas_gat_pass_ep(
                nf_f,
                jax.lax.dynamic_slice_in_dim(new_fbond_features, aidx * Cs, Cs),
                batch.frag_src, batch.frag_dst,
                jax.lax.dynamic_slice_in_dim(fconn_mask, aidx * Cs, Cs),
                f, batch.tm_frag, axis=self.ep_axis,
            )
        elif self.ep_axis is not None:
            Cs = batch.frag_src.shape[0]
            aidx = jax.lax.axis_index(self.ep_axis)
            fb_local = jax.lax.dynamic_slice_in_dim(
                new_fbond_features, aidx * Cs, Cs)
            fm_local = jax.lax.dynamic_slice_in_dim(fconn_mask, aidx * Cs, Cs)
            fb_attr_h = jnp.broadcast_to(
                fb_local[:, None, :], (Cs, H, self.edge_out))
            frag_out, attn_frags = gat_attention_pass(
                nf_f, fb_attr_h, batch.frag_src, batch.frag_dst, f, F,
                edge_mask=fm_local, axis_name=self.ep_axis,
            )
        elif _DENSE_ATTR and batch.dp_frag is not None \
                and isinstance(batch.tm_frag, TileMeta):
            frag_out, attn_frags = dense_attr_gat_pass(
                nf_f, new_fbond_features, batch.frag_src, batch.frag_dst,
                batch.fconn_mask, f, batch.dp_frag, batch.tm_frag,
            )
        elif isinstance(batch.tm_frag, TileMeta):
            frag_out, attn_frags = pallas_gat_pass(
                nf_f, new_fbond_features, batch.frag_src, batch.frag_dst,
                batch.fconn_mask, f, batch.tm_frag,
            )
        elif batch.frag_nbr_edge is not None:
            frag_out, attn_frags = ell_gat_pass(
                nf_f, new_fbond_features, batch.frag_src,
                batch.frag_nbr_edge, batch.frag_nbr_mask, f, num_src_nodes=F,
            )
        else:
            fb_attr_h = jnp.broadcast_to(
                new_fbond_features[:, None, :],
                (new_fbond_features.shape[0], H, self.edge_out),
            )
            frag_out, attn_frags = gat_attention_pass(
                nf_f, fb_attr_h, batch.frag_src, batch.frag_dst, f, F,
                edge_mask=batch.fconn_mask,
            )
        x_frags_new = frag_out.reshape(F, -1)
        x_frags_new = x_frags_new * frag_mask[:, None]

        attn = LayerAttn(
            atoms=attn_atoms_full[:, :],  # includes self-loop contributions
            frags=attn_frags,
            bonds=attn_bonds,
            fbonds=attn_fbonds,
        )
        return x_atoms_new, x_frags_new, new_bond_features, new_fbond_features, attn
