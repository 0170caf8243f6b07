"""Reference parity for the variant families: gcn2 (model/gcn/gcn2.py) and
the v1 GAT (model/gat/gat.py), run through the same torch shim as the main
harness. gcn3's reference FragNet.forward unpacks three values from a
two-value layer (gcn3.py:168) and cannot execute — excluded with this note.
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import numpy as np
import pytest
import torch

from fragnet_tpu.graphs.hiergraph import pad_batch
from fragnet_tpu.parity import load_reference_module, reference_batch
from fragnet_tpu.parity.refbatch import exact_padspec
from fragnet_tpu.train.checkpoint import import_torch_state_dict

ATOL = 2e-4
RTOL = 2e-4

# gcn2.py uses a flat `from gat2 import FTHead3, FTHead4` — alias the
# package-loaded gat2 module under that name first
sys.modules.setdefault(
    "gat2", load_reference_module("fragnet.model.gat.gat2"))
ref_gcn2 = load_reference_module("fragnet.model.gcn.gcn2")
ref_gat1 = load_reference_module("fragnet.model.gat.gat")


def _close(name, ref, mine, atol=ATOL, rtol=RTOL):
    ref = np.asarray(ref.detach() if hasattr(ref, "detach") else ref)
    mine = np.asarray(mine)[: ref.shape[0]]
    np.testing.assert_allclose(
        mine, ref, atol=atol, rtol=rtol, err_msg=f"stream {name} diverged")


@pytest.fixture(scope="module")
def graphs(ft_graphs):
    from fragnet_tpu.chem import engine
    from fragnet_tpu.graphs.build import GraphBuilder

    builder = GraphBuilder("exp1s")
    extra = []
    for s, y in [("CC", -1.0), ("CC.OCO", 0.1)]:
        mol, conf = engine.mol_3d(s)
        g = builder.build(mol, conf, [y], smiles=s)
        extra.append(g)
    return list(ft_graphs) + extra


def test_gcn2_finetune_parity(graphs):
    """Our gcn2 variant (variants.FragNetFineTuneGCN) computes the same
    function as the reference gcn2 FragNetFineTune (gcn2.py:159-192) on
    identical weights."""
    from fragnet_tpu.model.variants import FragNetFineTuneGCN

    torch.manual_seed(3)
    # emb_dim must be 128: the reference builds FTHead3 without input_dim
    # (gcn2.py:166-169), whose default assumes the 2x128 pooled concat
    ref = ref_gcn2.FragNetFineTune(
        n_classes=1, atom_features=167, frag_features=167, edge_features=17,
        num_layer=3, drop_ratio=0.15, emb_dim=128,
        h1=48, h2=32, h3=32, h4=16, act="celu", fthead="FTHead3",
    ).eval()

    mine = FragNetFineTuneGCN(
        n_classes=1, num_layer=3, drop_ratio=0.15, emb_dim=128,
        h1=48, h2=32, h3=32, h4=16, act="celu", fthead="FTHead3",
    )
    jbatch = pad_batch(graphs, exact_padspec(graphs))
    tbatch = reference_batch(graphs)
    tpl = mine.init(jax.random.PRNGKey(0), jbatch)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = import_torch_state_dict(sd, template=tpl, strict=True,
                                     family="gcn2")
    with torch.no_grad():
        ref_pred = ref(tbatch)
    my_pred = mine.apply(params, jbatch, deterministic=True)
    _close("gcn2 prediction", ref_pred, my_pred)


class _RefV1FineTune(torch.nn.Module):
    """Test harness replicating gat.py:216-242 (FragNetFineTune.forward)
    around a dimension-configurable v1 encoder — the reference class
    hard-codes 45/12 feature dims in its constructor (gat.py:221)."""

    def __init__(self, enc, emb=128, n_classes=1):
        super().__init__()
        self.pretrain = enc
        self.lin1 = torch.nn.Linear(emb * 2, emb * 2)
        self.out = torch.nn.Linear(emb * 2, n_classes)
        self.dropout = torch.nn.Dropout(p=0.15)
        self.activation = torch.nn.ReLU()

    def forward(self, batch):
        from fragnet_tpu.parity.torch_shim import scatter_add

        x_atoms, x_frags = self.pretrain(batch)
        fp = scatter_add(x_frags, batch["frag_batch"], dim=0)
        ap = scatter_add(x_atoms, batch["batch"], dim=0)
        x = self.dropout(torch.cat((ap, fp), 1))
        x = self.activation(self.lin1(x))
        x = self.dropout(x)
        return self.out(x)


def _truncate_bonds(jbatch, tbatch, dim=12):
    """v1 only supports bond dims divisible by 3 (gat.py:33 edge_in//3 and
    the hard-coded 12-wide self-loop attr at gat.py:88); truncate the
    17-dim exp1s bond features to the legacy 12."""
    jbatch = dataclasses.replace(
        jbatch,
        nf_bonds=jbatch.nf_bonds[:, :dim],
        edge_attr=jbatch.edge_attr[:, :dim],
    )
    tbatch = dict(tbatch)
    tbatch["node_features_bonds"] = tbatch["node_features_bonds"][:, :dim]
    tbatch["edge_attr"] = tbatch["edge_attr"][:, :dim]
    return jbatch, tbatch


def test_gat_v1_finetune_parity(graphs):
    from fragnet_tpu.model.ablations import FragNetFineTuneV1

    torch.manual_seed(5)
    enc = ref_gat1.FragNet(
        num_layer=4, drop_ratio=0.15, emb_dim=64,
        atom_features=167, frag_features=167, edge_features=12,
    )
    ref = _RefV1FineTune(enc, emb=64, n_classes=1).eval()

    mine = FragNetFineTuneV1(
        n_classes=1, num_layer=4, drop_ratio=0.15, emb_dim=64,
        atom_features=167, edge_features=12,
    )
    jbatch = pad_batch(graphs, exact_padspec(graphs))
    tbatch = reference_batch(graphs)
    jbatch, tbatch = _truncate_bonds(jbatch, tbatch)
    tpl = mine.init(jax.random.PRNGKey(0), jbatch)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = import_torch_state_dict(sd, template=tpl, strict=True,
                                     family="gat")
    with torch.no_grad():
        ref_pred = ref(tbatch)
    my_pred = mine.apply(params, jbatch, deterministic=True)
    _close("gat v1 prediction", ref_pred, my_pred)
