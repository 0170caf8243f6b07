"""Reference parity harness (SURVEY.md §6 north-star gate).

Runs the UNMODIFIED reference model (/root/reference/fragnet/model/gat/gat2.py,
pretrain_heads.py) on CPU torch via the torch_scatter/PyG shim
(fragnet_tpu/parity/torch_shim.py), loads the SAME weights into this
framework's flax models through the production importer
(train/checkpoint.import_torch_state_dict), feeds both the SAME molecules,
and asserts activation equality:

  * finetune prediction (FragNetFineTune + FTHead3/FTHead4), 1- and 4-layer
  * all four encoder streams (x_atoms / x_frags / edge / fedge)
  * all four pretrain-head outputs (bond length / angle / dihedral / energy)
  * all four attention vectors (return_attentions path)

plus parameter-name-inventory validation against the reference's surviving
state_dict dumps (exps/pt/unimol_exp1s4/pt.pt.data,
exps/ft/pnnl_full/.../ft_100.pt.data).
"""

from __future__ import annotations

import re

import jax
import numpy as np
import pytest
import torch

from fragnet_tpu.graphs.hiergraph import pad_batch
from fragnet_tpu.model.finetune import FragNetFineTune
from fragnet_tpu.model.fragnet import FragNet
from fragnet_tpu.model.pretrain import FragNetPreTrain
from fragnet_tpu.parity import load_reference_module, reference_batch
from fragnet_tpu.parity.refbatch import exact_padspec
from fragnet_tpu.train.checkpoint import import_torch_state_dict

gat2 = load_reference_module("fragnet.model.gat.gat2")
ref_pretrain_heads = load_reference_module("fragnet.model.gat.pretrain_heads")

ATOL = 2e-4
RTOL = 2e-4


def _close(name, ref, mine, atol=ATOL, rtol=RTOL):
    ref = np.asarray(ref.detach() if hasattr(ref, "detach") else ref)
    mine = np.asarray(mine)[: ref.shape[0]]
    np.testing.assert_allclose(
        mine, ref, atol=atol, rtol=rtol, err_msg=f"stream {name} diverged"
    )


@pytest.fixture(scope="module")
def parity_graphs(ft_graphs):
    """Conftest molecules + the structural edge cases the reference special-
    cases: a one-bond molecule (2-atom bond-graph rule, data.py:157-182), a
    single-fragment ring (self_cn, fragments.py:230-234), and a disconnected
    pair (iso_cn3, fragments.py:236-241)."""
    from fragnet_tpu.chem import engine
    from fragnet_tpu.graphs.build import GraphBuilder

    builder = GraphBuilder("exp1s")
    extra = []
    for s, y in [("CC", -1.0), ("C=O", 0.3), ("CC.OCO", 0.1)]:
        mol, conf = engine.mol_3d(s)
        g = builder.build(mol, conf, [y], smiles=s)
        assert g is not None, s
        extra.append(g)
    return list(ft_graphs) + extra


def _both_batches(graphs):
    jbatch = pad_batch(graphs, exact_padspec(graphs))
    tbatch = reference_batch(graphs)
    # sanity: identical packed inputs
    np.testing.assert_array_equal(np.asarray(jbatch.x_atoms),
                                  tbatch["x_atoms"].numpy())
    np.testing.assert_array_equal(np.asarray(jbatch.edge_src),
                                  tbatch["edge_index"][0].numpy())
    np.testing.assert_array_equal(np.asarray(jbatch.bg_dst),
                                  tbatch["edge_index_bonds_graph"][0].numpy())
    np.testing.assert_array_equal(np.asarray(jbatch.fc_dst),
                                  tbatch["edge_index_fbonds"][0].numpy())
    np.testing.assert_array_equal(np.asarray(jbatch.frag_src),
                                  tbatch["frag_index"][0].numpy())
    return jbatch, tbatch


def _np_state_dict(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize("num_layer,fthead,act,h1", [
    (1, "FTHead3", "relu", 64),
    (4, "FTHead3", "celu", 128),
    (4, "FTHead4", "selu", 96),
])
def test_finetune_prediction_parity(parity_graphs, num_layer, fthead, act, h1):
    torch.manual_seed(7 + num_layer)
    ref = gat2.FragNetFineTune(
        n_classes=1, atom_features=167, frag_features=167, edge_features=17,
        num_layer=num_layer, num_heads=4, drop_ratio=0.15,
        h1=h1, h2=64, h3=64, h4=32, act=act, emb_dim=128, fthead=fthead,
    ).eval()

    mine = FragNetFineTune(
        n_classes=1, num_layer=num_layer, num_heads=4, drop_ratio=0.15,
        h1=h1, h2=64, h3=64, h4=32, act=act, emb_dim=128, fthead=fthead,
    )
    jbatch, tbatch = _both_batches(parity_graphs)
    template = mine.init(jax.random.PRNGKey(0), jbatch)
    params = import_torch_state_dict(_np_state_dict(ref), template=template,
                                     strict=True)

    with torch.no_grad():
        ref_pred = ref(tbatch)
    my_pred = mine.apply(params, jbatch)
    _close("prediction", ref_pred, my_pred)


def test_encoder_stream_parity(parity_graphs):
    """All four encoder streams match after 4 layers (gat2.py:381-442)."""
    torch.manual_seed(11)
    ref = gat2.FragNetFineTune(
        n_classes=1, atom_features=167, frag_features=167, edge_features=17,
        num_layer=4, num_heads=4, drop_ratio=0.15, emb_dim=128,
        fthead="FTHead1",
    ).eval()

    jbatch, tbatch = _both_batches(parity_graphs)
    enc = FragNet(num_layer=4, num_heads=4, drop_ratio=0.15, emb_dim=128)
    full = FragNetFineTune(n_classes=1, num_layer=4, num_heads=4,
                           drop_ratio=0.15, emb_dim=128, fthead="FTHead1")
    tpl = full.init(jax.random.PRNGKey(0), jbatch)
    params = import_torch_state_dict(_np_state_dict(ref), template=tpl,
                                     strict=True)

    with torch.no_grad():
        r_atoms, r_frags, r_edge, r_fedge = ref.pretrain(tbatch)
    m_atoms, m_frags, m_edge, m_fedge = enc.apply(
        {"params": params["params"]["pretrain"]}, jbatch
    )
    _close("x_atoms", r_atoms, m_atoms)
    _close("x_frags", r_frags, m_frags)
    _close("edge_features", r_edge, m_edge)
    _close("fedge_features", r_fedge, m_fedge)


def test_pretrain_head_parity(parity_graphs):
    """Bond-length / bond-angle / dihedral / energy heads
    (pretrain_heads.py:64-102) match on identical weights."""
    torch.manual_seed(3)
    ref = ref_pretrain_heads.FragNetPreTrain(
        num_layer=2, drop_ratio=0.1, num_heads=4, emb_dim=128,
        atom_features=167, frag_features=167, edge_features=17,
        fedge_in=6, fbond_edge_in=6,
    ).eval()

    mine = FragNetPreTrain(num_layer=2, drop_ratio=0.1, num_heads=4,
                           emb_dim=128)
    jbatch, tbatch = _both_batches(parity_graphs)
    template = mine.init(jax.random.PRNGKey(0), jbatch)
    params = import_torch_state_dict(_np_state_dict(ref), template=template,
                                     strict=True)

    with torch.no_grad():
        r_bl, r_ba, r_da, r_en = ref(tbatch)
    m_bl, m_ba, m_da, m_en = mine.apply(params, jbatch)
    _close("bond_length", r_bl, m_bl)
    _close("bond_angle", r_ba, m_ba)
    _close("dihedral", r_da, m_da)
    _close("energy", r_en, m_en)


def test_attention_parity(parity_graphs):
    """The four summed-attention vectors (gat2.py:318-328) match. The
    reference sums by SOURCE, so trailing sourceless nodes are absent from
    its (max_src+1)-sized output; _close compares the common prefix and the
    remainder must be zero."""
    torch.manual_seed(5)
    ref_model = gat2.FragNet(num_layer=1, drop_ratio=0.0, emb_dim=128,
                             atom_features=167, frag_features=167,
                             edge_features=17, fedge_in=6, fbond_edge_in=6,
                             num_heads=4).eval()
    layer = ref_model.layers[0]
    layer.return_attentions = True

    jbatch, tbatch = _both_batches(parity_graphs)
    mine = FragNet(num_layer=1, drop_ratio=0.0, emb_dim=128, num_heads=4)

    # wrap the torch state under the importer's expected prefix
    sd = {f"pretrain.layers.0.{k}": v.detach().numpy()
          for k, v in layer.state_dict().items()}
    template = mine.init(jax.random.PRNGKey(0), jbatch)
    # encoder-only template: importer expects top-level 'pretrain'
    wrapped = {"params": {"pretrain": template["params"]}}
    params = import_torch_state_dict(sd, template=wrapped, strict=True)

    with torch.no_grad():
        out = layer(
            tbatch["x_atoms"], tbatch["edge_index"], tbatch["edge_attr"],
            tbatch["frag_index"], tbatch["x_frags"],
            tbatch["atom_to_frag_ids"], tbatch["node_features_bonds"],
            tbatch["edge_index_bonds_graph"], tbatch["edge_attr_bonds"],
            tbatch["node_features_fbonds"], tbatch["edge_index_fbonds"],
            tbatch["edge_attr_fbonds"],
        )
    (r_atoms, r_frags, r_edge, r_fedge,
     r_attn_atoms, r_attn_frags, r_attn_bonds, r_attn_fbonds) = out

    m_atoms, m_frags, m_edge, m_fedge, attn = mine.apply(
        {"params": params["params"]["pretrain"]}, jbatch,
        return_attentions=True,
    )
    # streams before the inter-layer relu/dropout: compare raw layer outputs
    _close("attn_atoms", r_attn_atoms, attn.atoms)
    _close("attn_frags", r_attn_frags, attn.frags)
    _close("attn_bonds", r_attn_bonds, attn.bonds)
    _close("attn_fbonds", r_attn_fbonds, attn.fbonds)
    for name, r, m in [("atoms", r_atoms, m_atoms), ("frags", r_frags, m_frags),
                       ("edge", r_edge, m_edge), ("fedge", r_fedge, m_fedge)]:
        _close(name, torch.relu(r), m)  # FragNet applies relu after the layer
    # beyond the reference's (max_src+1) rows, ours must be exactly zero
    for r, m in [(r_attn_atoms, attn.atoms), (r_attn_frags, attn.frags),
                 (r_attn_bonds, attn.bonds), (r_attn_fbonds, attn.fbonds)]:
        tail = np.asarray(m)[r.shape[0]:]
        assert tail.size == 0 or np.abs(tail).max() == 0.0


def test_training_dynamics_parity(parity_graphs):
    """End-to-end TRAINING parity: identical weights, identical batch,
    identical Adam(lr=1e-3) — the per-step MSE training losses match the
    reference trainer's (train/utils.py:331-351) for 8 consecutive
    optimizer steps, and so do the post-training predictions. This
    validates the whole backward pass (all four attention passes, pooling,
    heads) and the optimizer semantics (torch.optim.Adam vs optax.adam),
    not just the forward."""
    torch.manual_seed(21)
    ref = gat2.FragNetFineTune(
        n_classes=1, atom_features=167, frag_features=167, edge_features=17,
        num_layer=2, num_heads=4, drop_ratio=0.0,
        h1=64, h2=64, h3=64, h4=32, act="relu", emb_dim=128, fthead="FTHead3",
    ).train()
    mine = FragNetFineTune(
        n_classes=1, num_layer=2, num_heads=4, drop_ratio=0.0,
        h1=64, h2=64, h3=64, h4=32, act="relu", emb_dim=128, fthead="FTHead3",
    )
    jbatch, tbatch = _both_batches(parity_graphs)
    template = mine.init(jax.random.PRNGKey(0), jbatch)
    params = import_torch_state_dict(_np_state_dict(ref), template=template,
                                     strict=True)

    from fragnet_tpu.train.loop import TrainState, make_train_step
    from fragnet_tpu.train.optim import make_optimizer

    lr = 1e-3
    tx = make_optimizer("adam", lr=lr)
    state = TrainState.create(params, tx)
    step = make_train_step(mine, tx, "mse")
    rng = jax.random.PRNGKey(1)

    opt = torch.optim.Adam(ref.parameters(), lr=lr)
    mse = torch.nn.MSELoss()
    y = tbatch["y"].view(-1)

    for i in range(8):
        opt.zero_grad()
        t_loss = mse(ref(tbatch).view(-1), y)
        t_loss.backward()
        opt.step()
        state, m_loss = step(state, jbatch, rng)
        np.testing.assert_allclose(
            float(m_loss), float(t_loss), rtol=2e-3, atol=2e-4,
            err_msg=f"training loss diverged at step {i}",
        )

    with torch.no_grad():
        ref.eval()
        ref_pred = ref(tbatch)
    my_pred = mine.apply(state.params, jbatch, deterministic=True)
    _close("post-training prediction", ref_pred, my_pred,
           atol=5e-4, rtol=5e-4)


def test_training_dynamics_parity_clsf(parity_graphs):
    """Classification twin of the dynamics test: 4 layers, dropout off,
    masked BCE with missing labels (train/utils.py:412-429 semantics: labels
    < −0.5 are excluded from both the loss matrix and the denominator) — 6
    Adam steps of loss trajectory + post-training logits match."""
    import dataclasses as _dc

    torch.manual_seed(23)
    n_tasks = 2
    # binary labels with a missing (−1) entry pattern over 2 tasks
    graphs = []
    for i, g in enumerate(parity_graphs):
        y0 = float(np.asarray(g.y, np.float32).reshape(-1)[0])
        lab = [1.0 if y0 > 0 else 0.0,
               -1.0 if i % 3 == 0 else (0.0 if y0 > -1 else 1.0)]
        graphs.append(_dc.replace(g, y=np.asarray(lab, np.float32)))

    ref = gat2.FragNetFineTune(
        n_classes=n_tasks, atom_features=167, frag_features=167,
        edge_features=17, num_layer=4, num_heads=4, drop_ratio=0.0,
        h1=64, h2=64, h3=64, h4=32, act="relu", emb_dim=128, fthead="FTHead3",
    ).train()
    mine = FragNetFineTune(
        n_classes=n_tasks, num_layer=4, num_heads=4, drop_ratio=0.0,
        h1=64, h2=64, h3=64, h4=32, act="relu", emb_dim=128, fthead="FTHead3",
    )
    jbatch = pad_batch(graphs, exact_padspec(graphs), n_tasks=n_tasks)
    tbatch = reference_batch(graphs, n_tasks=n_tasks)
    template = mine.init(jax.random.PRNGKey(0), jbatch)
    params = import_torch_state_dict(_np_state_dict(ref), template=template,
                                     strict=True)

    from fragnet_tpu.train.loop import TrainState, make_train_step
    from fragnet_tpu.train.optim import make_optimizer

    lr = 1e-3
    tx = make_optimizer("adam", lr=lr)
    state = TrainState.create(params, tx)
    step = make_train_step(mine, tx, "bce")
    rng = jax.random.PRNGKey(1)

    opt = torch.optim.Adam(ref.parameters(), lr=lr)
    crit = torch.nn.BCEWithLogitsLoss(reduction="none")

    for i in range(6):
        out = ref(tbatch)
        labels = tbatch["y"].view(out.shape)
        is_valid = tbatch["y"] > -0.5
        loss_mat = torch.where(is_valid, crit(out, labels),
                               torch.zeros_like(out))
        opt.zero_grad()
        t_loss = torch.sum(loss_mat) / torch.sum(is_valid)
        t_loss.backward()
        opt.step()
        state, m_loss = step(state, jbatch, rng)
        np.testing.assert_allclose(
            float(m_loss), float(t_loss), rtol=2e-3, atol=2e-4,
            err_msg=f"BCE training loss diverged at step {i}",
        )

    with torch.no_grad():
        ref.eval()
        ref_pred = ref(tbatch)
    my_pred = mine.apply(state.params, jbatch, deterministic=True)
    _close("post-training logits", ref_pred, my_pred, atol=1e-3, rtol=1e-3)

    # validation metric parity: −mean-per-task ROC-AUC (utils.py:466-492)
    from sklearn.metrics import roc_auc_score

    from fragnet_tpu.train.loop import mean_per_task_auc

    t_y = tbatch["y"].numpy()
    t_p = ref_pred.numpy()
    rocs = []
    for t in range(t_y.shape[1]):
        if (t_y[:, t] == 1).sum() > 0 and (t_y[:, t] == 0).sum() > 0:
            v = t_y[:, t] > -0.5
            rocs.append(roc_auc_score(t_y[v, t], t_p[v, t]))
    mask = np.asarray(jbatch.graph_mask) > 0
    m_auc = mean_per_task_auc(
        np.asarray(jbatch.y)[mask],
        np.asarray(my_pred).reshape(np.asarray(jbatch.y).shape)[mask])
    np.testing.assert_allclose(m_auc, np.mean(rocs), rtol=1e-5)


def test_importer_copies_storage():
    """Imported params must never alias torch parameter storage: mutating
    the torch model afterwards (e.g. opt.step()) must not change them
    (round-2 root cause: np.asarray views, checkpoint.py:191-196)."""
    torch.manual_seed(1)
    lin = torch.nn.Linear(4, 3)
    sd = {"fthead.lin1.weight": lin.weight.detach(),
          "fthead.lin1.bias": lin.bias.detach()}
    params = import_torch_state_dict(sd)
    before = np.array(params["params"]["head"]["lin1"]["kernel"])
    with torch.no_grad():
        lin.weight.add_(1.0)
        lin.bias.add_(1.0)
    after = np.asarray(params["params"]["head"]["lin1"]["kernel"])
    np.testing.assert_array_equal(before, after)
    assert not np.allclose(after.T, lin.weight.detach().numpy())


# ---------------------------------------------------------------------------
# parameter-name inventory vs the reference's surviving state_dict dumps
# ---------------------------------------------------------------------------

_NAME_RE = re.compile(r"\('([A-Za-z0-9_.]+)',")


def _dump_names(path: str) -> list:
    with open(path) as f:
        return _NAME_RE.findall(f.read())


def _check_inventory(names, template, skip_ok=()):
    """Every checkpoint name must map to an existing template param (or be a
    documented skip); every template param must be covered by some name."""
    from flax import serialization, traverse_util

    from fragnet_tpu.train.checkpoint import _torch_key_to_flax

    tflat = set(traverse_util.flatten_dict(
        serialization.to_state_dict(template)["params"]).keys())
    covered = set()
    unmapped = []
    for name in names:
        path = _torch_key_to_flax(name)
        if path is None:
            mod = name.split(".")[3] if name.startswith("pretrain.layers.") \
                else name.split(".")[0]
            assert mod in skip_ok, f"checkpoint key {name!r} unexpectedly skipped"
            continue
        if path not in tflat:
            unmapped.append((name, path))
        covered.add(path)
    assert not unmapped, f"mapped to nonexistent params: {unmapped[:8]}"
    missing = tflat - covered
    assert not missing, f"model params not in checkpoint: {sorted(missing)[:8]}"


_UNUSED = ("atom_embed", "frag_embed", "edge_embed", "bond_edge_embed",
           "frag_message_mlp", "atom_mlp", "frag_mlp", "bias",
           "edge_attr_bond_embed2")


def test_pt_checkpoint_name_inventory(parity_graphs):
    """pt.pt.data (exps/pt/unimol_exp1s4) — pretrain model, 4 layers,
    emb 128, heads 4 (config.yaml:10-21)."""
    names = _dump_names(
        "/root/reference/fragnet/exps/pt/unimol_exp1s4/pt.pt.data")
    assert len(names) > 50
    jbatch = pad_batch(parity_graphs, exact_padspec(parity_graphs),
                       with_targets=True)
    model = FragNetPreTrain(num_layer=4, emb_dim=128, num_heads=4)
    template = model.init(jax.random.PRNGKey(0), jbatch)
    _check_inventory(names, template, skip_ok=_UNUSED)


def test_ft_checkpoint_name_inventory(parity_graphs):
    """ft_100.pt.data (exps/ft/pnnl_full/fragnet_hpdl_exp1s_h4pt4_10) —
    FragNetFineTune FTHead4 h1=1472 selu (config_exp100.yaml)."""
    names = _dump_names(
        "/root/reference/fragnet/exps/ft/pnnl_full/"
        "fragnet_hpdl_exp1s_h4pt4_10/ft_100.pt.data")
    assert len(names) > 50
    jbatch = pad_batch(parity_graphs, exact_padspec(parity_graphs))
    model = FragNetFineTune(num_layer=4, emb_dim=128, num_heads=4,
                            fthead="FTHead4", h1=1472, act="selu")
    template = model.init(jax.random.PRNGKey(0), jbatch)
    _check_inventory(names, template, skip_ok=_UNUSED)
