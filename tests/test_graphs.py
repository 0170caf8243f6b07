"""Graph construction + batching tests: line-graph semantics, special cases,
collate offsets, padding invariance."""

import numpy as np
import pytest

from fragnet_tpu.chem import engine
from fragnet_tpu.graphs.build import GraphBuilder, _line_graph_edges, geometric_targets
from fragnet_tpu.graphs.hiergraph import PadSpec, fits, pad_batch, spec_for


class TestLineGraph:
    def test_share_one_atom_rule(self):
        # path a-b-c → directed edges (a,b),(b,a),(b,c),(c,b)
        eps = [(0, 1), (1, 0), (1, 2), (2, 1)]
        r0, r1 = _line_graph_edges(eps)
        pairs = set(zip(r0, r1))
        # (a,b) & (b,c) share b → included; (a,b) & (b,a) share both → excluded
        assert (0, 2) in pairs and (2, 0) in pairs
        assert (0, 1) not in pairs and (1, 0) not in pairs
        # symmetric
        assert all((j, i) in pairs for i, j in pairs)

    def test_self_edge_gets_self_loop(self):
        # the fconn graph of a single-fragment mol has one (0,0) node
        r0, r1 = _line_graph_edges([(0, 0)])
        assert (r0, r1) == ([0], [0])

    def test_matches_reference_bruteforce(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            n_nodes = 6
            bonds = set()
            while len(bonds) < 7:
                u, v = rng.integers(0, n_nodes, 2)
                if u != v:
                    bonds.add((min(u, v), max(u, v)))
            eps = []
            for u, v in sorted(bonds):
                eps += [(int(u), int(v)), (int(v), int(u))]
            r0, r1 = _line_graph_edges(eps)
            # reference O(E²) double loop (data.py:116-128)
            e0, e1 = [], []
            for i in range(len(eps)):
                for j in range(len(eps)):
                    if len(set(eps[i]) & set(eps[j])) == 1:
                        e0.append(i)
                        e1.append(j)
            assert (r0, r1) == (e0, e1)


class TestBuilder:
    def _build(self, s, frag_type="brics", add_targets=False):
        mol, conf = engine.mol_3d(s)
        b = GraphBuilder("exp1s", add_dhangles=add_targets)
        return b.build(mol, conf, [0.0], smiles=s, frag_type=frag_type)

    def test_basic_shapes(self):
        g = self._build("CCO")
        assert g.x_atoms.shape == (9, 167)
        assert g.edge_index.shape == (2, 16)
        assert g.edge_attr.shape == (16, 17)
        assert g.nf_bonds.shape == (16, 17)
        assert g.ea_bonds.shape[1] == 1
        assert g.x_frags.shape[1] == 167

    def test_single_frag_self_edge(self):
        g = self._build("C1CCCCC1")
        assert g.n_frags == 1
        # exp1s: ONE self edge
        assert g.frag_index.shape == (2, 1)
        assert g.frag_index[0, 0] == g.frag_index[1, 0] == 0
        assert g.cnx_attr[0, 4] == 1.0  # self_cn one-hot position
        # fconn line graph: single node with a self loop
        assert g.ei_fbonds.shape == (2, 1)

    def test_x_frags_is_atom_sum(self):
        g = self._build("CC(=O)Oc1ccccc1C(=O)O")
        expect = np.zeros_like(g.x_frags)
        np.add.at(expect, g.atom_to_frag, g.x_atoms)
        np.testing.assert_allclose(g.x_frags, expect)

    def test_cos_angle_range(self):
        g = self._build("CCCC")
        assert (g.ea_bonds >= -1.0 - 1e-6).all() and (g.ea_bonds <= 1.0 + 1e-6).all()

    def test_fconn_edge_attr_is_sum(self):
        g = self._build("CCOC(=O)CCN")
        if g.n_fc_edges > 0:
            for k in range(g.n_fc_edges):
                i, j = g.ei_fbonds[0, k], g.ei_fbonds[1, k]
                np.testing.assert_allclose(
                    g.ea_fbonds[k], g.nf_fbonds[i] + g.nf_fbonds[j]
                )

    def test_geometric_targets(self):
        g = self._build("CCO", add_targets=True)
        assert g.bnd_lngth.shape == (g.n_edges, 1)
        assert g.bnd_angl.shape == (g.n_atoms, 1)
        assert g.dh_angl.shape == (g.n_edges, 1)
        assert (g.bnd_lngth > 0).all()

    def test_geometric_targets_math(self):
        pos = np.array([[0.0, 0, 0], [1.5, 0, 0], [1.5, 1.5, 0]])
        ei = np.array([[0, 1, 1, 2], [1, 0, 2, 1]])
        bl, ba, dh = geometric_targets(pos, ei)
        np.testing.assert_allclose(bl, [2.25, 2.25, 2.25, 2.25])
        # atom 0 has one outgoing unit vector → |sum|² = 1
        np.testing.assert_allclose(ba[0], 1.0)


class TestBatching:
    def test_offsets(self, ft_graphs):
        spec = spec_for(ft_graphs, batch_size=len(ft_graphs))
        b = pad_batch(ft_graphs, spec)
        # atom_batch is monotone over real atoms
        n_real = int(b.atom_mask.sum())
        assert n_real == sum(g.n_atoms for g in ft_graphs)
        # edges of graph i point only at atoms of graph i
        e_real = int(b.edge_mask.sum())
        seg_of_edge = b.atom_batch[b.edge_src[:e_real]]
        seg_of_edge2 = b.atom_batch[b.edge_dst[:e_real]]
        np.testing.assert_array_equal(seg_of_edge, seg_of_edge2)
        # y round trip
        for i, g in enumerate(ft_graphs):
            np.testing.assert_allclose(b.y[i, 0], g.y[0])

    def test_fits_check(self, ft_graphs):
        tiny = PadSpec(1, 4, 4, 2, 2, 4, 4)
        assert not fits(ft_graphs, tiny)
        with pytest.raises(ValueError):
            pad_batch(ft_graphs, tiny)

    def test_single_mol_batch(self, ft_graphs):
        g = ft_graphs[0]
        spec = spec_for([g], batch_size=1)
        b = pad_batch([g], spec)
        np.testing.assert_allclose(
            b.x_atoms[: g.n_atoms], g.x_atoms
        )
        np.testing.assert_array_equal(
            b.edge_src[: g.n_edges], g.edge_index[0]
        )
