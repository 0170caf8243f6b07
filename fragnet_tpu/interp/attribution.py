"""Masking-based contribution attribution, vmapped.

Reference behavior (fragnet/vizualize/viz.py:901-1167 and model_attr.py):
contribution(entity) = prediction(unmasked) − prediction(entity masked at
every layer). The reference deep-copies the model and runs one forward per
entity; here each attribution family is ONE vmapped, jit'd call.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fragnet_tpu.model.layers import LayerHooks


def _hooks_list(num_layer: int, **kw):
    return [LayerHooks(**kw)] * num_layer


@partial(jax.jit, static_argnums=0)
def _predict_base(model, params, batch):
    out = model.apply(params, batch, deterministic=True)
    return out[:, 0] if out.ndim == 2 else out


def _predict(model, params, batch, hooks=None):
    if hooks is None:
        return _predict_base(model, params, batch)
    out = model.apply(params, batch, deterministic=True, hooks=hooks)
    return out[:, 0] if out.ndim == 2 else out


def atom_contributions(model, params, batch, n_atoms: Optional[int] = None) -> np.ndarray:
    """Per-atom contribution = pred − pred(atom hidden state zeroed in every
    layer). Returns (A,) with entries for real atoms (viz.py:901-936)."""
    A = batch.x_atoms.shape[0]
    n = n_atoms if n_atoms is not None else A
    base = _predict(model, params, batch)

    @jax.jit
    def masked(idx):
        hooks = _hooks_list(model.num_layer, atom_mask=idx)
        return _predict(model, params, batch, hooks)

    preds = jax.vmap(masked)(jnp.arange(n))  # (n, G)
    graph_of_atom = batch.atom_batch[:n]
    contrib = base[graph_of_atom] - preds[jnp.arange(n), graph_of_atom]
    return np.asarray(contrib)


def bond_contributions(model, params, batch, n_bonds: Optional[int] = None) -> np.ndarray:
    """Per-(undirected)-bond contribution: mask directed-edge rows 2k, 2k+1
    of the evolving bond features in every layer (viz.py:986-1050; the layer
    zeroes rows k, k+1 given k — gat2.py:171-177)."""
    E = batch.edge_src.shape[0]
    n = n_bonds if n_bonds is not None else E // 2
    base = _predict(model, params, batch)

    @jax.jit
    def masked(k):
        hooks = _hooks_list(model.num_layer, bond_mask=2 * k)
        return _predict(model, params, batch, hooks)

    preds = jax.vmap(masked)(jnp.arange(n))
    graph_of_bond = batch.atom_batch[batch.edge_src[2 * jnp.arange(n)]]
    contrib = base[graph_of_bond] - preds[jnp.arange(n), graph_of_bond]
    return np.asarray(contrib)


def fconn_contributions(model, params, batch, n_conn: Optional[int] = None) -> np.ndarray:
    """Per-fragment-connection contribution: mask fconn rows 2k, 2k+1
    (viz.py:1063-1167; gat2.py:274-278)."""
    C = batch.nf_fbonds.shape[0]
    n = n_conn if n_conn is not None else C // 2
    base = _predict(model, params, batch)

    @jax.jit
    def masked(k):
        hooks = _hooks_list(model.num_layer, frag_bond_mask=k)
        return _predict(model, params, batch, hooks)

    preds = jax.vmap(masked)(jnp.arange(n))
    graph_of_conn = batch.frag_batch[batch.frag_src[2 * jnp.arange(n)]]
    contrib = base[graph_of_conn] - preds[jnp.arange(n), graph_of_conn]
    return np.asarray(contrib)


def fragment_contributions(model, params, batch, n_frags: Optional[int] = None) -> np.ndarray:
    """Per-fragment contribution: zero ALL atoms of the fragment after every
    layer (model_attr.py:734-766, 115-133). One vmapped call over fragments."""
    F = batch.x_frags.shape[0]
    n = n_frags if n_frags is not None else F
    base = _predict(model, params, batch)

    @jax.jit
    def masked(frag_id):
        vec = (batch.atom_to_frag == frag_id).astype(batch.x_atoms.dtype)
        vec = vec * batch.atom_mask
        hooks = _hooks_list(model.num_layer, atom_zero_vec=vec)
        return _predict(model, params, batch, hooks)

    preds = jax.vmap(masked)(jnp.arange(n))
    graph_of_frag = batch.frag_batch[:n]
    contrib = base[graph_of_frag] - preds[jnp.arange(n), graph_of_frag]
    return np.asarray(contrib)
