"""Jit'd train/eval steps and the finetune trainer.

Re-designs fragnet/train/utils.py:307-637 (TrainerFineTune) as pure functions
over a TrainState: one compiled step per PadSpec bucket, masked losses that
are exactly the reference's (MSE; masked BCE ignoring labels < −0.5 — the
NaN-label convention, train/utils.py:422-429), and sklearn metrics on the
host (RMSE, masked mean-per-task ROC-AUC, train/utils.py:480-492).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# losses (masked — padding-aware versions of the reference's)
# ---------------------------------------------------------------------------

def mse_loss(pred: jnp.ndarray, y: jnp.ndarray, graph_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over real graphs of (pred − y)² (nn.MSELoss over the batch)."""
    se = (pred.reshape(y.shape) - y) ** 2
    m = graph_mask[:, None]
    return jnp.sum(se * m) / jnp.maximum(jnp.sum(m) * y.shape[1], 1.0)


def bce_masked_loss(pred: jnp.ndarray, y: jnp.ndarray,
                    graph_mask: jnp.ndarray) -> jnp.ndarray:
    """BCE-with-logits, ignoring labels < −0.5 (missing-label convention)
    and padded graphs. Reference: train/utils.py:297-305,412-429."""
    pred = pred.reshape(y.shape)
    is_valid = (y > -0.5) & (graph_mask[:, None] > 0)
    # stable BCE with logits
    per = jnp.maximum(pred, 0) - pred * y + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    per = jnp.where(is_valid, per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(is_valid), 1.0)


LOSSES = {"mse": mse_loss, "bce": bce_masked_loss}


# ---------------------------------------------------------------------------
# compiled steps
# ---------------------------------------------------------------------------

def make_train_step(model, tx: optax.GradientTransformation,
                    loss_name: str = "mse", layout=None) -> Callable:
    """``layout``: a data.packing.PackLayout — the step then takes a packed
    uint8 buffer instead of a HierGraphBatch and unpacks it in-jit (slices +
    bitcasts, fused by XLA)."""
    loss_fn = LOSSES[loss_name]

    # donate the TrainState: params/opt_state buffers are overwritten in
    # place, halving HBM traffic for the update.
    # rng derivation happens INSIDE the step (fold_in on the step counter):
    # a host-side jax.random.split per step is a device round trip, which on
    # a tunneled TPU costs more than the step itself.
    @partial(jax.jit, donate_argnums=0)
    def train_step(state: TrainState, batch, base_rng) -> Tuple[TrainState, jnp.ndarray]:
        if layout is not None:
            from fragnet_tpu.data.packing import unpack_batch

            batch = unpack_batch(batch, layout)
        rng = jax.random.fold_in(base_rng, state.step)

        def loss(params):
            out = model.apply(params, batch, deterministic=False,
                              rngs={"dropout": rng})
            return loss_fn(out, batch.y, batch.graph_mask)

        l, grads = jax.value_and_grad(loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), l

    return train_step


def make_eval_step(model, loss_name: str = "mse") -> Callable:
    loss_fn = LOSSES[loss_name]

    @jax.jit
    def eval_step(params, batch):
        out = model.apply(params, batch, deterministic=True)
        return loss_fn(out, batch.y, batch.graph_mask), out

    return eval_step


def make_predict_step(model) -> Callable:
    @jax.jit
    def predict(params, batch):
        return model.apply(params, batch, deterministic=True)

    return predict


# ---------------------------------------------------------------------------
# host-side metrics
# ---------------------------------------------------------------------------

def rmse_metric(y: np.ndarray, pred: np.ndarray) -> float:
    return float(np.sqrt(np.mean((y - pred) ** 2)))


def mean_per_task_auc(y: np.ndarray, pred: np.ndarray) -> float:
    """Masked mean-per-task ROC-AUC (train/utils.py:480-492)."""
    from sklearn.metrics import roc_auc_score

    rocs = []
    for t in range(y.shape[1]):
        col = y[:, t]
        if (col == 1).sum() > 0 and (col == 0).sum() > 0:
            valid = col > -0.5
            rocs.append(roc_auc_score(col[valid], pred[valid, t]))
    return float(np.mean(rocs)) if rocs else float("nan")


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

class TrainerFineTune:
    """Epoch-level driver mirroring the reference trainer's API surface
    (train/validate/test) on top of the compiled steps.

    target_type: 'regr' (MSE / RMSE) or 'clsf' (masked BCE / −mean ROC-AUC).
    """

    def __init__(self, model, tx, target_type: str = "regr",
                 train_step: Optional[Callable] = None,
                 eval_step: Optional[Callable] = None):
        """``train_step``/``eval_step`` override the default single-device
        compiled steps (used by the distributed modes, e.g. the
        edge-partitioned steps from dist/edge_partition.py)."""
        self.model = model
        self.tx = tx
        self.target_type = target_type
        loss = "mse" if target_type == "regr" else "bce"
        self._train_step = train_step or make_train_step(model, tx, loss)
        self._eval_step = eval_step or make_eval_step(model, loss)

    def train_epoch(self, state: TrainState, batches: Iterable, rng) -> Tuple[TrainState, float]:
        total, n = 0.0, 0
        it = batches.prefetch() if hasattr(batches, "prefetch") else batches
        losses = []
        for batch in it:
            # per-step randomness is derived inside the step from state.step
            state, l = self._train_step(state, batch, rng)
            losses.append(l)  # don't sync the device inside the loop
            n += 1
        total = sum(float(l) for l in losses)
        return state, total / max(n, 1)

    def validate(self, params, batches: Iterable) -> float:
        """Returns the score minimized by early stopping: mean loss for
        regression, −mean-per-task ROC-AUC for classification."""
        if self.target_type == "regr":
            total, n = 0.0, 0
            for batch in batches:
                l, _ = self._eval_step(params, batch)
                total += float(l)
                n += 1
            return total / max(n, 1)
        y, p = self._collect(params, batches)
        return -mean_per_task_auc(y, p)

    def test(self, params, batches: Iterable):
        y, p = self._collect(params, batches)
        if self.target_type == "regr":
            mse = float(np.mean((y - p) ** 2))
            return mse, y, p
        return -mean_per_task_auc(y, p), y, p

    def _collect(self, params, batches: Iterable):
        ys, ps = [], []
        for batch in batches:
            _, out = self._eval_step(params, batch)
            mask = np.asarray(batch.graph_mask) > 0
            ys.append(np.asarray(batch.y)[mask])
            ps.append(np.asarray(out).reshape(np.asarray(batch.y).shape)[mask])
        return np.concatenate(ys), np.concatenate(ps)
