"""Optimizers and LR schedules on optax.

Covers the reference's optimizer surface: plain Adam (finetune_gat2.py:257),
AdamW / Adagrad factories and plateau / linear / cosine-with-warmup schedulers
(model/gat/extra_optimizers.py:13-152, gat2_pl.py:18-51).
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def make_schedule(
    name: Optional[str],
    base_lr: float,
    total_steps: int = 10000,
    warmup_steps: int = 0,
    end_factor: float = 1.0 / 3.0,
):
    """LR schedule factory.

    * ``None``/"constant" — constant LR
    * "linear"            — LinearLR ramp from end_factor→1 (finetune_gat2.py:259-261)
    * "cosine_warmup"     — linear warmup then cosine decay (extra_optimizers.py
                            cosine factory / gat2_pl.py:18-51)
    * "linear_warmup"     — linear warmup then linear decay to 0
    """
    if name in (None, "constant"):
        return base_lr
    if name == "linear":
        return optax.linear_schedule(
            init_value=base_lr * end_factor,
            end_value=base_lr,
            transition_steps=max(1, warmup_steps or total_steps // 20),
        )
    if name == "cosine_warmup":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=base_lr,
            warmup_steps=max(1, warmup_steps),
            decay_steps=max(2, total_steps),
            end_value=0.0,
        )
    if name == "linear_warmup":
        warm = optax.linear_schedule(0.0, base_lr, max(1, warmup_steps))
        decay = optax.linear_schedule(
            base_lr, 0.0, max(1, total_steps - warmup_steps)
        )
        return optax.join_schedules([warm, decay], [max(1, warmup_steps)])
    raise ValueError(f"unknown schedule {name!r}")


def make_optimizer(
    name: str = "adam",
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    schedule=None,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """Optimizer factory. torch Adam defaults: b1=0.9 b2=0.999 eps=1e-8."""
    sched = schedule if schedule is not None else lr
    if name == "adam":
        tx = optax.adam(sched, b1=0.9, b2=0.999, eps=1e-8)
    elif name == "adamw":
        tx = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                         weight_decay=weight_decay)
    elif name == "adagrad":
        tx = optax.adagrad(sched)
    elif name == "sgd":
        tx = optax.sgd(sched)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
