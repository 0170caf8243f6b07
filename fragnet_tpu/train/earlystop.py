"""Early stopping with best-checkpoint capture.
Reference: fragnet/train/utils.py:13-56 (EarlyStopping)."""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np


class EarlyStopping:
    """Tracks a minimized validation score; keeps the best params in memory
    and optionally persists them via ``save_fn(params, path)``."""

    def __init__(self, patience: int = 20, delta: float = 0.0,
                 path: Optional[str] = None,
                 save_fn: Optional[Callable[[Any, str], None]] = None,
                 verbose: bool = False):
        self.patience = patience
        self.delta = delta
        self.path = path
        self.save_fn = save_fn
        self.verbose = verbose
        self.counter = 0
        self.best_score: Optional[float] = None
        self.best_params: Any = None
        self.early_stop = False

    def __call__(self, val_loss: float, params: Any) -> None:
        score = -float(val_loss)
        if self.best_score is None or score > self.best_score + self.delta:
            self.best_score = score
            # snapshot to host: train steps donate their TrainState, so the
            # device buffers behind ``params`` are invalidated by the next
            # step — keeping a live reference would fail later
            try:
                import jax

                self.best_params = jax.device_get(params)
            except ImportError:  # pure-python tests
                self.best_params = params
            self.counter = 0
            if self.path and self.save_fn:
                self.save_fn(params, self.path)
            if self.verbose:
                print(f"[earlystop] new best val={val_loss:.6f}")
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
