"""Observability: scalar-history logging + on-demand profiler traces.

The reference logs train/val scalars to TensorBoard
(train/finetune/finetune_gat2.py:86,272-273; train/pretrain/
pretrain_gat2.py:171-177) and has no profiler story. Here:

* ``ScalarLogger`` — always writes append-only JSONL
  (``<exp_dir>/scalars.jsonl``, one ``{"step", "tag", "value", "wall"}``
  record per point — greppable, crash-safe, no deps), and mirrors to
  TensorBoard when ``torch.utils.tensorboard`` is importable.
* ``profile_trace`` — context manager around N steps that writes a
  ``jax.profiler`` trace (viewable in TensorBoard / Perfetto) — the
  SURVEY §5.1 first-class-tracing requirement. Enabled from the CLI with
  ``finetune.profile=true`` (trace lands in ``<exp_dir>/profile``).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Iterator, Optional


class ScalarLogger:
    """JSONL scalar history with optional TensorBoard mirroring."""

    def __init__(self, exp_dir: str, use_tensorboard: bool = True):
        os.makedirs(exp_dir, exist_ok=True)
        self.path = os.path.join(exp_dir, "scalars.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._t0 = time.time()
        self._tb = None
        if use_tensorboard:
            try:  # pragma: no cover - env dependent
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(exp_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, tag: str, value: float, step: int) -> None:
        rec = {"step": int(step), "tag": tag, "value": float(value),
               "wall": round(time.time() - self._t0, 3)}
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_scalars(exp_dir: str):
    """Load the scalar history back as a list of records."""
    path = os.path.join(exp_dir, "scalars.jsonl")
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


@contextlib.contextmanager
def profile_trace(out_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace around the enclosed block; no-op when out_dir is
    falsy. The trace directory opens in TensorBoard's profile plugin or
    ui.perfetto.dev."""
    if not out_dir:
        yield
        return
    import jax

    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
