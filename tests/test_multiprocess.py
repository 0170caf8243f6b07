"""Real multi-process distributed bring-up (VERDICT r2 item 6b): two OS
processes join a jax.distributed cluster over a localhost coordinator (the
DCN analog of the reference's 8-GPU Fabric DDP launch,
finetune_gat2_pl.py:230-260), run ONE data-parallel train step each on its
own micro-batch, and the psum'd loss must equal the single-process result.

The reference never tests its distributed path at all; this is the
from-scratch equivalent of an actual `fabric.launch()` smoke on CPU.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# multi-minute file: excluded from the fast tier (make check); run via make check-full
pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")   # beat any sitecustomize TPU plugin
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
from fragnet_tpu.dist.data_parallel import initialize_distributed
initialize_distributed(coordinator_address="127.0.0.1:" + port,
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from fragnet_tpu.data.datasets import build_graphs
import numpy as np
from fragnet_tpu.dist.data_parallel import make_dp_train_step, make_mesh, stack_for_dp
from fragnet_tpu.graphs.hiergraph import spec_for
from fragnet_tpu.model.finetune import FragNetFineTune
from fragnet_tpu.train.loop import TrainState
from fragnet_tpu.train.optim import make_optimizer


SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CCN"]
YS = [[-0.5], [-1.1], [0.3], [0.2]]
graphs = build_graphs(SMILES, YS)
spec = spec_for(graphs, batch_size=2)
mesh = make_mesh(2)

# each process owns ONE micro-batch (its local device's shard); the global
# stacked batch is assembled with make_array_from_process_local_data
local = stack_for_dp([graphs[pid], graphs[pid + 2]], 1, spec)
sharding = NamedSharding(mesh, P("data"))
batch = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(
        sharding, np.asarray(x)) if x is not None else None,
    local)
import numpy as np

model = FragNetFineTune(num_layer=1, num_heads=2, emb_dim=32,
                        h1=16, h2=16, h3=16, h4=16, drop_ratio=0.0)
host0 = jax.tree.map(lambda x: x[0] if x is not None else None, local)
params = model.init(jax.random.PRNGKey(0), host0, deterministic=True)
tx = make_optimizer("sgd", lr=1e-2)
state = TrainState.create(params, tx)
step = make_dp_train_step(model, tx, mesh)
state, loss = step(state, batch, jax.random.PRNGKey(1))
loss = float(loss)
if pid == 0:
    with open(out, "w") as f:
        f.write(repr(loss))
jax.distributed.shutdown()
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "loss.txt"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"repo": REPO})
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 real CPU device per process
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers hung")
        logs.append(stdout.decode(errors="replace"))
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-4000:]}"
    dp_loss = float(out.read_text())

    # single-process ground truth: mean of the two micro-batch losses
    # (make_dp_train_step pmean's per-device losses over equal-sized shards)
    import jax

    from fragnet_tpu.data.datasets import build_graphs
    from fragnet_tpu.graphs.hiergraph import pad_batch, spec_for
    from fragnet_tpu.model.finetune import FragNetFineTune
    from fragnet_tpu.train.loop import LOSSES

    SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CCN"]
    YS = [[-0.5], [-1.1], [0.3], [0.2]]
    graphs = build_graphs(SMILES, YS)
    spec = spec_for(graphs, batch_size=2)
    model = FragNetFineTune(num_layer=1, num_heads=2, emb_dim=32,
                            h1=16, h2=16, h3=16, h4=16, drop_ratio=0.0)
    b0 = pad_batch([graphs[0], graphs[2]], spec)
    b1 = pad_batch([graphs[1], graphs[3]], spec)
    params = model.init(jax.random.PRNGKey(0), b0, deterministic=True)
    loss_fn = LOSSES["mse"]
    ls = [float(loss_fn(model.apply(params, b, deterministic=True),
                        b.y, b.graph_mask)) for b in (b0, b1)]
    np.testing.assert_allclose(dp_loss, np.mean(ls), rtol=1e-5, atol=1e-6)
