"""Test configuration: force CPU with an 8-device virtual mesh so sharding
tests run without TPU hardware (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Force CPU: the pod's sitecustomize registers the tunneled-TPU "axon"
# backend and sets jax_platforms via config, which beats the JAX_PLATFORMS
# env var — only a config update reliably overrides it.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Persistent compilation cache: the step functions recompile per PadSpec; on
# this 2-vCPU host each CPU compile is tens of seconds, so cache across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def ft_graphs():
    """A small, diverse set of featurized molecules shared across tests."""
    from fragnet_tpu.chem import engine
    from fragnet_tpu.graphs.build import GraphBuilder

    smiles_y = [
        ("CCO", -0.77),
        ("CC(=O)Oc1ccccc1C(=O)O", -2.3),
        ("c1ccccc1", -1.1),
        ("CC(C)Cc1ccc(cc1)C(C)C(=O)O", -3.5),
        ("[Na+].[Cl-].CCO", 0.5),
        ("CN1C=NC2=C1C(=O)N(C)C(=O)N2C", -0.8),
        ("C1CCCCC1", -2.0),
        ("OCC(O)C(O)C(O)C(O)CO", 1.2),
    ]
    builder = GraphBuilder("exp1s")
    out = []
    for s, y in smiles_y:
        mol, conf = engine.mol_3d(s)
        g = builder.build(mol, conf, [y], smiles=s)
        assert g is not None, s
        out.append(g)
    return out
