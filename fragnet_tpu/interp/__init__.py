"""Interpretability: the four attention-weight levels + masking-based
contribution attribution + renderings — the re-design of fragnet/vizualize/.

The reference runs one full forward with a deep-copied model per masked
atom/bond/connection (viz.py:901-1167); here attributions are a single vmap
over mask indices through the jit'd model.
"""

from fragnet_tpu.interp.attention import FragNetInterpreter
from fragnet_tpu.interp.attribution import (
    atom_contributions,
    bond_contributions,
    fconn_contributions,
    fragment_contributions,
)

__all__ = [
    "FragNetInterpreter",
    "atom_contributions",
    "bond_contributions",
    "fconn_contributions",
    "fragment_contributions",
]
