"""Reference parity harness.

Runs the UNMODIFIED reference model code (/root/reference/fragnet) on CPU
torch by shimming its two native dependencies (torch_scatter,
torch_geometric) with ~100 lines of plain torch, then compares activations
and parameter inventories against this framework (SURVEY.md §6 — the
bit-accuracy north-star gate).

The reference tree is imported read-only; nothing in it is executed at
module scope beyond class definitions.
"""

from fragnet_tpu.parity.torch_shim import load_reference_module  # noqa: F401
from fragnet_tpu.parity.refbatch import reference_batch  # noqa: F401
