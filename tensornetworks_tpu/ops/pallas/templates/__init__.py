"""QUARANTINED kernel templates — interpret-mode only, NOT production paths.

These kernels are numerically validated in Pallas interpret mode but do not
compile on this image's Mosaic build (in-kernel reshapes that change the
lane dimension crash the remote compiler — WORKLOG.md). They are kept as
fusion templates for a backend with in-kernel relayout support; nothing in
the package imports them. The production kernels live one level up
(``circuit2d``, ``stein2d``): the 2D super-block formulations that compile
natively.

- ``circuit``: whole-circuit per-gate statevector forward in VMEM.
- ``stein_matvec``: grouped Kronecker Stein matvec with in-kernel relayouts.
"""

from .circuit import (ansatz_program, build_circuit_kernel,
                      make_fused_ansatz_probs, rotation_bank)
from .stein_matvec import make_pallas_stein_matvec, supported

__all__ = [
    "ansatz_program",
    "build_circuit_kernel",
    "make_fused_ansatz_probs",
    "make_pallas_stein_matvec",
    "rotation_bank",
    "supported",
]
