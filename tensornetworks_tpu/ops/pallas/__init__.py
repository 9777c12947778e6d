from .circuit import (
    ansatz_program,
    build_circuit_kernel,
    make_fused_ansatz_probs,
    rotation_bank,
)
from .circuit2d import make_pallas_circuit2d_probs
from .stein2d import make_pallas_stein2d_matvec, make_pallas_stein2d_quadform

__all__ = [
    "ansatz_program",
    "build_circuit_kernel",
    "make_fused_ansatz_probs",
    "make_pallas_circuit2d_probs",
    "make_pallas_stein2d_matvec",
    "make_pallas_stein2d_quadform",
    "rotation_bank",
]
