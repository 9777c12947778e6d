from .circuit import (
    ansatz_program,
    build_circuit_kernel,
    make_fused_ansatz_probs,
    rotation_bank,
)

__all__ = [
    "ansatz_program",
    "build_circuit_kernel",
    "make_fused_ansatz_probs",
    "rotation_bank",
]
