from .hamming import (
    base_hamming_kernel,
    decay_factor,
    hamming_distance,
    hamming_kernel_matrix,
    resolve_length_scale,
)
from .kron import apply_adjacent_block, apply_to_wires, kron_matvec, kron_power_np
from .stein import (
    SteinOperator,
    ksd_quadform,
    score_table,
    score_table_from_log,
    stein_gram_dense,
    stein_matvec,
)

__all__ = [
    "SteinOperator",
    "apply_adjacent_block",
    "apply_to_wires",
    "base_hamming_kernel",
    "decay_factor",
    "hamming_distance",
    "hamming_kernel_matrix",
    "resolve_length_scale",
    "ksd_quadform",
    "kron_matvec",
    "kron_power_np",
    "score_table",
    "score_table_from_log",
    "stein_gram_dense",
    "stein_matvec",
]
