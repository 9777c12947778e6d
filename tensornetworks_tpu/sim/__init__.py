from . import gates
from .ansatz import (
    ANSATZ_TYPES,
    all_to_all_state,
    ansatz_probs,
    ansatz_state_fn,
    basic_state,
    hardware_efficient_state,
    num_ansatz_params,
)
from .sampling import parameter_shift_jacobian, sample_bits, sample_indices
from .structured import latent_edges, make_structured_probs_fn
from .statevector import (
    apply_cnot,
    apply_cz,
    apply_diagonal,
    apply_gate,
    hadamard_wall,
    probabilities,
    zero_state,
)

__all__ = [
    "ANSATZ_TYPES",
    "all_to_all_state",
    "ansatz_probs",
    "ansatz_state_fn",
    "apply_cnot",
    "apply_cz",
    "apply_diagonal",
    "apply_gate",
    "basic_state",
    "gates",
    "hadamard_wall",
    "hardware_efficient_state",
    "latent_edges",
    "make_structured_probs_fn",
    "num_ansatz_params",
    "parameter_shift_jacobian",
    "probabilities",
    "sample_bits",
    "sample_indices",
    "zero_state",
]
