from .bits import (
    all_bitstrings,
    bits_to_index,
    flip_index,
    generate_all_binary_outcomes,
    get_binary_key,
    get_outcome_tuple,
    jnp_bits_to_index,
    jnp_index_to_bits,
    popcount,
)
from .bayes_net import (
    BayesianNetwork,
    get_random_chain_network,
    get_sprinkler_network,
)
from .metrics import calculate_tvd, entropy, kl_divergence, tvd

__all__ = [
    "BayesianNetwork",
    "all_bitstrings",
    "bits_to_index",
    "calculate_tvd",
    "entropy",
    "flip_index",
    "generate_all_binary_outcomes",
    "get_binary_key",
    "get_outcome_tuple",
    "get_random_chain_network",
    "get_sprinkler_network",
    "jnp_bits_to_index",
    "jnp_index_to_bits",
    "kl_divergence",
    "popcount",
    "tvd",
]
