"""tensornetworks_tpu — a TPU-native JAX framework for variational inference
with Born machines on discrete Bayesian networks.

From-scratch rebuild of the capabilities of ``sozoluffy/TensorNetworks``
(adversarial VI and kernelized-Stein-discrepancy VI with classical and
quantum-circuit Born machines), redesigned around dense on-device state-space
tables, a batched statevector simulator differentiated by ``jax.grad``, and
jitted XLA training programs that scale over ``jax.sharding`` meshes.
"""

__version__ = "0.1.0"

from . import core
from .core import (
    BayesianNetwork,
    calculate_tvd,
    generate_all_binary_outcomes,
    get_random_chain_network,
    get_sprinkler_network,
)


def __getattr__(name):
    """Lazy re-exports of the heavier subpackages' main classes so
    ``tensornetworks_tpu.KSDVariationalInference`` etc. work without paying
    jax/flax import cost for pure-core users."""
    _lazy = {
        "AdversarialVariationalInference": "engines",
        "AmortizedKSD": "engines",
        "KSDVariationalInference": "engines",
        "QuantumKSDVariationalInference": "engines",
        "train_multi_seed": "engines",
        "BinaryClassifierMLP": "models",
        "ClassicalBornMachine": "models",
        "QuantumBornMachine": "models",
    }
    if name in _lazy:
        import importlib

        mod = importlib.import_module(f".{_lazy[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "AdversarialVariationalInference",
    "AmortizedKSD",
    "BayesianNetwork",
    "BinaryClassifierMLP",
    "ClassicalBornMachine",
    "KSDVariationalInference",
    "QuantumBornMachine",
    "QuantumKSDVariationalInference",
    "calculate_tvd",
    "core",
    "generate_all_binary_outcomes",
    "get_random_chain_network",
    "get_sprinkler_network",
    "train_multi_seed",
    "__version__",
]
