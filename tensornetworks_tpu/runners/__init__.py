from .configs import (
    AdversarialConfig,
    ClassicalKSDConfig,
    QuantumKSDConfig,
    ScaleConfig,
)
from .sprinkler_adversarial import run_sprinkler_experiment
from .sprinkler_ksd import run_sprinkler_ksd_experiment
from .sprinkler_quantum_ksd import run_sprinkler_quantum_ksd_experiment

__all__ = [
    "AdversarialConfig",
    "ClassicalKSDConfig",
    "QuantumKSDConfig",
    "ScaleConfig",
    "run_sprinkler_experiment",
    "run_sprinkler_ksd_experiment",
    "run_sprinkler_quantum_ksd_experiment",
]
