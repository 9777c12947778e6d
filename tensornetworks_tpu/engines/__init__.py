from .advi import AdversarialVariationalInference
from .ksd import KSDVariationalInference, QuantumKSDVariationalInference
from .common import cosine_lr_schedule, make_optimizer

__all__ = [
    "AdversarialVariationalInference",
    "KSDVariationalInference",
    "QuantumKSDVariationalInference",
    "cosine_lr_schedule",
    "make_optimizer",
]
