from .advi import AdversarialVariationalInference
from .amortized import AmortizedKSD, train_multi_seed
from .distill import (fit_born_machine, fit_conditioned_born_machine,
                      marginals_product)
from .distributed import (DistributedQuantumKSDVariationalInference,
                          DistributedSteinOperator)
from .distributed_sampled import DistributedSampledKSDVariationalInference
from .ksd import KSDVariationalInference, QuantumKSDVariationalInference
from .sampled import SampledKSDVariationalInference
from .common import cosine_lr_schedule, make_optimizer

__all__ = [
    "AdversarialVariationalInference",
    "AmortizedKSD",
    "DistributedQuantumKSDVariationalInference",
    "DistributedSampledKSDVariationalInference",
    "DistributedSteinOperator",
    "KSDVariationalInference",
    "QuantumKSDVariationalInference",
    "SampledKSDVariationalInference",
    "cosine_lr_schedule",
    "fit_born_machine",
    "fit_conditioned_born_machine",
    "marginals_product",
    "make_optimizer",
    "train_multi_seed",
]
