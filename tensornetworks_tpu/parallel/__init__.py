from .mesh import (
    DATA_AXIS,
    STATE_AXIS,
    data_sharding,
    make_mesh,
    replicated,
    state_sharding,
)
from .sharded import make_sharded_advi_classifier_step, make_sharded_ksd_step
from .shard_state import (
    distributed_apply_1q,
    distributed_apply_cnot,
    distributed_apply_cz,
    distributed_kron_matvec,
)
from .distributed_ansatz import make_distributed_ansatz_probs
from .distributed_sampled import make_distributed_two_stage_sampler
from .distributed_train import (
    make_distributed_ksd_train_step,
    make_distributed_stein_matvec,
    make_distributed_stein_quadform,
    place_stein_tables,
)

__all__ = [
    "DATA_AXIS",
    "STATE_AXIS",
    "data_sharding",
    "distributed_apply_1q",
    "distributed_apply_cnot",
    "distributed_apply_cz",
    "distributed_kron_matvec",
    "make_distributed_ansatz_probs",
    "make_distributed_ksd_train_step",
    "make_distributed_stein_matvec",
    "make_distributed_stein_quadform",
    "make_distributed_two_stage_sampler",
    "make_mesh",
    "place_stein_tables",
    "make_sharded_advi_classifier_step",
    "make_sharded_ksd_step",
    "replicated",
    "state_sharding",
]
