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

__all__ = [
    "DATA_AXIS",
    "STATE_AXIS",
    "data_sharding",
    "distributed_apply_1q",
    "distributed_apply_cnot",
    "distributed_apply_cz",
    "distributed_kron_matvec",
    "make_distributed_ansatz_probs",
    "make_mesh",
    "make_sharded_advi_classifier_step",
    "make_sharded_ksd_step",
    "replicated",
    "state_sharding",
]
