from .mesh import (
    DATA_AXIS,
    STATE_AXIS,
    data_sharding,
    make_mesh,
    replicated,
    state_sharding,
)
from .sharded import make_sharded_advi_classifier_step, make_sharded_ksd_step

__all__ = [
    "DATA_AXIS",
    "STATE_AXIS",
    "data_sharding",
    "make_mesh",
    "make_sharded_advi_classifier_step",
    "make_sharded_ksd_step",
    "replicated",
    "state_sharding",
]
