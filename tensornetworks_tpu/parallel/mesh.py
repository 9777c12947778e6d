"""Device-mesh utilities for multi-chip scaling.

The reference has no distributed support at all (SURVEY.md §2 parallelism
inventory); the TPU-native equivalents here shard the ``2^n`` discrete state
axis (the workload's long axis — probabilities, score tables, Kronecker
matvec columns) and the sample batch axis over a ``jax.sharding.Mesh``,
letting GSPMD insert the ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STATE_AXIS = "state"
DATA_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None, dp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """2D ('dp', 'state') mesh over the first ``n_devices`` devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, only {len(devs)} available")
    if n % dp != 0:
        raise ValueError(f"n_devices={n} not divisible by dp={dp}")
    grid = np.array(devs[:n]).reshape(dp, n // dp)
    return Mesh(grid, (DATA_AXIS, STATE_AXIS))


def state_sharding(mesh: Mesh, ndim: int = 1, axis: int = 0) -> NamedSharding:
    """Shard array axis ``axis`` over the state mesh axis, replicate the rest."""
    spec = [None] * ndim
    spec[axis] = STATE_AXIS
    return NamedSharding(mesh, P(*spec))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
