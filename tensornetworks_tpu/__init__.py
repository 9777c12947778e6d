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

__all__ = ["core", "__version__"]
