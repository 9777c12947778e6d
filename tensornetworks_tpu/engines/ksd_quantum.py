"""API-parity module: the reference ships the quantum engine as a separate
module with the same class name (``ksd_vi_quantum.py:18``). Import
``KSDVariationalInference`` from here for drop-in equivalence."""

from .ksd import QuantumKSDVariationalInference as KSDVariationalInference

__all__ = ["KSDVariationalInference"]
