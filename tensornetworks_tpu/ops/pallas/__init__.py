"""Production Pallas TPU kernels (2D super-block formulations — the op set
this image's Mosaic build compiles natively). Interpret-only fusion
templates are quarantined under ``templates/``."""

from .circuit2d import make_pallas_circuit2d_probs
from .stein2d import make_pallas_stein2d_matvec, make_pallas_stein2d_quadform

__all__ = [
    "make_pallas_circuit2d_probs",
    "make_pallas_stein2d_matvec",
    "make_pallas_stein2d_quadform",
]
