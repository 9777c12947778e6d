"""Production Pallas TPU kernels (2D super-block formulations — the op set
this image's Mosaic build compiles natively). The earlier interpret-only
fusion templates (per-gate circuit kernel, 3n+1 fused matvec) were deleted
in round 4 after two rounds superseded; their Mosaic-bisect findings live in
RESULTS.md (optimization log #23)."""

from .circuit2d import make_pallas_circuit2d_probs
from .stein2d import make_pallas_stein2d_matvec, make_pallas_stein2d_quadform

__all__ = [
    "make_pallas_circuit2d_probs",
    "make_pallas_stein2d_matvec",
    "make_pallas_stein2d_quadform",
]
