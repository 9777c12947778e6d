"""MXU precision knob for the Pallas kernels.

TPU f32 matmuls run as multi-pass bf16 contractions; the pass count is the
accuracy/throughput trade:

- ``HIGHEST`` (6 passes, default): full f32-equivalent accuracy. The
  framework's quality audit (RESULTS.md) showed single-pass DEFAULT degrades
  final KSD-VI TVD 24x, so kernels default to the safe end.
- ``HIGH`` (3 passes): ~2x faster dots in XLA, but **unsupported by the
  Mosaic kernel lowering on this backend** ("Unsupported dot precision:
  HIGH") — only DEFAULT and HIGHEST lower inside pallas_call. The knob is
  kept for future backends; on current TPUs the only kernel-precision
  choices are DEFAULT (1 bf16 pass, degrades KSD-VI TVD 24x) and HIGHEST.

Set the precision *before* constructing kernels (the value is read at trace
time): ``set_kernel_precision("high")`` or env ``TNTPU_KERNEL_PRECISION``.
"""

from __future__ import annotations

import os

import jax

_NAMES = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

# NOTE: Mosaic's dot lowering supports only DEFAULT and HIGHEST — "high"
# (3-pass bf16) raises NotImplementedError in pallas kernels, so kernels
# keep HIGHEST even though the XLA-side production precision is HIGH.
_KERNEL_PRECISION = _NAMES[os.environ.get("TNTPU_KERNEL_PRECISION", "highest").lower()]


def set_kernel_precision(precision) -> None:
    """Set the dot precision used by subsequently *built* Pallas kernels."""
    global _KERNEL_PRECISION
    if isinstance(precision, str):
        precision = _NAMES[precision.lower()]
    _KERNEL_PRECISION = precision


def _kernel_precision():
    return _KERNEL_PRECISION
