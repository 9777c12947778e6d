"""Pallas TPU kernel: fused Stein-Gram matvec y = K_p @ q for n ≤ 17.

Fuses the three stages of ``ops.stein.stein_matvec`` — build the 3n+1 column
matrix V, apply the Kronecker base kernel K = A^{⊗n} to all columns, combine
with closed-form row weights — into one kernel, eliminating the intermediate
HBM round trips of the multi-op XLA path.

Mosaic constraints shape the design (this image's remote compiler rejects 3D
``dot_general``/``transpose``/gather/scatter/``rev`` inside kernels):

- group plan is fixed to (lead=7, mid=7, tail=n-14 ≤ 3):
  * lead pass:  one 2D matmul ``M7 @ X`` on the (128, 2^{n-7}·C) view;
  * mid pass:   ``fori_loop`` over the 128 lead prefixes, each a 2D matmul
                on the (128, 2^{n-14}·C) slab via ``pl.ds`` ref slices;
  * tail pass:  one 2D right-multiply by the static ``kron(Mtᵀ, I_C)`` —
                keeps 2^t·C lanes instead of a C-lane contraction;
- V build and the final combine are elementwise/row-reduction VPU work on
  the same resident values.

Forward-only by design: ``ops.stein.ksd_quadform``'s custom VJP reuses the
forward matvec as the gradient, so the backward never differentiates through
this kernel.

Status: validated against the XLA path in interpret mode
(tests/test_pallas_stein.py). Native compilation bisect on this image's
remote Mosaic build: elementwise/concat/slice-store/fori_loop+dynamic-slice
kernels all compile, but any in-kernel reshape that changes the LANE
dimension of a 2D buffer (e.g. ``(2^n, C) -> (128, 2^{n-7}·C)``) crashes the
compiler (HTTP 500) — and every pass of this kernel needs exactly such a
relayout. The production matvec therefore stays pure-XLA
(``ops.stein.stein_matvec``, size-adaptive layout); this kernel is the
fusion template for a backend with in-kernel relayout support.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ....core.bits import all_bitstrings
from ...hamming import decay_factor
from ...kron import kron_power_np

LEAD = 7
MID = 7


def supported(num_vars: int) -> bool:
    return LEAD + MID <= num_vars <= LEAD + MID + 3


def make_pallas_stein_matvec(S: np.ndarray, num_vars: int, length_scale: float = 1.0,
                             interpret: bool = False):
    """Build ``matvec(q) -> y`` with S, B baked as kernel inputs."""
    n = num_vars
    if not supported(n):
        raise ValueError(f"pallas stein matvec supports n in "
                         f"[{LEAD + MID}, {LEAD + MID + 3}], got {n}")
    tail = n - LEAD - MID
    size = 1 << n
    C = 3 * n + 1
    a = decay_factor(n, length_scale)
    A = np.array([[1.0, a], [a, 1.0]])
    M_lead = kron_power_np(A, LEAD).astype(np.float32)          # (128, 128)
    M_mid = kron_power_np(A, MID).astype(np.float32)            # (128, 128)
    M_tail = kron_power_np(A, tail).astype(np.float32)          # (2^t, 2^t)
    # Right-multiply operator for the tail pass: W[(j,c),(i,c)] = M[i,j].
    W_tail = np.kron(M_tail.T, np.eye(C, dtype=np.float32))     # (2^t*C, 2^t*C)
    B_np = all_bitstrings(n).astype(np.float32)
    S_np = np.asarray(S, dtype=np.float32)

    c1 = np.float32(1.0 - 1.0 / a)
    c2 = np.float32(1.0 - a)
    c_const = np.float32(2.0 * n * (1.0 - a))
    c_d = np.float32(2.0 * (1.0 / a - a))

    mid_slab = (1 << (n - LEAD))            # rows per lead prefix
    tail_cols = (1 << tail) * C

    def kernel(ml_ref, mm_ref, wt_ref, s_ref, b_ref, q_ref, y_ref, scratch):
        q = q_ref[:]                        # (size, 1)
        s = s_ref[:]                        # (size, n)
        b = b_ref[:]                        # (size, n)
        sb = s * b
        # V = [q, b*q, s*q, s*b*q]  -> (size, C)
        v = jnp.concatenate([q, b * q, s * q, sb * q], axis=1)

        # --- lead pass: contract bits [0, 7) ---
        x = v.reshape(128, (size // 128) * C)
        x = jnp.dot(ml_ref[:], x, preferred_element_type=jnp.float32)
        scratch[:] = x.reshape(size, C)

        # --- mid pass: contract bits [7, 14) per lead prefix ---
        def body(i, _):
            slab = scratch[pl.ds(i * mid_slab, mid_slab), :]
            s2 = slab.reshape(128, (mid_slab // 128) * C)
            s2 = jnp.dot(mm_ref[:], s2, preferred_element_type=jnp.float32)
            scratch[pl.ds(i * mid_slab, mid_slab), :] = s2.reshape(mid_slab, C)
            return 0

        jax.lax.fori_loop(0, 128, body, 0)

        # --- tail pass: contract bits [14, n) by right-multiplying W ---
        x = scratch[:].reshape(size // (1 << tail), tail_cols)
        x = jnp.dot(x, wt_ref[:], preferred_element_type=jnp.float32)
        Y = x.reshape(size, C)

        # --- combine with closed-form row weights (see ops.stein) ---
        P0 = Y[:, 0:1]
        P = Y[:, 1:n + 1]
        Q = Y[:, n + 1:2 * n + 1]
        T = Y[:, 2 * n + 1:]
        u = jnp.sum(sb, axis=1, keepdims=True)
        R = jnp.sum(s, axis=1, keepdims=True)
        h = jnp.sum(b, axis=1, keepdims=True)
        term_g = jnp.sum(s * Q, axis=1, keepdims=True)
        y_t1 = u * P0 + jnp.sum(s * (1.0 - 2.0 * b) * P, axis=1, keepdims=True)
        y_t1t = jnp.sum(T, axis=1, keepdims=True) + jnp.sum(b * (Q - 2.0 * T), axis=1, keepdims=True)
        y_ri = R * P0
        y_rj = jnp.sum(Q, axis=1, keepdims=True)
        y_d = h * P0 + jnp.sum(P, axis=1, keepdims=True) - 2.0 * jnp.sum(b * P, axis=1, keepdims=True)
        y = (term_g - c1 * (y_t1 + y_t1t) - c2 * (y_ri + y_rj - y_t1 - y_t1t)
             + c_const * P0 - c_d * y_d)
        y_ref[:] = y

    ml = jnp.asarray(M_lead)
    mm = jnp.asarray(M_mid)
    wt = jnp.asarray(W_tail)
    s_in = jnp.asarray(S_np)
    b_in = jnp.asarray(B_np)

    def matvec(q: jnp.ndarray) -> jnp.ndarray:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((size, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((size, C), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            interpret=interpret,
        )(ml, mm, wt, s_in, b_in, q.astype(jnp.float32).reshape(size, 1))
        return out[:, 0]

    return matvec
