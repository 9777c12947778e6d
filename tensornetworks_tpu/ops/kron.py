"""Kronecker-structured axis application — the framework's core contraction.

One primitive serves two hot paths:

1. **Statevector gate application** (the PQC simulator): a k-qubit gate is a
   ``(2^k, 2^k)`` matrix applied to k axes of the ``(2,)*n`` state tensor.
2. **KSD base-kernel matvec**: the Hamming kernel
   ``k(z, z') = a^{hamming(z, z')}`` factorizes as the Kronecker power
   ``K = A^{⊗n}`` with ``A = [[1, a], [a, 1]]``, so ``K @ q`` is n sequential
   2x2-axis applications — O(n·2^n) instead of the O(4^n) dense product. With
   axes grouped in blocks of 7 the per-block matrix is 128x128, exactly one
   MXU tile.

Axis convention: variable/qubit 0 is the most significant bit of the flat
state index (see ``core.bits``), i.e. axis 0 of the ``(2,)*n`` view.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def kron_power_np(A: np.ndarray, g: int) -> np.ndarray:
    """A^{⊗g} as a dense (2^g, 2^g) numpy array (host, float64)."""
    M = np.array([[1.0]], dtype=np.float64)
    for _ in range(g):
        M = np.kron(M, np.asarray(A, dtype=np.float64))
    return M


def apply_adjacent_block(v: jnp.ndarray, M: jnp.ndarray, start: int, g: int, num_vars: int,
                         accumulate_dtype=None) -> jnp.ndarray:
    """Apply M (2^g x 2^g) to the adjacent variable block [start, start+g).

    ``v`` has shape ``(2^n,)`` or ``(2^n, C)`` (trailing channel axis). The
    contraction is a single ``(2^g)``-dim matmul over a reshaped view — on TPU
    this lands on the MXU when ``2^g`` is a multiple of the tile size.
    ``accumulate_dtype`` overrides the MXU accumulation precision (for
    reduced-precision inputs with float32 accumulation).
    """
    batched = v.ndim == 2
    c = v.shape[1] if batched else 1
    pre = 1 << start
    blk = 1 << g
    post = (1 << (num_vars - start - g)) * c
    acc = accumulate_dtype or v.dtype
    if post == 1:
        # Final-block fast path: contract on the lane axis — (pre, blk) @ Mᵀ
        # keeps the minor dimension large instead of a post=1 layout.
        out = jnp.einsum("aj,ij->ai", v.reshape(pre, blk), M,
                         preferred_element_type=acc)
        return out.reshape(v.shape)
    if post < 128 and blk * post <= 1024:
        # Small trailing extent (e.g. the last group of a multi-column
        # matvec): a direct contraction would put `post` on the lane axis.
        # Right-multiply by the static kron(Mᵀ, I_post) instead, keeping
        # blk*post lanes: Y[a, (i,p)] = Σ_j X[a, (j,p)] M[i, j].
        eye = jnp.eye(post, dtype=M.dtype)
        W = jnp.einsum("ij,pq->jpiq", M, eye).reshape(blk * post, blk * post)
        out = jnp.einsum("aj,jk->ak", v.reshape(pre, blk * post), W,
                         preferred_element_type=acc)
        return out.reshape(v.shape)
    vr = v.reshape(pre, blk, post)
    out = jnp.einsum("ij,ajb->aib", M, vr, preferred_element_type=acc)
    return out.reshape(v.shape)


def kron_matvec(v: jnp.ndarray, A: np.ndarray, num_vars: int, group: int = 7,
                compute_dtype=None) -> jnp.ndarray:
    """(A^{⊗n}) @ v via grouped adjacent-block applications.

    ``v``: ``(2^n,)`` or ``(2^n, C)`` — all C columns share the contraction,
    amortizing bandwidth. ``A`` is a host-side 2x2 (any square) matrix; the
    grouped powers are folded into the jitted program as constants.

    (Measured note: fewer, larger passes win on this backend — splitting the
    tail into extra small lane-friendly groups costs more than the padded
    contraction it avoids, so grouping is simple sequential chunks; the
    kron(Mᵀ, I) right-multiply in ``apply_adjacent_block`` still catches
    small trailing extents within the final chunk.)

    ``compute_dtype`` (e.g. ``jnp.bfloat16``): run the contractions with
    inputs cast down but float32 MXU accumulation — halves pass bandwidth at
    ~3e-3 relative error; the final output is cast back to v's dtype.
    """
    if num_vars == 0:
        return v
    dtype = v.dtype
    io_dtype = compute_dtype or dtype
    # Multi-column inputs keep the remainder group LAST (the kron(Mᵀ, I_C)
    # right-multiply handles a small tail with full lanes); single-column
    # inputs put the remainder FIRST — their tail would hit the (pre, 2^r)
    # 2D path whose tiny lane axis TPU pads up to 64x.
    multi = v.ndim == 2 and v.shape[1] > 1
    plan = (_group_plan_tail(num_vars, group) if multi
            else _group_plan_head(num_vars, group))
    out = v.astype(io_dtype)
    for s, g in plan:
        M = jnp.asarray(kron_power_np(A, g), dtype=io_dtype)
        out = apply_adjacent_block(out, M, s, g, num_vars,
                                   accumulate_dtype=dtype if compute_dtype else None)
        if compute_dtype is not None:
            out = out.astype(io_dtype)
    return out.astype(dtype)


def _group_plan_head(num_vars: int, group: int):
    """Remainder-first grouping: the final group stays full-width."""
    r = num_vars % group
    plan = [(0, r)] if r else []
    plan += [(s, group) for s in range(r, num_vars, group)]
    return plan


def _group_plan_tail(num_vars: int, group: int):
    """Sequential grouping: any remainder lands in the final (tail) group."""
    plan = []
    s = 0
    while s < num_vars:
        g = min(group, num_vars - s)
        plan.append((s, g))
        s += g
    return plan


def _group_plan_balanced(num_vars: int, group: int):
    """Pass-count-minimal balanced grouping with sizes capped at group+1.

    Each pass costs a full read+write of the (C, 2^n) operand, so pass count
    dominates at large n; per-pass FLOPs scale 2^size, so sizes are balanced.
    The remainder-first plan this replaces could emit a tiny remainder group —
    at n=22, group=7 it produced a 4th pass with a 2-extent contraction (a
    whole extra 368 MB round trip to apply one 2x2)."""
    if num_vars == 0:
        return []
    k = -(-num_vars // (group + 1))
    base = num_vars // k
    rem = num_vars - base * k
    sizes = [base + 1] * rem + [base] * (k - rem)
    plan = []
    s = 0
    for g in sizes:
        plan.append((s, g))
        s += g
    return plan


def kron_matvec_rows(v: jnp.ndarray, A: np.ndarray, num_vars: int, group: int = 7) -> jnp.ndarray:
    """(A^{⊗n}) applied along the TRAILING state axis of every row of a
    ``(C, 2^n)`` matrix.

    The row layout keeps the huge state extent on the lane axis for every
    grouped pass (the column layout of ``kron_matvec`` pads a C<128 lane
    axis on its final group); the last group's contraction flips to the
    lane-axis 2D-matmul form.
    """
    if num_vars == 0:
        return v
    dtype = v.dtype
    c = v.shape[0]
    out = v
    for s, g in _group_plan_balanced(num_vars, group):
        M = jnp.asarray(kron_power_np(A, g), dtype=dtype)
        pre = c << s
        blk = 1 << g
        post = 1 << (num_vars - s - g)
        if post == 1:
            out = jnp.einsum("aj,ij->ai", out.reshape(pre, blk), M,
                             preferred_element_type=dtype)
        else:
            out = jnp.einsum("ij,ajb->aib", M, out.reshape(pre, blk, post),
                             preferred_element_type=dtype)
        out = out.reshape(c, -1)
    return out


def apply_to_wires(state_nd: jnp.ndarray, U: jnp.ndarray, wires) -> jnp.ndarray:
    """Apply a k-wire operator U (2^k x 2^k) to axes ``wires`` of the
    ``(2,)*n`` state tensor (arbitrary, possibly non-adjacent wires).

    The simulator's gate primitive: ``jnp.tensordot`` contracts the input
    axes, then ``moveaxis`` restores wire order. XLA fuses the transpose into
    the contraction.
    """
    wires = list(wires)
    k = len(wires)
    U_nd = U.reshape((2,) * (2 * k))
    out = jnp.tensordot(U_nd, state_nd, axes=(list(range(k, 2 * k)), wires))
    return jnp.moveaxis(out, list(range(k)), wires)
