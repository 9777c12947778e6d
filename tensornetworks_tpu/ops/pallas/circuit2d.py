"""Pallas TPU kernel: whole-circuit forward on the 2D super-block state.

Uses the ``sim.blocked2d`` formulation — the state is a FIXED-shape (R, C)
matrix and every circuit element is a dot or an elementwise sign multiply —
which is exactly the op set this image's Mosaic compiler accepts (no
reshapes, no gathers; see the Mosaic bisect notes in RESULTS.md, optimization
log #23).

Complex arithmetic runs on (re, im) f32 planes; a complex matmul is four real
MXU dots. The per-layer rotation operators arrive as kernel inputs (built by
XLA from θ with batched Kronecker folds — cheap); CZ sign masks are derived
in-kernel from ``broadcasted_iota``. One kernel evaluates the entire circuit
with the state resident in VMEM.

Scope: forward only (sampling / inference / custom-VJP forward reuse). The
hardware_efficient and basic families are supported; all_to_all reduces to
rotations + one mask per layer and also works.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .precision import _kernel_precision

from ...sim.blocked import _chain_gates, _cz_pairs
from ...sim.blocked2d import _h_wall, _kron_h, _perm_matrix
from ...sim.gates import kron_fold, rot_zy_batched, rot_zyx_batched, batched_kron


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_kernel_precision())


def _left_real(Bm, planes):
    """Bm @ p for each plane: one dot on the lane-concatenated stack."""
    k = planes[0].shape[1]
    Y = _dot(Bm, jnp.concatenate(planes, axis=1))
    return tuple(Y[:, i * k:(i + 1) * k] for i in range(len(planes)))


def _right_real(planes, Bm):
    """p @ Bm for each plane: one dot on the sublane-concatenated stack."""
    k = planes[0].shape[0]
    Y = _dot(jnp.concatenate(planes, axis=0), Bm)
    return tuple(Y[i * k:(i + 1) * k] for i in range(len(planes)))


def _rot_left(m_re, m_im, planes):
    """Complex M @ X on (re, im) plane pairs: two stacked dots."""
    k = planes[0].shape[1]
    S = jnp.concatenate(planes, axis=1)
    U1, U2 = _dot(m_re, S), _dot(m_im, S)
    u = lambda Y, i: Y[:, i * k:(i + 1) * k]
    out = []
    for i in range(0, len(planes), 2):
        out.append(u(U1, i) - u(U2, i + 1))
        out.append(u(U1, i + 1) + u(U2, i))
    return tuple(out)


def _rot_right(planes, m_re, m_im):
    """Complex X @ Mᵀ on (re, im) plane pairs: two stacked dots."""
    k = planes[0].shape[0]
    S = jnp.concatenate(planes, axis=0)
    U1, U2 = _dot(S, m_re.T), _dot(S, m_im.T)
    u = lambda Y, i: Y[i * k:(i + 1) * k]
    out = []
    for i in range(0, len(planes), 2):
        out.append(u(U1, i) - u(U2, i + 1))
        out.append(u(U1, i + 1) + u(U2, i))
    return tuple(out)


def _rot_right_conj(planes, m_re, m_im):
    """Complex X @ conj(M) (the unitary inverse / cotangent pullback of
    the right rotation): two stacked dots."""
    k = planes[0].shape[0]
    S = jnp.concatenate(planes, axis=0)
    U1, U2 = _dot(S, m_re), _dot(S, m_im)
    u = lambda Y, i: Y[i * k:(i + 1) * k]
    out = []
    for i in range(0, len(planes), 2):
        out.append(u(U1, i) + u(U2, i + 1))
        out.append(u(U1, i + 1) - u(U2, i))
    return tuple(out)


def _rot_left_conjT(m_re, m_im, planes):
    """Complex M† @ X (inverse / pullback of the left rotation)."""
    k = planes[0].shape[1]
    S = jnp.concatenate(planes, axis=1)
    U1, U2 = _dot(m_re.T, S), _dot(m_im.T, S)
    u = lambda Y, i: Y[:, i * k:(i + 1) * k]
    out = []
    for i in range(0, len(planes), 2):
        out.append(u(U1, i) + u(U2, i + 1))
        out.append(u(U1, i + 1) - u(U2, i))
    return tuple(out)


def _sign_mask_expr(rb: int, cb: int, pairs: List[Tuple[int, int]]):
    """In-kernel (R, C) ±1 mask from broadcasted_iota for a set of CZ pairs."""
    R, C = 1 << rb, 1 << cb
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    sign = jnp.ones((R, C), dtype=jnp.float32)
    for a, b in pairs:
        av = ((row_ids >> (rb - 1 - a)) & 1) if a < rb else ((col_ids >> (cb - 1 - (a - rb))) & 1)
        bv = ((row_ids >> (rb - 1 - b)) & 1) if b < rb else ((col_ids >> (cb - 1 - (b - rb))) & 1)
        sign = sign * (1.0 - 2.0 * (av * bv).astype(jnp.float32))
    return sign


def make_pallas_circuit2d_probs(num_wires: int, layers: int, ansatz_type: str,
                                interpret: bool = False, conditioning: bool = False):
    """probs(params[, embed_angles]) -> (2^n,) with the whole circuit as one
    Pallas kernel. With ``conditioning=True`` the RY(angle) embedding wall is
    Kronecker-folded into the layer-0 rotation operators on the XLA side —
    the kernels are unchanged."""
    n = num_wires
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb
    per_qubit = 3 if ansatz_type in ("hardware_efficient", "all_to_all") else 2
    has_chain = ansatz_type in ("hardware_efficient", "basic")
    chain = _chain_gates(n, ansatz_type) if has_chain else []
    row_chain = [(c, t) for c, t in chain if c < rb and t < rb]
    col_chain = [(c - rb, t - rb) for c, t in chain if c >= rb and t >= rb]
    boundary = [(c, t) for c, t in chain
                if (c < rb) != (t < rb) and not (c == n - 1 and t == 0)]
    ring = bool(chain) and n > 2
    has_wall = ansatz_type in ("hardware_efficient", "all_to_all")

    P_row = _perm_matrix(row_chain, rb)
    P_col = _perm_matrix(col_chain, cb)
    # All static real operators stack into one bank per side.
    row_bank = np.stack([
        np.real(_h_wall(rb)).astype(np.float32),
        np.real(P_row).astype(np.float32) if P_row is not None else np.eye(R, dtype=np.float32),
        np.real(_kron_h(rb, 0)).astype(np.float32),
    ])  # (3, R, R): wall, perm, H0
    col_bank = np.stack([
        np.real(_h_wall(cb)).astype(np.float32),
        np.real(P_col).astype(np.float32) if P_col is not None else np.eye(C, dtype=np.float32),
        np.real(_kron_h(cb, 0)).astype(np.float32),
    ])  # (3, C, C)
    cz_layer_pairs = [_cz_pairs(n, layer, ansatz_type) for layer in range(layers)]

    # Stacked-dot helpers (module level): every multi-plane matmul runs as
    # ONE (or two, for complex operators) MXU dots on lane-/sublane-
    # concatenated planes — measured ~2x fewer Mosaic dots per layer than the
    # per-plane form, at identical math. Lane concat + aligned lane slices
    # compile natively (probed on this Mosaic build); no lane-changing
    # reshapes are used.

    def kernel(mr_re_ref, mr_im_ref, mc_re_ref, mc_im_ref, rb_ref, cb_ref,
               probs_ref):
        f32 = jnp.float32
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        x_re = jnp.where((row_ids + col_ids) == 0, 1.0, 0.0).astype(f32)
        x_im = jnp.zeros((R, C), dtype=f32)
        if has_wall:
            x_re, x_im = _left_real(rb_ref[0], (x_re, x_im))
            x_re, x_im = _right_real((x_re, x_im), cb_ref[0].T)
        for layer in range(layers):
            x_re, x_im = _apply_layer(layer, x_re, x_im,
                                      mr_re_ref[layer], mr_im_ref[layer],
                                      mc_re_ref[layer], mc_im_ref[layer],
                                      rb_ref, cb_ref)
        probs_ref[:] = x_re * x_re + x_im * x_im

    # NOTE: the row-chain permutation is NOT folded into the rotation matrix
    # here (unlike sim.blocked2d) — it is applied as its own matmul from the
    # static bank, so the op order is rot, perm_row, boundary, perm_col, ring.

    def fwd_kernel(mr_re_ref, mr_im_ref, mc_re_ref, mc_im_ref, rb_ref, cb_ref,
                   probs_ref, xr_ref, xi_ref):
        """Forward that also outputs the final state planes (bwd residual)."""
        f32 = jnp.float32
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        x_re = jnp.where((row_ids + col_ids) == 0, 1.0, 0.0).astype(f32)
        x_im = jnp.zeros((R, C), dtype=f32)
        if has_wall:
            x_re, x_im = _left_real(rb_ref[0], (x_re, x_im))
            x_re, x_im = _right_real((x_re, x_im), cb_ref[0].T)
        for layer in range(layers):
            x_re, x_im = _apply_layer(layer, x_re, x_im,
                                      mr_re_ref[layer], mr_im_ref[layer],
                                      mc_re_ref[layer], mc_im_ref[layer],
                                      rb_ref, cb_ref)
        probs_ref[:] = x_re * x_re + x_im * x_im
        xr_ref[:] = x_re
        xi_ref[:] = x_im

    def _apply_layer(layer, x_re, x_im, mr_re, mr_im, mc_re, mc_im, rb_ref, cb_ref):
        x_re, x_im = _rot_left(mr_re, mr_im, (x_re, x_im))
        x_re, x_im = _rot_right((x_re, x_im), mc_re, mc_im)
        if has_chain:
            x_re, x_im = _left_real(rb_ref[1], (x_re, x_im))
            if boundary:
                # cb_ref[2] (H on the leading column qubit) is symmetric.
                x_re, x_im = _right_real((x_re, x_im), cb_ref[2])
                s = _sign_mask_expr(rb, cb, boundary)
                x_re, x_im = x_re * s, x_im * s
                x_re, x_im = _right_real((x_re, x_im), cb_ref[2])
            x_re, x_im = _right_real((x_re, x_im), cb_ref[1].T)
            if ring:
                x_re, x_im = _left_real(rb_ref[2], (x_re, x_im))
                s = _sign_mask_expr(rb, cb, [(n - 1, 0)])
                x_re, x_im = x_re * s, x_im * s
                x_re, x_im = _left_real(rb_ref[2], (x_re, x_im))
        if cz_layer_pairs[layer]:
            s = _sign_mask_expr(rb, cb, cz_layer_pairs[layer])
            x_re, x_im = x_re * s, x_im * s
        return x_re, x_im

    def bwd_kernel(mr_re_ref, mr_im_ref, mc_re_ref, mc_im_ref, rb_ref, cb_ref,
                   xr_ref, xi_ref, g_ref,
                   dmr_re_ref, dmr_im_ref, dmc_re_ref, dmc_im_ref):
        """Adjoint sweep: reverse the circuit, pulling the state back with
        inverse (unitary-transpose) ops and the cotangent with transposed
        ops, emitting per-layer rotation-matrix gradients. The state and
        cotangent planes pull back under the SAME operators, so all four
        planes ride one stacked dot per op (the gradient outer products
        stack the two (re, im) contractions the same way)."""
        x_re, x_im = xr_ref[:], xi_ref[:]
        g = g_ref[:]
        l_re, l_im = 2.0 * g * x_re, 2.0 * g * x_im

        for layer in range(layers - 1, -1, -1):
            if cz_layer_pairs[layer]:
                s = _sign_mask_expr(rb, cb, cz_layer_pairs[layer])
                x_re, x_im = x_re * s, x_im * s
                l_re, l_im = l_re * s, l_im * s
            if has_chain:
                if ring:
                    s = _sign_mask_expr(rb, cb, [(n - 1, 0)])
                    # undo: H (symmetric orthogonal), mask, H
                    x_re, x_im, l_re, l_im = _left_real(
                        rb_ref[2], (x_re, x_im, l_re, l_im))
                    x_re, x_im = x_re * s, x_im * s
                    l_re, l_im = l_re * s, l_im * s
                    x_re, x_im, l_re, l_im = _left_real(
                        rb_ref[2], (x_re, x_im, l_re, l_im))
                # undo col perm: forward was X @ Pᵀ -> inverse X @ P;
                # cotangent of (X @ Pᵀ) pulls back as λ @ P.
                x_re, x_im, l_re, l_im = _right_real(
                    (x_re, x_im, l_re, l_im), cb_ref[1])
                if boundary:
                    s = _sign_mask_expr(rb, cb, boundary)
                    x_re, x_im, l_re, l_im = _right_real(
                        (x_re, x_im, l_re, l_im), cb_ref[2])
                    x_re, x_im = x_re * s, x_im * s
                    l_re, l_im = l_re * s, l_im * s
                    x_re, x_im, l_re, l_im = _right_real(
                        (x_re, x_im, l_re, l_im), cb_ref[2])
                # undo row perm: forward P @ X -> inverse Pᵀ @ X; λ -> Pᵀ @ λ.
                x_re, x_im, l_re, l_im = _left_real(
                    rb_ref[1].T, (x_re, x_im, l_re, l_im))
            # ---- col rotation: forward X_after = X_before @ Mcᵀ (complex).
            mc_re, mc_im = mc_re_ref[layer], mc_im_ref[layer]
            # X_before = X_after @ conj(Mc); λ pulls back identically.
            xb_re, xb_im, lb_re, lb_im = _rot_right_conj(
                (x_re, x_im, l_re, l_im), mc_re, mc_im)
            # grads: dmc_re = l_reᵀ xb_re + l_imᵀ xb_im (one stacked dot);
            #        dmc_im = l_imᵀ xb_re - l_reᵀ xb_im.
            Xb = jnp.concatenate([xb_re, xb_im], axis=0)
            dmc_re_ref[layer] = _dot(jnp.concatenate([l_re, l_im], axis=0).T, Xb)
            dmc_im_ref[layer] = _dot(jnp.concatenate([l_im, -l_re], axis=0).T, Xb)
            x_re, x_im, l_re, l_im = xb_re, xb_im, lb_re, lb_im
            # ---- row rotation: forward X_after = Mr @ X_before (complex).
            mr_re, mr_im = mr_re_ref[layer], mr_im_ref[layer]
            xb_re, xb_im, lb_re, lb_im = _rot_left_conjT(
                mr_re, mr_im, (x_re, x_im, l_re, l_im))
            XbT = jnp.concatenate([xb_re, xb_im], axis=1).T
            dmr_re_ref[layer] = _dot(jnp.concatenate([l_re, l_im], axis=1), XbT)
            dmr_im_ref[layer] = _dot(jnp.concatenate([l_im, -l_re], axis=1), XbT)
            x_re, x_im, l_re, l_im = xb_re, xb_im, lb_re, lb_im

    row_bank_j = jnp.asarray(row_bank)
    col_bank_j = jnp.asarray(col_bank)

    @jax.custom_vjp
    def circuit_planes(mr_re, mr_im, mc_re, mc_im):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_interp[0],
        )(mr_re, mr_im, mc_re, mc_im, row_bank_j, col_bank_j)
        return out

    def circuit_planes_fwd(mr_re, mr_im, mc_re, mc_im):
        probs, xr, xi = pl.pallas_call(
            fwd_kernel,
            out_shape=(jax.ShapeDtypeStruct((R, C), jnp.float32),
                       jax.ShapeDtypeStruct((R, C), jnp.float32),
                       jax.ShapeDtypeStruct((R, C), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_interp[0],
        )(mr_re, mr_im, mc_re, mc_im, row_bank_j, col_bank_j)
        return probs, (mr_re, mr_im, mc_re, mc_im, xr, xi)

    def circuit_planes_bwd(res, g):
        mr_re, mr_im, mc_re, mc_im, xr, xi = res
        dmr_re, dmr_im, dmc_re, dmc_im = pl.pallas_call(
            bwd_kernel,
            out_shape=(jax.ShapeDtypeStruct((layers, R, R), jnp.float32),
                       jax.ShapeDtypeStruct((layers, R, R), jnp.float32),
                       jax.ShapeDtypeStruct((layers, C, C), jnp.float32),
                       jax.ShapeDtypeStruct((layers, C, C), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 4,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_interp[0],
        )(mr_re, mr_im, mc_re, mc_im, row_bank_j, col_bank_j, xr, xi, g)
        return dmr_re, dmr_im, dmc_re, dmc_im

    _interp = [interpret]
    circuit_planes.defvjp(circuit_planes_fwd, circuit_planes_bwd)

    def _build(params, embed_angles=None):
        angles = params.reshape(layers, n, per_qubit)
        if per_qubit == 3:
            U = rot_zyx_batched(angles[..., 0], angles[..., 1], angles[..., 2])
        else:
            U = rot_zy_batched(angles[..., 0], angles[..., 1])
        U = U.astype(jnp.complex64)

        def fold(lo, hi):
            return kron_fold([U[:, q] for q in range(lo, hi)])

        Mr = fold(0, rb)
        Mc = fold(rb, n)
        if embed_angles is not None:
            from ...sim.gates import ry_batched

            E = ry_batched(embed_angles.reshape(n)).astype(jnp.complex64)
            Er = kron_fold([E[q] for q in range(rb)])
            Ec = kron_fold([E[q] for q in range(rb, n)])
            # Embedding applies before layer 0's rotations:
            # X <- Mr0 (Er X Ecᵀ) Mc0ᵀ = (Mr0 Er) X (Mc0 Ec)ᵀ.
            Mr = Mr.at[0].set(Mr[0] @ Er)
            Mc = Mc.at[0].set(Mc[0] @ Ec)
        out = circuit_planes(
            jnp.real(Mr).astype(jnp.float32), jnp.imag(Mr).astype(jnp.float32),
            jnp.real(Mc).astype(jnp.float32), jnp.imag(Mc).astype(jnp.float32))
        return out.reshape(-1)

    if conditioning:
        def probs_fn(params: jnp.ndarray, embed_angles) -> jnp.ndarray:
            return _build(params, embed_angles)
    else:
        def probs_fn(params: jnp.ndarray) -> jnp.ndarray:
            return _build(params)

    return probs_fn
