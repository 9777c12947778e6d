"""Grid-tiled Pallas circuit kernels for large n (≥ ~18 qubits).

The whole-circuit kernels in ``circuit2d`` unroll every layer into one
Mosaic program with all per-layer rotation operators resident in VMEM; at
n = 20 (1024x1024 operator planes) that program is compile-bound (>15 min,
WORKLOG.md) and at n = 22 it cannot fit. This module keeps the *same math*
(the ``sim.blocked2d`` super-block formulation) but makes the layer loop the
**Pallas grid**:

- ``grid = (layers,)`` — TPU grid steps run sequentially on the core, so the
  state planes live in VMEM **scratch** that persists across steps; the
  statevector never round-trips HBM between layers.
- Each step streams only layer ``l``'s rotation operators from HBM
  ((1, R, R) / (1, C, C) blocks, double-buffered by the Pallas pipeline),
  so VMEM and — critically — the Mosaic program size are O(one layer), not
  O(L layers): the unrolled kernel never finishes compiling at n = 20, this
  one compiles in ~2.5 min.
- Layer-dependent CZ masks (hardware_efficient applies skip-CZs on even
  layers only) are selected in-kernel by grid-step parity; outputs are
  written on the last step.

VMEM design notes (the first version OOMed at 146M/128M):
- The Hadamard wall is never materialized: wall ∘ |0..0⟩ is the uniform
  constant 1/sqrt(2^n), so the initial state is built from iota/constants.
- The row-chain permutation is folded into the streamed operators (P @ Mr,
  exact — it applies directly after the layer rotation), shrinking the
  resident bank to one (R, R) + two (C, C) matrices.
- Kernel math uses plain per-plane dots, NOT the lane-concatenated stacked
  dots of ``circuit2d`` — fewer/smaller live temporaries (the stacked form
  cost 74M of Mosaic register-spill slots at n = 20); compile time stays
  fine because the program is one layer.

The backward kernel walks the grid in reverse (index maps flip the layer
order), carrying state + cotangent planes in scratch and emitting per-layer
rotation-operator gradients as its per-step output blocks.

Replaces the XLA ``blocked`` fallback at 18-20 qubits (at 22, the per-layer
(R, R) operators alone exceed a reasonable VMEM share; ``blocked`` remains).
Reference semantics: identical distributions to ``sim.ansatz`` /
``quantum_born_machine.py:57-128`` (asserted in
tests/test_pallas_circuit2d_grid.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...sim.blocked import _chain_gates, _cz_pairs
from ...sim.blocked2d import _kron_h, _perm_matrix
from ...sim.gates import kron_fold, rot_zy_batched, rot_zyx_batched, batched_kron
from .circuit2d import _dot, _sign_mask_expr


def make_pallas_circuit2d_grid_probs(num_wires: int, layers: int,
                                     ansatz_type: str, interpret: bool = False,
                                     conditioning: bool = False):
    """probs(params[, embed_angles]) -> (2^n,) with the circuit as one
    grid-over-layers Pallas kernel (forward + adjoint backward)."""
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

    # Row-chain permutation folds into the streamed operators (P @ Mr);
    # the col-chain permutation sits between the boundary CNOT and the
    # ring, so it stays a bank op.
    P_row = _perm_matrix(row_chain, rb)
    P_row_j = (jnp.asarray(np.real(P_row).astype(np.float32))
               if P_row is not None else None)
    P_col = _perm_matrix(col_chain, cb)
    assert len(boundary) <= 1, boundary  # nearest-neighbor chain: one split
    # Split-crossing CNOTs collapse algebraically: H_t CZ(c,t) H_t applied
    # to X is  X - 2·mask_c ∘ (W X)  (or X @ W on the column side) with
    # W = H0 diag(bit_t) H0 — static, SYMMETRIC, and the whole op is
    # involutive, so forward, state pullback and cotangent pullback all use
    # the SAME one-dot form (vs two H matmuls + a full (R, C) mask).
    def _w_matrix(H: np.ndarray, bit_vals: np.ndarray) -> np.ndarray:
        return (H @ np.diag(bit_vals.astype(np.float64)) @ H).astype(np.float32)

    row_ids_np = np.arange(R)
    col_ids_np = np.arange(C)
    # ring CNOT(n-1 -> 0): control = last col bit, target = row bit 0 (MSB)
    Wr_ring = _w_matrix(np.real(_kron_h(rb, 0)),
                        (row_ids_np >> (rb - 1)) & 1)  # (R, R)
    # boundary CNOT(rb-1 -> rb): control = row bit rb-1, target = col bit 0
    Wc_bound = _w_matrix(np.real(_kron_h(cb, 0)) if cb else np.ones((1, 1)),
                         (col_ids_np >> (cb - 1)) & 1 if cb else np.zeros(1))
    row_bank = Wr_ring  # (R, R)
    col_bank = np.stack([
        np.real(P_col).astype(np.float32) if P_col is not None else np.eye(C, dtype=np.float32),
        Wc_bound,
    ])  # (2, C, C): col perm, boundary W

    # CZ masks depend on the layer only through its parity for every ansatz
    # family (hardware_efficient: even layers only; all_to_all: constant;
    # basic: none) — verify and bake the two variants.
    even_pairs = _cz_pairs(n, 0, ansatz_type)
    odd_pairs = _cz_pairs(n, 1, ansatz_type)
    for layer in range(layers):
        expect = even_pairs if layer % 2 == 0 else odd_pairs
        assert _cz_pairs(n, layer, ansatz_type) == expect, ansatz_type
    any_cz = bool(even_pairs or odd_pairs)

    def _cz_mask(parity):
        s_e = (_sign_mask_expr(rb, cb, even_pairs) if even_pairs
               else jnp.ones((R, C), jnp.float32))
        s_o = (_sign_mask_expr(rb, cb, odd_pairs) if odd_pairs
               else jnp.ones((R, C), jnp.float32))
        if even_pairs == odd_pairs:
            return s_e
        return jnp.where(parity == 0, s_e, s_o)

    def _ring_mask():
        """(1, C) indicator of the ring control (col bit cb-1, the LSB)."""
        return (jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) & 1
                ).astype(jnp.float32)

    def _bound_mask():
        """(R, 1) indicator of the boundary control (row bit rb-1, LSB)."""
        return (jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) & 1
                ).astype(jnp.float32)

    def _chain_ops_fwd(x_re, x_im, rh_ref, cb_ref):
        """boundary CNOT, col perm, ring CNOT — the one-dot W forms."""
        if boundary:
            m = _bound_mask()
            x_re = x_re - 2.0 * m * _dot(x_re, cb_ref[1])
            x_im = x_im - 2.0 * m * _dot(x_im, cb_ref[1])
        x_re = _dot(x_re, cb_ref[0].T)
        x_im = _dot(x_im, cb_ref[0].T)
        if ring:
            m = _ring_mask()
            x_re = x_re - 2.0 * m * _dot(rh_ref[:], x_re)
            x_im = x_im - 2.0 * m * _dot(rh_ref[:], x_im)
        return x_re, x_im

    def fwd_kernel(mr_re_ref, mr_im_ref, mc_re_ref, mc_im_ref, rh_ref, cb_ref,
                   xr_ref, xi_ref):
        # The state planes live in the OUTPUT refs: their block index is
        # constant across grid steps, so the window stays resident in VMEM
        # ("revisiting") and is flushed to HBM once at the end — no separate
        # scratch, 8 MB less VMEM.
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            if has_wall:
                # wall ∘ |0..0⟩ = uniform amplitude 1/sqrt(2^n).
                xr_ref[:] = jnp.full((R, C), 1.0 / np.sqrt(float(1 << n)),
                                     dtype=jnp.float32)
            else:
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
                col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
                xr_ref[:] = jnp.where((row_ids + col_ids) == 0, 1.0, 0.0
                                      ).astype(jnp.float32)
            xi_ref[:] = jnp.zeros((R, C), dtype=jnp.float32)

        x_re, x_im = xr_ref[:], xi_ref[:]
        mr_re, mr_im = mr_re_ref[0], mr_im_ref[0]
        mc_re, mc_im = mc_re_ref[0], mc_im_ref[0]
        # rotations (+ folded row perm): X <- (Mr X) Mcᵀ, complex
        t_re = _dot(mr_re, x_re) - _dot(mr_im, x_im)
        t_im = _dot(mr_re, x_im) + _dot(mr_im, x_re)
        x_re = _dot(t_re, mc_re.T) - _dot(t_im, mc_im.T)
        x_im = _dot(t_im, mc_re.T) + _dot(t_re, mc_im.T)
        if has_chain:
            x_re, x_im = _chain_ops_fwd(x_re, x_im, rh_ref, cb_ref)
        if any_cz:
            s = _cz_mask(step % 2)
            x_re, x_im = x_re * s, x_im * s
        xr_ref[:] = x_re
        xi_ref[:] = x_im

    def bwd_kernel(mr_re_ref, mr_im_ref, mc_re_ref, mc_im_ref, rh_ref, cb_ref,
                   xr_ref, xi_ref, g_ref,
                   dmr_re_ref, dmr_im_ref, dmc_re_ref, dmc_im_ref,
                   sxr, sxi, slr, sli):
        """Adjoint sweep, one layer per grid step (grid step i handles layer
        ``layers-1-i``; the operator/output index maps do the reversal, so
        ``*_ref[0]`` is already this step's layer)."""
        step = pl.program_id(0)
        layer_parity = (layers - 1 - step) % 2

        @pl.when(step == 0)
        def _init():
            sxr[:] = xr_ref[:]
            sxi[:] = xi_ref[:]
            slr[:] = 2.0 * g_ref[:] * xr_ref[:]
            sli[:] = 2.0 * g_ref[:] * xi_ref[:]

        x_re, x_im = sxr[:], sxi[:]
        l_re, l_im = slr[:], sli[:]

        if any_cz:
            s = _cz_mask(layer_parity)
            x_re, x_im = x_re * s, x_im * s
            l_re, l_im = l_re * s, l_im * s
        if has_chain:
            # The W-form CNOTs are involutive AND symmetric, so state
            # inversion and cotangent pullback are the same op.
            if ring:
                m = _ring_mask()
                x_re = x_re - 2.0 * m * _dot(rh_ref[:], x_re)
                x_im = x_im - 2.0 * m * _dot(rh_ref[:], x_im)
                l_re = l_re - 2.0 * m * _dot(rh_ref[:], l_re)
                l_im = l_im - 2.0 * m * _dot(rh_ref[:], l_im)
            # undo col perm: forward was X @ Pᵀ -> inverse X @ P; λ -> λ @ P.
            x_re = _dot(x_re, cb_ref[0])
            x_im = _dot(x_im, cb_ref[0])
            l_re = _dot(l_re, cb_ref[0])
            l_im = _dot(l_im, cb_ref[0])
            if boundary:
                m = _bound_mask()
                x_re = x_re - 2.0 * m * _dot(x_re, cb_ref[1])
                x_im = x_im - 2.0 * m * _dot(x_im, cb_ref[1])
                l_re = l_re - 2.0 * m * _dot(l_re, cb_ref[1])
                l_im = l_im - 2.0 * m * _dot(l_im, cb_ref[1])
        # ---- col rotation: forward X_after = X_before @ Mcᵀ (complex).
        mc_re, mc_im = mc_re_ref[0], mc_im_ref[0]
        # X_before = X_after @ conj(Mc); λ pulls back identically. The
        # operator gradient pairs the PRE-pullback cotangent with the
        # post-pullback state (circuit2d.bwd_kernel).
        xb_re = _dot(x_re, mc_re) + _dot(x_im, mc_im)
        xb_im = _dot(x_im, mc_re) - _dot(x_re, mc_im)
        dmc_re_ref[0] = _dot(l_re.T, xb_re) + _dot(l_im.T, xb_im)
        dmc_im_ref[0] = _dot(l_im.T, xb_re) - _dot(l_re.T, xb_im)
        lb_re = _dot(l_re, mc_re) + _dot(l_im, mc_im)
        lb_im = _dot(l_im, mc_re) - _dot(l_re, mc_im)
        # ---- row rotation (+ folded perm): forward X_after = Mr @ X_before.
        mr_re, mr_im = mr_re_ref[0], mr_im_ref[0]
        x_re = _dot(mr_re.T, xb_re) + _dot(mr_im.T, xb_im)
        x_im = _dot(mr_re.T, xb_im) - _dot(mr_im.T, xb_re)
        dmr_re_ref[0] = _dot(lb_re, x_re.T) + _dot(lb_im, x_im.T)
        dmr_im_ref[0] = _dot(lb_im, x_re.T) - _dot(lb_re, x_im.T)
        l_re = _dot(mr_re.T, lb_re) + _dot(mr_im.T, lb_im)
        l_im = _dot(mr_re.T, lb_im) - _dot(mr_im.T, lb_re)

        sxr[:] = x_re
        sxi[:] = x_im
        slr[:] = l_re
        sli[:] = l_im

    row_bank_j = jnp.asarray(row_bank)
    col_bank_j = jnp.asarray(col_bank)
    _vmem = pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)

    def _layer_specs(rev: bool):
        idx = ((lambda i: (layers - 1 - i, 0, 0)) if rev
               else (lambda l: (l, 0, 0)))
        return [
            pl.BlockSpec((1, R, R), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, R), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ]

    _whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.custom_vjp
    def circuit_planes(mr_re, mr_im, mc_re, mc_im):
        xr, xi = _run_fwd(mr_re, mr_im, mc_re, mc_im)
        return xr * xr + xi * xi

    def _run_fwd(mr_re, mr_im, mc_re, mc_im):
        return pl.pallas_call(
            fwd_kernel,
            grid=(layers,),
            out_shape=(jax.ShapeDtypeStruct((R, C), jnp.float32),
                       jax.ShapeDtypeStruct((R, C), jnp.float32)),
            in_specs=_layer_specs(rev=False),
            out_specs=(pl.BlockSpec((R, C), lambda l: (0, 0), memory_space=pltpu.VMEM),) * 2,
            compiler_params=_vmem,
            interpret=interpret,
        )(mr_re, mr_im, mc_re, mc_im, row_bank_j, col_bank_j)

    def circuit_planes_fwd(mr_re, mr_im, mc_re, mc_im):
        xr, xi = _run_fwd(mr_re, mr_im, mc_re, mc_im)
        return xr * xr + xi * xi, (mr_re, mr_im, mc_re, mc_im, xr, xi)

    def circuit_planes_bwd(res, g):
        mr_re, mr_im, mc_re, mc_im, xr, xi = res
        rev = lambda i: (layers - 1 - i, 0, 0)
        dmr_re, dmr_im, dmc_re, dmc_im = pl.pallas_call(
            bwd_kernel,
            grid=(layers,),
            out_shape=(jax.ShapeDtypeStruct((layers, R, R), jnp.float32),
                       jax.ShapeDtypeStruct((layers, R, R), jnp.float32),
                       jax.ShapeDtypeStruct((layers, C, C), jnp.float32),
                       jax.ShapeDtypeStruct((layers, C, C), jnp.float32)),
            in_specs=_layer_specs(rev=True) + [_whole(), _whole(), _whole()],
            out_specs=(
                pl.BlockSpec((1, R, R), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, R), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, C), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, C), rev, memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((R, C), jnp.float32)] * 4,
            compiler_params=_vmem,
            interpret=interpret,
        )(mr_re, mr_im, mc_re, mc_im, row_bank_j, col_bank_j, xr, xi, g)
        return dmr_re, dmr_im, dmc_re, dmc_im

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
            Mr = Mr.at[0].set(Mr[0] @ Er)
            Mc = Mc.at[0].set(Mc[0] @ Ec)
        mr_re = jnp.real(Mr).astype(jnp.float32)
        mr_im = jnp.imag(Mr).astype(jnp.float32)
        if P_row_j is not None:
            # fold the (real) row-chain permutation: streamed op = P @ Mr_l
            mr_re = jnp.einsum("ij,ljk->lik", P_row_j, mr_re)
            mr_im = jnp.einsum("ij,ljk->lik", P_row_j, mr_im)
        out = circuit_planes(
            mr_re, mr_im,
            jnp.real(Mc).astype(jnp.float32), jnp.imag(Mc).astype(jnp.float32))
        return out.reshape(-1)

    if conditioning:
        def probs_fn(params: jnp.ndarray, embed_angles) -> jnp.ndarray:
            return _build(params, embed_angles)
    else:
        def probs_fn(params: jnp.ndarray) -> jnp.ndarray:
            return _build(params)

    return probs_fn
