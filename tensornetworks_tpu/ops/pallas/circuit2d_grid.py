"""Grid-tiled Pallas circuit kernels for large n (≥ ~18 qubits).

The whole-circuit kernels in ``circuit2d`` unroll every layer into one
Mosaic program with all per-layer rotation operators resident in VMEM; at
n = 20 (1024x1024 operator planes) that program is compile-bound (>15 min,
WORKLOG.md) and at n = 22 it cannot fit. This module keeps the *same math*
(the ``sim.blocked2d`` super-block formulation, op-for-op) but makes the
layer loop the **Pallas grid**:

- ``grid = (layers,)`` — TPU grid steps run sequentially on the core, so the
  state planes live in VMEM **scratch** that persists across steps; the
  statevector never round-trips HBM between layers.
- Each step streams only layer ``l``'s rotation operators from HBM
  ((1, R, R) / (1, C, C) blocks, double-buffered by the Pallas pipeline),
  so VMEM and — critically — the Mosaic program size are O(one layer), not
  O(L layers): compile time at n = 20 drops from >15 min (killed) to ~1 min.
- Layer-dependent CZ masks (hardware_efficient applies skip-CZs on even
  layers only) are selected in-kernel by grid-step parity; the Hadamard wall
  runs under ``@pl.when(step == 0)``; outputs are written on the last step.

The backward kernel walks the grid in reverse (index maps flip the layer
order), carrying state + cotangent planes in scratch and emitting per-layer
rotation-operator gradients as its per-step output blocks.

Replaces the XLA ``blocked`` fallback at 18-20 qubits (at 22, the per-layer
(R, R) operators alone exceed a reasonable VMEM share; ``blocked`` remains).
Reference semantics: identical distributions to ``sim.ansatz`` /
``quantum_born_machine.py:57-128`` (asserted in tests/test_pallas2d.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...sim.blocked import _chain_gates, _cz_pairs
from ...sim.blocked2d import _h_wall, _kron_h, _perm_matrix
from ...sim.gates import rot_zy_batched, rot_zyx_batched, batched_kron
from .circuit2d import (_dot, _left_real, _right_real, _rot_left, _rot_right,
                        _rot_left_conjT, _rot_right_conj, _sign_mask_expr)


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

    P_row = _perm_matrix(row_chain, rb)
    P_col = _perm_matrix(col_chain, cb)
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

    # CZ masks depend on the layer only through its parity for every ansatz
    # family (hardware_efficient: even layers only; all_to_all: constant;
    # basic: none) — verify and bake the two variants.
    even_pairs = _cz_pairs(n, 0, ansatz_type)
    odd_pairs = _cz_pairs(n, 1, ansatz_type)
    for layer in range(layers):
        expect = even_pairs if layer % 2 == 0 else odd_pairs
        assert _cz_pairs(n, layer, ansatz_type) == expect, ansatz_type
    any_cz = bool(even_pairs or odd_pairs)

    def _cz_mask(step):
        """±1 sign mask of grid step ``step``'s CZ layer (parity-selected)."""
        s_e = _sign_mask_expr(rb, cb, even_pairs) if even_pairs else jnp.ones((R, C), jnp.float32)
        s_o = _sign_mask_expr(rb, cb, odd_pairs) if odd_pairs else jnp.ones((R, C), jnp.float32)
        if even_pairs == odd_pairs:
            return s_e
        return jnp.where((step % 2) == 0, s_e, s_o)

    def _fwd_layer(step, x_re, x_im, mr_re, mr_im, mc_re, mc_im, rb_ref, cb_ref):
        """One layer, identical op order to circuit2d._apply_layer."""
        x_re, x_im = _rot_left(mr_re, mr_im, (x_re, x_im))
        x_re, x_im = _rot_right((x_re, x_im), mc_re, mc_im)
        if has_chain:
            x_re, x_im = _left_real(rb_ref[1], (x_re, x_im))
            if boundary:
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
        if any_cz:
            s = _cz_mask(step)
            x_re, x_im = x_re * s, x_im * s
        return x_re, x_im

    def fwd_kernel(mr_re_ref, mr_im_ref, mc_re_ref, mc_im_ref, rb_ref, cb_ref,
                   probs_ref, xr_ref, xi_ref, sr, si):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
            x_re = jnp.where((row_ids + col_ids) == 0, 1.0, 0.0).astype(jnp.float32)
            x_im = jnp.zeros((R, C), dtype=jnp.float32)
            if has_wall:
                x_re, x_im = _left_real(rb_ref[0], (x_re, x_im))
                x_re, x_im = _right_real((x_re, x_im), cb_ref[0].T)
            sr[:] = x_re
            si[:] = x_im

        x_re, x_im = _fwd_layer(step, sr[:], si[:],
                                mr_re_ref[0], mr_im_ref[0],
                                mc_re_ref[0], mc_im_ref[0], rb_ref, cb_ref)
        sr[:] = x_re
        si[:] = x_im

        @pl.when(step == layers - 1)
        def _emit():
            probs_ref[:] = x_re * x_re + x_im * x_im
            xr_ref[:] = x_re
            xi_ref[:] = x_im

    def bwd_kernel(mr_re_ref, mr_im_ref, mc_re_ref, mc_im_ref, rb_ref, cb_ref,
                   xr_ref, xi_ref, g_ref,
                   dmr_re_ref, dmr_im_ref, dmc_re_ref, dmc_im_ref,
                   sxr, sxi, slr, sli):
        """Adjoint sweep, one layer per grid step (grid step i handles layer
        ``layers-1-i``; the operator/output index maps do the reversal, so
        ``*_ref[0]`` is already this step's layer). Same stacked-dot
        pullbacks as circuit2d.bwd_kernel."""
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
            s_e = (_sign_mask_expr(rb, cb, even_pairs) if even_pairs
                   else jnp.ones((R, C), jnp.float32))
            s_o = (_sign_mask_expr(rb, cb, odd_pairs) if odd_pairs
                   else jnp.ones((R, C), jnp.float32))
            s = s_e if even_pairs == odd_pairs else jnp.where(
                layer_parity == 0, s_e, s_o)
            x_re, x_im = x_re * s, x_im * s
            l_re, l_im = l_re * s, l_im * s
        if has_chain:
            if ring:
                s = _sign_mask_expr(rb, cb, [(n - 1, 0)])
                x_re, x_im, l_re, l_im = _left_real(
                    rb_ref[2], (x_re, x_im, l_re, l_im))
                x_re, x_im = x_re * s, x_im * s
                l_re, l_im = l_re * s, l_im * s
                x_re, x_im, l_re, l_im = _left_real(
                    rb_ref[2], (x_re, x_im, l_re, l_im))
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
            x_re, x_im, l_re, l_im = _left_real(
                rb_ref[1].T, (x_re, x_im, l_re, l_im))
        # col rotation pullback + gradient
        mc_re, mc_im = mc_re_ref[0], mc_im_ref[0]
        xb_re, xb_im, lb_re, lb_im = _rot_right_conj(
            (x_re, x_im, l_re, l_im), mc_re, mc_im)
        Xb = jnp.concatenate([xb_re, xb_im], axis=0)
        dmc_re_ref[0] = _dot(jnp.concatenate([l_re, l_im], axis=0).T, Xb)
        dmc_im_ref[0] = _dot(jnp.concatenate([l_im, -l_re], axis=0).T, Xb)
        x_re, x_im, l_re, l_im = xb_re, xb_im, lb_re, lb_im
        # row rotation pullback + gradient
        mr_re, mr_im = mr_re_ref[0], mr_im_ref[0]
        xb_re, xb_im, lb_re, lb_im = _rot_left_conjT(
            mr_re, mr_im, (x_re, x_im, l_re, l_im))
        XbT = jnp.concatenate([xb_re, xb_im], axis=1).T
        dmr_re_ref[0] = _dot(jnp.concatenate([l_re, l_im], axis=1), XbT)
        dmr_im_ref[0] = _dot(jnp.concatenate([l_im, -l_re], axis=1), XbT)

        sxr[:] = xb_re
        sxi[:] = xb_im
        slr[:] = lb_re
        sli[:] = lb_im

    row_bank_j = jnp.asarray(row_bank)
    col_bank_j = jnp.asarray(col_bank)
    _vmem = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)

    def _layer_specs():
        return [
            pl.BlockSpec((1, R, R), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, R), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R, R), lambda l: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C, C), lambda l: (0, 0, 0), memory_space=pltpu.VMEM),
        ]

    def _rev_layer_specs():
        return [
            pl.BlockSpec((1, R, R), lambda i: (layers - 1 - i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, R), lambda i: (layers - 1 - i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), lambda i: (layers - 1 - i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), lambda i: (layers - 1 - i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, R, R), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ]

    _whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.custom_vjp
    def circuit_planes(mr_re, mr_im, mc_re, mc_im):
        probs, _, _ = _run_fwd(mr_re, mr_im, mc_re, mc_im)
        return probs

    def _run_fwd(mr_re, mr_im, mc_re, mc_im):
        return pl.pallas_call(
            fwd_kernel,
            grid=(layers,),
            out_shape=(jax.ShapeDtypeStruct((R, C), jnp.float32),
                       jax.ShapeDtypeStruct((R, C), jnp.float32),
                       jax.ShapeDtypeStruct((R, C), jnp.float32)),
            in_specs=_layer_specs(),
            out_specs=(pl.BlockSpec((R, C), lambda l: (0, 0), memory_space=pltpu.VMEM),) * 3,
            scratch_shapes=[pltpu.VMEM((R, C), jnp.float32)] * 2,
            compiler_params=_vmem,
            interpret=interpret,
        )(mr_re, mr_im, mc_re, mc_im, row_bank_j, col_bank_j)

    def circuit_planes_fwd(mr_re, mr_im, mc_re, mc_im):
        probs, xr, xi = _run_fwd(mr_re, mr_im, mc_re, mc_im)
        return probs, (mr_re, mr_im, mc_re, mc_im, xr, xi)

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
            in_specs=_rev_layer_specs() + [_whole(), _whole(), _whole()],
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
            M = U[:, lo]
            for q in range(lo + 1, hi):
                M = batched_kron(M, U[:, q])
            return M

        Mr = fold(0, rb)
        Mc = fold(rb, n)
        if embed_angles is not None:
            from ...sim.gates import ry_batched

            E = ry_batched(embed_angles.reshape(n)).astype(jnp.complex64)
            Er = E[0]
            for q in range(1, rb):
                Er = batched_kron(Er, E[q])
            Ec = E[rb]
            for q in range(rb + 1, n):
                Ec = batched_kron(Ec, E[q])
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
