"""Pallas TPU kernel: whole-circuit statevector forward with the state
resident in VMEM.

The einsum simulator (``sim/statevector.py``) issues one XLA op per gate, so
an L-layer, n-qubit ansatz makes ~L·(2n) round trips of the full state
through HBM. This kernel instead loads the state into VMEM once and applies
the *entire* gate program — Hadamard wall, fused per-qubit rotations, CNOT
chain/ring, CZ skips — before writing back, a ~2n·L reduction in HBM traffic.
At n ≤ 20 the complex64 state (two f32 planes ≤ 4 MB each) fits comfortably.

Complex arithmetic is explicit over (real, imag) f32 planes — TPU Pallas has
no native complex support. Single-qubit unitaries are scalar-broadcast VPU
work (no MXU needed); CNOT/CZ are slice permutations / sign flips.

The circuit structure is traced at kernel-build time from a gate list, so
each (ansatz, n, L) pair compiles one specialized kernel. Gradients: wrap via
``jax.custom_vjp`` with the einsum path as the backward (the forward pass
dominates sampling / inference workloads), or use the einsum path end-to-end
for training — both produce identical values (tested).

Status: validated in interpret mode (tests/test_pallas_circuit.py); on the
current image's Mosaic build the many tiny-axis reshapes still trip the
native TPU compiler, so the production circuit path is the blocked executor
(``sim/blocked.py``, pure-XLA MXU matmuls). Kept as the fusion template for
a lane-aligned rewrite.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Gate program ops — the kernel consumes a *resolved* program:
#   ("u1", qubit, idx)   — apply 2x2 unitary #idx from the unitary bank
#   ("cnot", control, target)
#   ("cz", q1, q2)
# Constant gates (the Hadamard wall) are bank entry 0; parameterized
# rotations start at index 1 (Pallas kernels cannot capture array constants).
GateProgram = List[Tuple]


def _apply_1q(re, im, ur, ui, k: int, n: int):
    """Apply 2x2 complex unitary (ur + i·ui, shape (2,2) scalars) to qubit k
    of the flat (2^n,) planes."""
    pre = 1 << k
    post = 1 << (n - k - 1)
    re_r = re.reshape(pre, 2, post)
    im_r = im.reshape(pre, 2, post)
    r0, r1 = re_r[:, 0, :], re_r[:, 1, :]
    i0, i1 = im_r[:, 0, :], im_r[:, 1, :]
    nr0 = ur[0, 0] * r0 - ui[0, 0] * i0 + ur[0, 1] * r1 - ui[0, 1] * i1
    ni0 = ur[0, 0] * i0 + ui[0, 0] * r0 + ur[0, 1] * i1 + ui[0, 1] * r1
    nr1 = ur[1, 0] * r0 - ui[1, 0] * i0 + ur[1, 1] * r1 - ui[1, 1] * i1
    ni1 = ur[1, 0] * i0 + ui[1, 0] * r0 + ur[1, 1] * i1 + ui[1, 1] * r1
    re = jnp.stack([nr0, nr1], axis=1).reshape(re.shape)
    im = jnp.stack([ni0, ni1], axis=1).reshape(im.shape)
    return re, im


def _apply_cnot(re, im, c: int, t: int, n: int):
    """Swap the target halves within the control=1 subspace (permutation)."""
    lo, hi = (c, t) if c < t else (t, c)
    a = 1 << lo
    b = 1 << (hi - lo - 1)
    d = 1 << (n - hi - 1)
    # axes: (a, 2[lo], b, 2[hi], d). A flip of a length-2 axis is a slice
    # swap — written as concatenations because Mosaic lacks a `rev` op.
    def cnot(x):
        v = x.reshape(a, 2, b, 2, d)
        if c < t:
            swapped = jnp.concatenate([v[:, 1:, :, 1:], v[:, 1:, :, :1]], axis=3)
            v = jnp.concatenate([v[:, :1], swapped], axis=1)
        else:
            swapped = jnp.concatenate([v[:, 1:, :, 1:], v[:, :1, :, 1:]], axis=1)
            v = jnp.concatenate([v[:, :, :, :1], swapped], axis=3)
        return v.reshape(x.shape)

    return cnot(re), cnot(im)


def _apply_cz(re, im, q1: int, q2: int, n: int):
    # Sign vector from index bits (no scatter — Mosaic has no scatter op).
    size = re.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)[:, 0]
    b1 = (idx >> (n - 1 - q1)) & 1
    b2 = (idx >> (n - 1 - q2)) & 1
    sign = (1 - 2 * (b1 * b2)).astype(re.dtype)
    return re * sign, im * sign


def build_circuit_kernel(program: GateProgram, num_wires: int, num_unitaries: int):
    """Compile a gate program into a single pallas_call.

    Returns ``run(u_bank_re, u_bank_im) -> probs`` where the unitary bank is
    ``(num_unitaries, 2, 2)`` f32 planes in program order for every "u1" op.
    """
    n = num_wires
    size = 1 << n

    def kernel(ur_ref, ui_ref, probs_ref):
        idx0 = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)[:, 0]
        re = jnp.where(idx0 == 0, 1.0, 0.0).astype(jnp.float32)
        im = jnp.zeros((size,), dtype=jnp.float32)
        for op in program:
            kind = op[0]
            if kind == "u1":
                _, q, idx = op
                re, im = _apply_1q(re, im, ur_ref[idx], ui_ref[idx], q, n)
            elif kind == "cnot":
                re, im = _apply_cnot(re, im, op[1], op[2], n)
            elif kind == "cz":
                re, im = _apply_cz(re, im, op[1], op[2], n)
            else:
                raise ValueError(f"unknown gate op {kind!r}")
        probs_ref[:] = re * re + im * im

    def run(u_re: jnp.ndarray, u_im: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((size,), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(u_re.astype(jnp.float32), u_im.astype(jnp.float32))

    return run


def ansatz_program(num_wires: int, layers: int, ansatz_type: str) -> Tuple[GateProgram, int]:
    """Gate program mirroring ``sim/ansatz.py`` (reference circuit families,
    ``quantum_born_machine.py:57-128``) with one fused rotation unitary per
    qubit per layer. Returns (program, number of parameterized unitaries)."""
    n = num_wires
    prog: GateProgram = []
    idx = 1  # bank slot 0 is the constant Hadamard
    if ansatz_type in ("hardware_efficient", "all_to_all"):
        for q in range(n):
            prog.append(("u1", q, 0))
    for layer in range(layers):
        for q in range(n):
            prog.append(("u1", q, idx))
            idx += 1
        if n > 1:
            if ansatz_type == "hardware_efficient":
                for q in range(n - 1):
                    prog.append(("cnot", q, q + 1))
                if n > 2:
                    prog.append(("cnot", n - 1, 0))
                if layer % 2 == 0 and n > 2:
                    for q in range(0, n - 2, 2):
                        prog.append(("cz", q, q + 2))
            elif ansatz_type == "all_to_all":
                for q1 in range(n):
                    for q2 in range(q1 + 1, n):
                        prog.append(("cz", q1, q2))
            else:  # basic
                for q in range(n - 1):
                    prog.append(("cnot", q, q + 1))
                if n > 2:
                    prog.append(("cnot", n - 1, 0))
    return prog, idx


def rotation_bank(params: jnp.ndarray, num_wires: int, layers: int,
                  ansatz_type: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused per-qubit rotation unitaries as (U, 2, 2) real/imag planes, in
    the same parameter order as the reference ansätze."""
    from ....sim.gates import H, rot_zy, rot_zyx

    n = num_wires
    mats = [jnp.asarray(H, dtype=jnp.complex64)]  # bank slot 0: Hadamard
    off = 0
    for _ in range(layers):
        for q in range(n):
            if ansatz_type in ("hardware_efficient", "all_to_all"):
                U = rot_zyx(params[off], params[off + 1], params[off + 2])
                off += 3
            else:
                U = rot_zy(params[off], params[off + 1])
                off += 2
            mats.append(U.astype(jnp.complex64))
    bank = jnp.stack(mats)  # (1 + U, 2, 2) complex
    return jnp.real(bank).astype(jnp.float32), jnp.imag(bank).astype(jnp.float32)


def make_fused_ansatz_probs(num_wires: int, layers: int, ansatz_type: str,
                            interpret: bool = False):
    """probs(params) with the whole circuit as one Pallas kernel."""
    program, n_u = ansatz_program(num_wires, layers, ansatz_type)
    run = build_circuit_kernel(program, num_wires, n_u)

    def probs(params: jnp.ndarray) -> jnp.ndarray:
        u_re, u_im = rotation_bank(params, num_wires, layers, ansatz_type)
        return run(u_re, u_im, interpret=interpret)

    return probs
