"""O(1)-memory adjoint backward for the blocked executor — large-n gradients.

``jax.grad`` through ``make_blocked_probs_fn`` (even with per-layer
``jax.checkpoint``) materializes several full-state temporaries per layer in
the transposed program; at n=28 each 2^n complex64 buffer is 2 GB and the
backward OOMs one chip's 16 GB HBM (measured: >20 concurrent 1 GB planes).
The adjoint method never stores intermediate states: it walks the circuit
backward, *recomputing* each predecessor state by applying inverse gates
(every gate is unitary), so the live set is two statevectors and one matmul
temporary regardless of depth.

TPU-native formulation (contrast ``sim.adjoint``, which walks per-gate on the
(2,)*n einsum executor — the per-gate path crashes the TPU worker at n≥16):

- The unit of the sweep is the *blocked layer op*, not the gate: per-qubit
  rotations stay Kronecker-folded into (2^b, 2^b) block operators
  (``make_block_matrices_fn``), so every full-state op in the backward is the
  same MXU block matmul the forward uses.
- ψ and the cotangent λ are pulled back as two separate flat (2^n,) vectors.
  (NOT as channels of one (2^n, 2) array: a trailing extent of 2 pads the
  lane axis 64× — measured as a 128 GiB allocation for a 2 GB buffer at
  n=28.)
- Per-parameter gradients never touch per-qubit generators: for block matrix
  M(θ) with both channels still at the post-M stage,

      dL/dθ = 2·Re ⟨λ| ∂M ·M† |ψ⟩ = 2·Re Σ_{xy} (∂M/∂θ)_{xy} · G_{xy},
      G = E·conj(M),   E_{b'b} = Σ_{a,c} conj(λ_{a b' c}) ψ_{a b c},

  where E is ONE (2^b, AC)·(AC, 2^b) contraction per block per layer (a few
  hundred GFLOP at n=28 — MXU work, not bandwidth), and the θ-derivatives of
  the *small* (2^b, 2^b) matrix function are delegated to ``jax.grad`` of
  ``f(θ) = 2·Re Σ M(θ)·G`` — exact, and automatically consistent with the
  forward's ZYX rotation composition and block-0 permutation folding.

Gradients match ``jax.grad`` through the blocked forward to float64 roundoff
(tests/test_blocked_adjoint.py). Used by the sampled-KSD engine for n ≥ 26
(``engines/sampled.py``), unlocking single-chip training at n = 28 where the
checkpointed autodiff backward OOMs.

Reference parity note: this replaces ``quantum_born_machine.py:58``'s
parameter-shift differentiation (2 extra circuit sims per parameter) with a
single backward sweep at O(1) state memory.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.kron import apply_adjacent_block
from .blocked import (_CNOT4, _H2, _blocks, _chain_gates, _cz_diag_device,
                      _cz_pairs, _hadamard_block, _local_perm_matrix,
                      make_block_matrices_fn, make_blocked_state_fn)


def make_blocked_adjoint_probs_fn(num_wires: int, layers: int, ansatz_type: str,
                                  block: int = 8, dtype=jnp.complex64):
    """probs(params) for the blocked executor with a custom adjoint VJP.

    Forward is exactly ``make_blocked_state_fn`` (bit-identical
    probabilities); the backward is the O(1)-memory layer-reversed sweep
    described in the module docstring. Supports the three reference ansätze
    (hardware_efficient / basic / all_to_all); conditioning is handled by the
    plain autodiff path (small n) and rejected here.
    """
    n = num_wires
    size = 1 << n
    blocks = _blocks(n, block)
    has_chain = ansatz_type in ("hardware_efficient", "basic")
    chain = _chain_gates(n, ansatz_type) if has_chain else []
    perms = [_local_perm_matrix(chain, s, bs) for (s, bs) in blocks] if chain else []
    boundaries = [(s - 1, s) for (s, _) in blocks[1:]]
    ring_cross = bool(chain) and n > 2 and len(blocks) > 1
    cz_pair_lists = [_cz_pairs(n, layer, ansatz_type) for layer in range(layers)]

    state_fn = make_blocked_state_fn(num_wires, layers, ansatz_type, block, dtype)
    block_matrices = make_block_matrices_fn(num_wires, layers, ansatz_type,
                                            block, dtype)

    def _apply_both(psi, lam, M, s, bs):
        return (apply_adjacent_block(psi, M, s, bs, n),
                apply_adjacent_block(lam, M, s, bs, n))

    def _pull_entanglers(psi, lam, layer):
        """Inverse of the layer's non-parametric tail (CZ wall, ring wrap,
        boundary CNOTs/perms) applied to both vectors."""
        if cz_pair_lists[layer]:
            d = _cz_diag_device(n, cz_pair_lists[layer])
            psi, lam = psi * d, lam * d  # ±1 diagonal: self-inverse
        if ring_cross:
            H = jnp.asarray(_H2, dtype=dtype)
            # (H₀·D·H₀)† = H₀·D·H₀ — the wrap is an involution.
            psi, lam = _apply_both(psi, lam, H, 0, 1)
            d = _cz_diag_device(n, [(n - 1, 0)])
            psi, lam = psi * d, lam * d
            psi, lam = _apply_both(psi, lam, H, 0, 1)
        if chain:
            for i in range(len(blocks) - 1, 0, -1):
                if perms[i] is not None:
                    psi, lam = _apply_both(psi, lam,
                                           jnp.asarray(perms[i].T, dtype=dtype),
                                           blocks[i][0], blocks[i][1])
                c, _t = boundaries[i - 1]
                psi, lam = _apply_both(psi, lam,
                                       jnp.asarray(_CNOT4, dtype=dtype), c, 2)
        return psi, lam

    def _block_cotangent(psi, lam, s, bs):
        """E_{b'b} = Σ_{a,c} conj(λ_{a b' c}) ψ_{a b c} as one MXU matmul."""
        A = 1 << s
        B = 1 << bs
        C = size // (A * B)
        return jnp.einsum("aic,ajc->ij",
                          jnp.conj(lam).reshape(A, B, C),
                          psi.reshape(A, B, C))

    def _p(psi):
        # real²+imag² on the planar views — one f32 output, no |ψ| temp
        # (abs**2 materializes an extra 2^n f32 plane; at n=28 that 1 GB is
        # the difference between 16.05 GiB and fitting the 16 GiB chip).
        return jnp.real(psi) ** 2 + jnp.imag(psi) ** 2

    def probs_fn(params):
        return _p(state_fn(params))

    @jax.custom_vjp
    def probs(params):
        return probs_fn(params)

    def fwd(params):
        psi = state_fn(params)
        return _p(psi), (params, psi)

    def bwd(res, w):
        params, psi = res
        # p = ψ∘conj(ψ) ⇒ dL/dθ = 2·Re⟨λ|∂ψ/∂θ⟩ with λ = w∘ψ (w real).
        lam = w.astype(dtype) * psi
        mats = block_matrices(params)      # list of (layers, 2^b, 2^b)
        Gs = [[] for _ in blocks]          # per-block matrix cotangents
        for layer in range(layers - 1, -1, -1):
            psi, lam = _pull_entanglers(psi, lam, layer)
            # Rotation blocks act on disjoint qubits (they commute): process
            # each with both vectors still at the post-block stage, then
            # pull both back through M†.
            for i, (s, bs) in enumerate(blocks):
                # Barriers pin the sweep's schedule: without them XLA holds
                # >16 concurrent 1 GB relayout-copy temps across the unrolled
                # per-block einsums and exceeds the 16 GiB chip at n=28.
                # Pull BOTH vectors back first (each stage frees its input),
                # then form the cotangent from the pulled pair:
                #   2·Re⟨λ|∂M|ψ_b⟩ = 2·Re Σ ∂M_{xb}·(conj(M)·E')_{xb},
                #   E'_{b'b} = Σ conj(λ_b)_{ab'c}·(ψ_b)_{abc}
                # — mathematically identical to contracting pre-pullback
                # (tests pin it), but the peak live set drops to ψ+λ+one
                # temp instead of ψ+λ+both reshape copies+both outputs.
                M = mats[i][layer]
                Mh = jnp.conj(M).T
                psi = apply_adjacent_block(psi, Mh, s, bs, n)
                psi, lam = jax.lax.optimization_barrier((psi, lam))
                lam = apply_adjacent_block(lam, Mh, s, bs, n)
                E = _block_cotangent(psi, lam, s, bs)
                G = jnp.conj(M) @ E
                # G rides THROUGH the barrier: it ties each block's
                # cotangent contraction into the sweep's dependency chain,
                # so the scheduler cannot defer all 4L contractions to the
                # end of the sweep (which would pin every stage's ψ/λ
                # alive simultaneously — measured 49 GB at n=28).
                psi, lam, G = jax.lax.optimization_barrier((psi, lam, G))
                Gs[i].append(jax.lax.stop_gradient(G))
        # Gs[i] collected layers-last-first; stack back to (layers, B, B).
        Gst = [jnp.stack(g[::-1]) for g in Gs]

        def f(p):
            ms = block_matrices(p)
            tot = jnp.zeros((), dtype=jnp.float32)
            for i in range(len(blocks)):
                tot = tot + 2.0 * jnp.real(jnp.sum(ms[i] * Gst[i])).astype(jnp.float32)
            return tot

        return (jax.grad(f)(params),)

    probs.defvjp(fwd, bwd)
    return probs
