"""Problem-structured (DAG-aware) ansatz: entanglers follow the Bayesian
network's edges instead of a hardware chain.

Beyond-reference capability, motivated by the 16-qubit trainability study
(RESULTS.md "Objective quality at scale"): hardware-efficient circuits stall
at TVD ≈ 0.8 under cold-start KSD at 16 qubits, while this ansatz — same
parameter count, entangling map = the latent sub-DAG of the target network —
reaches **TVD 0.16 from a cold start** (and 0.04 under a direct fit),
because its correlation structure matches the posterior's.

Circuit (per layer ℓ): RZ·RY·RX on every qubit, then along every DAG edge
(parent, child) in topological order: CNOT(parent → child) on even layers,
CZ(parent, child) on odd layers. Parameter count 3·L·n, identical to
``hardware_efficient``. Optional angle-embedding conditioning (an RY(x_q)
wall after the Hadamard wall) makes the DAG ansatz usable for amortized
inference.

Two executors:

- ``make_structured_probs_fn_flat`` — the production TPU path, built on the
  blocked executor's flat-state machinery (see its docstring for the layout
  rules that make arbitrary-topology CNOTs lane-friendly).
- ``make_structured_probs_fn`` — the 2D super-block flip-select form. Exact
  and the CPU/test reference, but its per-edge reshape+axis-reverse flips
  relayout-crawl on the TPU backend for low-order bits (measured 59
  ms/forward at 20 qubits vs 17 ms for the flat executor).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.kron import apply_adjacent_block
from .gates import batched_kron, kron_fold, rot_zyx_batched, ry_batched

_SX = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=np.complex64)


def make_structured_probs_fn_flat(num_wires: int, layers: int,
                                  edges: Sequence[Tuple[int, int]],
                                  block: int = 8, dtype=jnp.complex64,
                                  conditioning: bool = False,
                                  reupload: bool = False,
                                  remat_layers: bool = False):
    """Flat-state (blocked-executor) evaluation of the DAG-structured ansatz
    — the production TPU path.

    The 2D flip-select executor below is exact but its per-edge
    reshape+axis-reverse flips relayout-crawl on the TPU for low-order bits
    (measured 59 ms/forward and ~8 min compiles at 20 qubits). Here every
    circuit element rides the layout machinery the blocked executor already
    proved out on this backend:

    - rotations: per-block Kronecker folds, one (2^b, 2^b) matmul per block
      per layer (same as ``sim.blocked``);
    - even-layer CNOT(c, t): a 2x2 σx contraction on qubit t's axis
      (``apply_adjacent_block`` — lane-friendly at every position, including
      the trailing-extent special cases) gated by an iota-derived control
      mask: ``state + m_c ∘ (σx_t state − state)``;
    - odd-layer CZs: one iota-derived ±1 diagonal for the whole layer.

    Gate order matches ``make_structured_probs_fn`` exactly (edges applied
    in sequence), so the two executors agree amplitude-for-amplitude
    (tests/test_structured_ansatz.py).
    """
    from .blocked import _blocks, _cz_diag_device

    n = num_wires
    size = 1 << n
    edges = [(int(c), int(t)) for c, t in edges]
    for c, t in edges:
        if not (0 <= c < n and 0 <= t < n) or c == t:
            raise ValueError(f"bad edge ({c}, {t}) for {n} wires")
    has_edges = bool(edges)
    blocks = _blocks(n, block)
    # numpy, NOT factory-scope device arrays: embedding a live complex64
    # device buffer as a jit constant needs a D2H fetch that the axon
    # backend rejects (UNIMPLEMENTED); numpy constants embed host-side.
    npdt = np.dtype(dtype)
    # Trailing-qubit gates: a bare 2x2 contraction at qubit t >= n-tg puts a
    # sub-128 extent on the lane axis (64x padding). Embed σx into a
    # (2^tg, 2^tg) operator on the ALIGNED trailing block instead — the
    # lane-axis right-multiply path of apply_adjacent_block then runs with
    # full lanes. (This was a 5x whole-forward regression before the fix.)
    tg = min(7, n)
    tstart = n - tg

    def _embed_trailing(M2: np.ndarray, pos: int) -> np.ndarray:
        out = np.eye(1, dtype=npdt)
        for q in range(tg):
            out = np.kron(out, M2 if q == pos else np.eye(2))
        return out.astype(npdt)

    sx_embed = {t: _embed_trailing(_SX, t - tstart)
                for t in range(tstart, n)}

    def _local_cnot(c: int, t: int) -> np.ndarray:
        """(2^tg, 2^tg) permutation of CNOT(c, t) inside the trailing block."""
        idx = np.arange(1 << tg, dtype=np.int64)
        cb = 1 << (tg - 1 - (c - tstart))
        tb = 1 << (tg - 1 - (t - tstart))
        fwd = idx ^ (((idx & cb) >> int(np.log2(cb))) * tb)
        P = np.zeros((1 << tg, 1 << tg), dtype=npdt)
        P[fwd, idx] = 1.0
        return P

    # Per-edge plan for even layers, preserving edge order: runs of edges
    # fully inside the trailing block compose into ONE permutation matmul;
    # every other edge is one masked X-gate application.
    plan = []  # ("perm", matrix) | ("cx", c, t, sx_matrix)
    for c, t in edges:
        if c >= tstart and t >= tstart:
            P = _local_cnot(c, t)
            if plan and plan[-1][0] == "perm":
                plan[-1] = ("perm", P @ plan[-1][1])
            else:
                plan.append(("perm", P))
        else:
            M = sx_embed[t] if t >= tstart else _SX.astype(npdt)
            plan.append(("cx", c, t, M))

    def control_mask(c):
        b = (jax.lax.iota(jnp.int32, size) >> (n - 1 - c)) & 1
        return b.astype(jnp.float32)

    def block_matrices(params):
        angles = params.reshape(layers, n, 3)
        U = rot_zyx_batched(angles[..., 0], angles[..., 1],
                            angles[..., 2]).astype(dtype)
        out = []
        for s, bs in blocks:
            out.append(kron_fold([U[:, q] for q in range(s, s + bs)]))
        return out

    # Data re-uploading cost model: folding E into the per-layer rotation
    # operators costs L·2^(3b) per block (matrix-matrix) vs L·2^(n+b) for
    # applying the wall to the state (matrix-vector) — fold only when
    # n >= 2b, i.e. when the state pass dominates. Identical semantics
    # either way (tests/test_structured_ansatz.py reupload oracle).
    bs_max = max(bs for _, bs in blocks)
    fold_embed = reupload and n >= 2 * bs_max

    def run(params, embed_angles=None):
        state = jnp.full((size,), 1.0 / np.sqrt(float(size)), dtype=dtype)
        mats = block_matrices(params)
        emb, per_layer = None, False
        if conditioning:
            if embed_angles is None:
                raise ValueError("conditioning=True requires embed_angles")
            ea = jnp.asarray(embed_angles)
            per_layer = ea.ndim == 2
            if per_layer:
                # Per-layer wall angles (layers, n): each re-uploaded wall
                # gets its own RY angles (cond_embed_per_layer). Same fold
                # cost model — the per-layer E_l folds into the layer's
                # rotation operator stack batched over l.
                if not reupload:
                    raise ValueError(
                        "per-layer embed_angles require reupload=True")
                E = ry_batched(ea.reshape(layers, n)).astype(dtype)
                emb = [kron_fold([E[:, q] for q in range(s, s + bs)])
                       for s, bs in blocks]  # (layers, 2^bs, 2^bs) each
                if fold_embed:
                    for i in range(len(blocks)):
                        mats[i] = jnp.einsum("lij,ljk->lik", mats[i], emb[i])
            else:
                E = ry_batched(ea.reshape(n)).astype(dtype)
                emb = []
                for i, (s, bs) in enumerate(blocks):
                    M = kron_fold([E[q] for q in range(s, s + bs)])
                    emb.append(M)
                    if fold_embed:
                        # Re-uploading: the RY(x) wall precedes EVERY layer,
                        # folded into the per-layer rotation operators — zero
                        # extra full-state matmuls. Restores conditional
                        # expressivity a single input wall lacks (the
                        # amortized 16q plateau, RESULTS.md).
                        mats[i] = jnp.einsum("lij,jk->lik", mats[i], M)
                if not reupload:
                    for (s, bs), M in zip(blocks, emb):
                        state = apply_adjacent_block(state, M, s, bs, n)
        def layer_body(l, state, Ms, emb_t):
            if emb_t:
                for (s, bs), M in zip(blocks, emb_t):
                    state = apply_adjacent_block(state, M, s, bs, n)
            for (s, bs), M in zip(blocks, Ms):
                state = apply_adjacent_block(state, M, s, bs, n)
            if not has_edges:
                return state
            if l % 2 == 0:
                for step in plan:
                    if step[0] == "perm":
                        state = apply_adjacent_block(
                            state, jnp.asarray(step[1]), tstart, tg, n)
                    else:
                        _, c, t, M = step
                        if t >= tstart:
                            flipped = apply_adjacent_block(
                                state, jnp.asarray(M), tstart, tg, n)
                        else:
                            flipped = apply_adjacent_block(
                                state, jnp.asarray(M), t, 1, n)
                        m = control_mask(c)
                        state = state + m * (flipped - state)
            else:
                state = state * _cz_diag_device(n, edges)
            return state

        for l in range(layers):
            Ms = [mats[i][l] for i in range(len(blocks))]
            emb_t = ()
            if reupload and not fold_embed:
                emb_t = (tuple(M[l] for M in emb) if per_layer
                         else tuple(emb))
            if remat_layers:
                state = jax.checkpoint(partial(layer_body, l))(state, Ms, emb_t)
            else:
                state = layer_body(l, state, Ms, emb_t)
        return jnp.real(state * jnp.conj(state))

    if conditioning:
        return run

    def probs(params: jnp.ndarray) -> jnp.ndarray:
        return run(params)

    return probs


# ---------------------------------------------------------------------------
# GF(2)-composed executor: the round-3 production path.
#
# Every CNOT is linear over GF(2) on the basis-state index bits, so a whole
# even layer's edge sequence composes into ONE invertible GF(2) matrix A
# (A = Π_(c,t) (I + e_t e_cᵀ), applied in edge order). On the (R, C)
# super-block view of the state (rows = leading rb qubits, cols = the rest),
# a block-LU factorization of A turns the layer into
#
#   A = [[I,0],[B,I]] · [[I,G],[0,I]] · [[Arr,0],[0,Sc]]
#
# i.e. (1) independent row/column index permutations (folded into the
# layer's rotation matrices as STATIC row-gathers — zero extra matmuls),
# then (2) at most cb row-bit flip-blends masked by column bits (G, empty
# when all edges go low→high), then (3) at most rb column-bit flip-blends
# masked by row bits (B). The flips run in a transposed orientation so the
# flipped bits are always on the SUBLANE side (lane-axis bit reversals
# relayout-crawl on TPU — CLAUDE.md round-2 rules); the transpose itself is
# free because it is absorbed into the surrounding matmuls' einsum forms.
#
# Result: an even layer costs the same two (R,R)/(C,C) matmuls as a plain
# rotation layer plus ~rank(B) bandwidth-only masked reversals, vs one full
# masked σx contraction per edge in the flat executor.
# ---------------------------------------------------------------------------


def _gf2_compose(edges: Sequence[Tuple[int, int]], n: int) -> np.ndarray:
    """A = Π (I + e_t e_cᵀ) over GF(2), edges applied in order (new bit_t =
    bit_t ⊕ bit_c): row t accumulates row c of the running map."""
    A = np.eye(n, dtype=np.uint8)
    for c, t in edges:
        A[t] ^= A[c]
    return A


def _gf2_inv(M: np.ndarray) -> np.ndarray:
    """Inverse of an invertible GF(2) matrix (Gauss-Jordan)."""
    n = M.shape[0]
    A = M.astype(np.uint8).copy()
    I = np.eye(n, dtype=np.uint8)
    for col in range(n):
        piv = next((r for r in range(col, n) if A[r, col]), None)
        if piv is None:
            raise ValueError("singular GF(2) matrix")
        if piv != col:
            A[[col, piv]] = A[[piv, col]]
            I[[col, piv]] = I[[piv, col]]
        for r in range(n):
            if r != col and A[r, col]:
                A[r] ^= A[col]
                I[r] ^= I[col]
    return I


def _gf2_index_map(M: np.ndarray) -> np.ndarray:
    """int map over all 2^m indices of the GF(2) linear map M (MSB-first bit
    encoding: bit q of index i is (i >> (m-1-q)) & 1): out[i] = enc(M·bits(i))."""
    m = M.shape[0]
    img = np.zeros(m, dtype=np.int64)
    for q in range(m):
        img[q] = sum((1 << (m - 1 - t)) for t in range(m) if M[t, q])
    idx = np.arange(1 << m, dtype=np.int64)
    out = np.zeros_like(idx)
    for q in range(m):
        out ^= (((idx >> (m - 1 - q)) & 1) * img[q])
    return out


def _perm_gather(A: jnp.ndarray, idx: np.ndarray, inv_idx: np.ndarray,
                 axis: int):
    """Permute ``axis`` of a complex array by static indices, with a
    custom VJP that is itself a gather by the inverse permutation (the
    generic take-VJP is a scatter, which this backend handles poorly; a
    bijection's transpose is just the inverse gather). Gathers run on the
    real/imag planes separately (complex64 gathers are unreliable on the
    axon TPU backend)."""
    idx = jnp.asarray(np.asarray(idx, dtype=np.int32))
    inv = jnp.asarray(np.asarray(inv_idx, dtype=np.int32))

    def take_c(x, i):
        return jax.lax.complex(jnp.take(jnp.real(x), i, axis=axis),
                               jnp.take(jnp.imag(x), i, axis=axis))

    @jax.custom_vjp
    def f(x):
        return take_c(x, idx)

    def fwd(x):
        return take_c(x, idx), None

    def bwd(_, g):
        return (take_c(g, inv),)

    f.defvjp(fwd, bwd)
    return f(A)


class _LayerMap:
    """Factory-time plan of one even layer's composed entangler."""

    def __init__(self, edges, n: int, rb: int):
        cb = n - rb
        A = _gf2_compose(edges, n)
        Arr, Arc = A[:rb, :rb], A[:rb, rb:]
        Acr, Acc = A[rb:, :rb], A[rb:, rb:]
        Arr_inv = _gf2_inv(Arr)
        B = (Acr @ Arr_inv) % 2                      # row bit -> col flips
        Sc = (Acc + Acr @ Arr_inv @ Arc) % 2         # Schur complement
        Sc_inv = _gf2_inv(Sc)
        G = (Arc @ Sc_inv) % 2                       # col bit -> row flips
        # Static index maps for folding the permutations into the rotation
        # matrices: (P·Lm)[ρ,:] = Lm[Arr⁻¹ρ,:], (Q·Rm)[γ,:] = Rm[Sc⁻¹γ,:].
        self.rb, self.cb = rb, cb
        self.inv_r = _gf2_index_map(Arr_inv)
        self.fwd_r = _gf2_index_map(Arr)
        self.inv_c = _gf2_index_map(Sc_inv)
        self.fwd_c = _gf2_index_map(Sc)
        # B-flips: per row-bit j (mask), the set of column bits to reverse.
        self.b_flips = [
            (j, [t for t in range(cb) if B[t, j]])
            for j in range(rb) if B[:, j].any()
        ]
        # G-flips: per column-bit j (mask), the set of row bits to reverse
        # (nonempty only when some edge goes high→low across the split).
        self.g_flips = [
            (j, [t for t in range(rb) if G[t, j]])
            for j in range(cb) if G[:, j].any()
        ]


def _masked_sublane_flip(X: jnp.ndarray, mask_1d: jnp.ndarray,
                         flip_bits: List[int], nbits: int) -> jnp.ndarray:
    """X: (2^nbits, M). Reverse the given MSB-first bits of the leading axis
    on rows... masked by ``mask_1d`` over the TRAILING (lane) axis:
    X ← X + m ∘ (flip(X) − X). All reversals are sublane-side."""
    lead, lanes = X.shape
    view = X.reshape((2,) * nbits + (lanes,))
    sl = tuple(slice(None, None, -1) if b in flip_bits else slice(None)
               for b in range(nbits)) + (slice(None),)
    Xf = view[sl].reshape(lead, lanes)
    return X + mask_1d * (Xf - X)


def make_structured_probs_fn_composed(num_wires: int, layers: int,
                                      edges: Sequence[Tuple[int, int]],
                                      dtype=jnp.complex64,
                                      conditioning: bool = False,
                                      rb: int = None):
    """GF(2)-composed evaluation of the DAG-structured ansatz — the
    production TPU path (round 3; supersedes the per-edge flat executor).

    Identical gate semantics to ``make_structured_probs_fn`` (edges applied
    in sequence on even layers, CZ on odd layers — reference gate ordering
    per ``quantum_born_machine.py:57-87``); see the module banner above for
    the factorization. Exactness vs the flat/2D executors is tested in
    tests/test_structured_ansatz.py.
    """
    n = num_wires
    rb = (n + 1) // 2 if rb is None else rb
    cb = n - rb
    if not (0 < rb < n):
        raise ValueError(f"rb must be in (0, {n})")
    R, C = 1 << rb, 1 << cb
    edges = [(int(c), int(t)) for c, t in edges]
    for c, t in edges:
        if not (0 <= c < n and 0 <= t < n) or c == t:
            raise ValueError(f"bad edge ({c}, {t}) for {n} wires")
    has_edges = bool(edges)
    lm = _LayerMap(edges, n, rb) if has_edges else None
    npdt = np.dtype(dtype)
    real_dtype = jnp.dtype(np.zeros(0, dtype=npdt).real.dtype)

    def row_mask(j):
        """(R,) 0/1 of row-bit j (MSB-first), iota-derived on device."""
        b = (jax.lax.iota(jnp.int32, R) >> (rb - 1 - j)) & 1
        return b.astype(real_dtype)

    def col_mask(j):
        b = (jax.lax.iota(jnp.int32, C) >> (cb - 1 - j)) & 1
        return b.astype(real_dtype)

    def cz_signs():
        """CZ signs of one odd layer, split into separable row/col factors
        plus the full (R,C) map for cross edges. Built once per forward."""
        srow = jnp.ones((R,), dtype=real_dtype)
        scol = jnp.ones((C,), dtype=real_dtype)
        cross = None
        for a, b in edges:
            if a > b:
                a, b = b, a
            if b < rb:
                srow = srow * (1.0 - 2.0 * row_mask(a) * row_mask(b))
            elif a >= rb:
                scol = scol * (1.0 - 2.0 * col_mask(a - rb) * col_mask(b - rb))
            else:
                m = row_mask(a)[:, None] * col_mask(b - rb)[None, :]
                cross = m if cross is None else cross + m
        # cross counts set-bit pairs; sign flips on odd parity
        full = srow[:, None] * scol[None, :]
        if cross is not None:
            full = full * (1.0 - 2.0 * (cross % 2))
        return full  # (R, C)

    def fold(U, lo, hi):
        """(L, hi-lo) per-qubit 2x2s -> (L, 2^(hi-lo), 2^(hi-lo)) folds."""
        return kron_fold([U[:, q] for q in range(lo, hi)])

    def run(params, embed_angles=None):
        a = params.reshape(layers, n, 3)
        U = rot_zyx_batched(a[..., 0], a[..., 1], a[..., 2]).astype(dtype)
        Lm = fold(U, 0, rb)           # (L, R, R)
        Rm = fold(U, rb, n)           # (L, C, C)
        if has_edges:
            # Fold the layer permutations into the even layers' rotation
            # matrices: static row-gathers, no extra matmuls. (Even layers
            # selected by strided slice — complex64 gathers with an index
            # array are unreliable on this backend; ::2 is a lax.slice.)
            LmE = _perm_gather(Lm[::2], lm.inv_r, lm.fwd_r, 1)
            RmE = _perm_gather(Rm[::2], lm.inv_c, lm.fwd_c, 1)
            sign = cz_signs()

        # State starts in RC orientation (rows = leading qubits).
        X = jnp.full((R, C), 1.0 / np.sqrt(float(1 << n)), dtype=dtype)
        if conditioning:
            if embed_angles is None:
                raise ValueError("conditioning=True requires embed_angles")
            E = ry_batched(jnp.asarray(embed_angles).reshape(n)).astype(dtype)
            Er = kron_fold([E[q] for q in range(rb)])
            Ec = kron_fold([E[q] for q in range(rb, n)])
            X = Er @ X @ Ec.T

        transposed = False  # False: X is (R, C); True: X is (C, R)
        ei = 0
        for l in range(layers):
            entangle = has_edges and l % 2 == 0
            Ml = LmE[ei] if entangle else Lm[l]
            Mc = RmE[ei] if entangle else Rm[l]
            if entangle:
                ei += 1
            # Rotation (+ folded permutation) matmuls. Output orientation:
            # CR when B-flips follow (their reversed bits must sit on the
            # sublane side), else RC.
            want_cr = entangle and bool(lm.b_flips)
            if not transposed:      # X is (R, C)
                if want_cr:
                    Z1 = jnp.einsum("cb,ab->ca", Mc, X)      # (C, R')
                    X = jnp.einsum("ca,ra->cr", Z1, Ml)
                else:
                    Z1 = jnp.einsum("ra,ab->rb", Ml, X)
                    X = jnp.einsum("rb,cb->rc", Z1, Mc)
            else:                   # X is (C, R)
                if want_cr:
                    Z1 = jnp.einsum("cb,ba->ca", Mc, X)
                    X = jnp.einsum("ca,ra->cr", Z1, Ml)
                else:
                    Z1 = jnp.einsum("ra,ba->rb", Ml, X)
                    X = jnp.einsum("rb,cb->rc", Z1, Mc)
            transposed = want_cr
            if entangle:
                # G-flips (row bits masked by column bits) would act in RC
                # orientation BEFORE the B-flips; with the standard
                # parents-first qubit order G is empty, and the constructor
                # verifies that below.
                for j, bits in lm.b_flips:
                    X = _masked_sublane_flip(X, row_mask(j), bits, cb)
            elif has_edges:
                X = X * (sign.T if transposed else sign)
        p = jnp.real(X * jnp.conj(X))
        if transposed:
            p = p.T
        return p.reshape(-1)

    if has_edges and lm.g_flips:
        # High→low cross edges produce a G block; supporting them needs an
        # extra flip pass in RC orientation between the matmuls and the
        # B-flips. No BN-derived edge list hits this (parents-first order ⇒
        # c < t), so route those to the flat executor instead of carrying an
        # untestable path here.
        raise ValueError(
            "composed executor requires all edges (c, t) with c < t after "
            "the split (no high→low cross-half edges); use "
            "make_structured_probs_fn_flat for this edge list")

    if conditioning:
        return run

    def probs(params: jnp.ndarray) -> jnp.ndarray:
        return run(params)

    return probs


class _BlockLayerPlan:
    """Factory-time plan: A = L_strict · D over the rotation-block partition.

    D (block-diagonal) folds into the per-block rotation matrices as static
    row-gathers; L_strict (strictly block-lower, unit diagonal) becomes a
    sequence of masked multi-bit flips. Flip factors are emitted per control
    BLOCK in descending order — within one block-factor all controls' targets
    live in strictly later blocks, so the factor's flips commute and can be
    grouped row-targets/column-targets to minimize transposes."""

    def __init__(self, edges, n: int, blocks, rb: int):
        self.n, self.rb, self.cb = n, rb, n - rb
        A = _gf2_compose(edges, n)
        blk_of = np.empty(n, dtype=np.int64)
        for i, (s, bs) in enumerate(blocks):
            blk_of[s:s + bs] = i
        # strictly-upper entries must stay inside one block (else D is not
        # block-diagonalizable this way)
        for t in range(n):
            for q in range(t + 1, n):
                if A[t, q] and blk_of[t] != blk_of[q]:
                    raise ValueError(
                        "composed block plan requires cross-block edges to "
                        "go low→high; use make_structured_probs_fn_flat for "
                        "this edge list")
        D = np.eye(n, dtype=np.uint8)
        Dinv = np.eye(n, dtype=np.uint8)
        for s, bs in blocks:
            D[s:s + bs, s:s + bs] = A[s:s + bs, s:s + bs]
            Dinv[s:s + bs, s:s + bs] = _gf2_inv(A[s:s + bs, s:s + bs])
        Ls = (A @ Dinv) % 2
        # per-block gather maps for folding P_ii into the rotation matrices:
        # (P·M)[ρ, :] = M[A_ii⁻¹ ρ, :]
        self.gathers = []
        for s, bs in blocks:
            Aii = A[s:s + bs, s:s + bs]
            if (Aii == np.eye(bs, dtype=np.uint8)).all():
                self.gathers.append(None)
            else:
                self.gathers.append((_gf2_index_map(_gf2_inv(Aii)),
                                     _gf2_index_map(Aii)))
        # flip program: per control block descending, (q, row_bits, col_bits)
        self.flip_program = []
        for j in range(len(blocks) - 1, -1, -1):
            s, bs = blocks[j]
            items = []
            for q in range(s, s + bs):
                targets = [t for t in range(n)
                           if Ls[t, q] and t != q]
                if not targets:
                    continue
                assert all(blk_of[t] > j for t in targets)
                rows = [t for t in targets if t < rb]
                cols = [t - rb for t in targets if t >= rb]
                items.append((q, rows, cols))
            # group: column-target flips first, then row-target flips (they
            # commute within the factor) so orientation changes batch up
            self.flip_program += [(q, [], cols) for q, _, cols in items if cols]
            self.flip_program += [(q, rows, []) for q, rows, _ in items if rows]
        self.has_flips = bool(self.flip_program)


def make_structured_probs_fn_blockcomposed(num_wires: int, layers: int,
                                           edges: Sequence[Tuple[int, int]],
                                           block: int = 8, dtype=jnp.complex64,
                                           conditioning: bool = False,
                                           rb: int = None,
                                           reupload: bool = False,
                                           remat_layers: bool = False):
    """Blocked + GF(2)-composed structured-ansatz executor (round-3
    production path): rotations ride the flat executor's per-block matmuls
    unchanged, and the whole even-layer CNOT sequence collapses to (a) free
    static row-gathers on the even layers' rotation matrices (the
    block-diagonal part of the composed map) plus (b) a handful of masked
    sublane bit-reversal flips on the (R, C) super-block view (the strictly
    cross-block part), instead of one full-state masked σx contraction per
    edge. See ``_BlockLayerPlan``; gate semantics identical to
    ``make_structured_probs_fn`` (tests/test_structured_ansatz.py).
    """
    from .blocked import _blocks, _cz_diag_device

    n = num_wires
    size = 1 << n
    rb = (n + 1) // 2 if rb is None else rb
    cb = n - rb
    R, C = 1 << rb, 1 << cb
    edges = [(int(c), int(t)) for c, t in edges]
    for c, t in edges:
        if not (0 <= c < n and 0 <= t < n) or c == t:
            raise ValueError(f"bad edge ({c}, {t}) for {n} wires")
    has_edges = bool(edges)
    blocks = _blocks(n, block)
    plan = _BlockLayerPlan(edges, n, blocks, rb) if has_edges else None
    npdt = np.dtype(dtype)
    real_dtype = jnp.dtype(np.zeros(0, dtype=npdt).real.dtype)

    def mask_rc(q):
        """control-bit mask in RC orientation: (R, 1) or (1, C)."""
        if q < rb:
            b = (jax.lax.iota(jnp.int32, R) >> (rb - 1 - q)) & 1
            return b.astype(real_dtype)[:, None]
        b = (jax.lax.iota(jnp.int32, C) >> (cb - 1 - (q - rb))) & 1
        return b.astype(real_dtype)[None, :]

    def block_matrices(params):
        angles = params.reshape(layers, n, 3)
        U = rot_zyx_batched(angles[..., 0], angles[..., 1],
                            angles[..., 2]).astype(dtype)
        out = []
        for s, bs in blocks:
            out.append(kron_fold([U[:, q] for q in range(s, s + bs)]))
        return out

    # Fold the re-uploaded wall into the rotation operators only when the
    # state pass dominates the matrix-matrix fold (n >= 2b) — see the flat
    # executor's cost model note. The even-layer permutation gathers compose
    # AFTER the rotations, so gathering rows of M_l·E still equals
    # P∘(⊗ M_l·E).
    bs_max = max(bs for _, bs in blocks)
    fold_embed = reupload and n >= 2 * bs_max

    def run(params, embed_angles=None):
        state = jnp.full((size,), 1.0 / np.sqrt(float(size)), dtype=dtype)
        mats = block_matrices(params)
        emb, per_layer = None, False
        if conditioning:
            if embed_angles is None:
                raise ValueError("conditioning=True requires embed_angles")
            ea = jnp.asarray(embed_angles)
            per_layer = ea.ndim == 2
            if per_layer:
                # Per-layer wall angles (layers, n) — see the flat executor.
                if not reupload:
                    raise ValueError(
                        "per-layer embed_angles require reupload=True")
                E = ry_batched(ea.reshape(layers, n)).astype(dtype)
                emb = [kron_fold([E[:, q] for q in range(s, s + bs)])
                       for s, bs in blocks]  # (layers, 2^bs, 2^bs) each
                if fold_embed:
                    for i in range(len(blocks)):
                        mats[i] = jnp.einsum("lij,ljk->lik", mats[i], emb[i])
            else:
                E = ry_batched(ea.reshape(n)).astype(dtype)
                emb = []
                for i, (s, bs) in enumerate(blocks):
                    M = kron_fold([E[q] for q in range(s, s + bs)])
                    emb.append(M)
                    if fold_embed:
                        mats[i] = jnp.einsum("lij,jk->lik", mats[i], M)
                if not reupload:
                    for (s, bs), M in zip(blocks, emb):
                        state = apply_adjacent_block(state, M, s, bs, n)
        if has_edges:
            # even layers' rotation matrices with the block-diagonal layer
            # permutation folded in (static row gathers, no extra matmuls)
            matsE = []
            for i in range(len(blocks)):
                if plan.gathers[i] is None:
                    matsE.append(mats[i][::2])
                else:
                    idx, inv = plan.gathers[i]
                    matsE.append(_perm_gather(mats[i][::2], idx, inv, 1))

        def layer_body(entangle, state, Ms, emb_t):
            if emb_t:
                for (s, bs), M in zip(blocks, emb_t):
                    state = apply_adjacent_block(state, M, s, bs, n)
            for (s, bs), M in zip(blocks, Ms):
                state = apply_adjacent_block(state, M, s, bs, n)
            if entangle:
                if plan.has_flips:
                    # flips run with their reversed bits on the SUBLANE axis:
                    # column-bit targets in the transposed (C, R) orientation,
                    # row-bit targets in (R, C).
                    X = state.reshape(R, C)
                    transposed = False
                    for q, rows, cols in plan.flip_program:
                        m = mask_rc(q)  # (R, 1) or (1, C) in RC orientation
                        if cols:
                            if not transposed:
                                X, transposed = X.T, True
                            X = _masked_sublane_flip_nd(X, m.T, cols, cb)
                        else:
                            if transposed:
                                X, transposed = X.T, False
                            X = _masked_sublane_flip_nd(X, m, rows, rb)
                    if transposed:
                        X = X.T
                    state = X.reshape(-1)
            elif has_edges:
                # Rebuilt per layer from iotas: XLA CSEs the copies within
                # one program, and under jax.checkpoint the diagonal is
                # recomputed in the backward instead of living as a residual.
                state = state * _cz_diag_device(n, edges)
            return state

        ei = 0
        for l in range(layers):
            entangle = has_edges and l % 2 == 0
            Ms = [matsE[i][ei] if entangle else mats[i][l]
                  for i in range(len(blocks))]
            emb_t = ()
            if reupload and not fold_embed:
                emb_t = (tuple(M[l] for M in emb) if per_layer
                         else tuple(emb))
            if remat_layers:
                # Reverse-mode AD stores only layer-boundary states — the
                # live set that crashes single-chip distill/backwards from
                # n = 24 without remat (scripts/probe_distill24.py).
                state = jax.checkpoint(partial(layer_body, entangle))(
                    state, Ms, emb_t)
            else:
                state = layer_body(entangle, state, Ms, emb_t)
            if entangle:
                ei += 1
        return jnp.real(state * jnp.conj(state))

    if conditioning:
        return run

    def probs(params: jnp.ndarray) -> jnp.ndarray:
        return run(params)

    return probs


def _masked_sublane_flip_nd(X: jnp.ndarray, mask, flip_bits: List[int],
                            nbits: int) -> jnp.ndarray:
    """X: (2^nbits, M). Reverse the given MSB-first bits of the LEADING axis,
    blended under ``mask`` (broadcastable to X): X + m ∘ (flip(X) − X)."""
    lead, lanes = X.shape
    view = X.reshape((2,) * nbits + (lanes,))
    sl = tuple(slice(None, None, -1) if b in flip_bits else slice(None)
               for b in range(nbits)) + (slice(None),)
    Xf = view[sl].reshape(lead, lanes)
    return X + mask * (Xf - X)


def latent_edges(bn, latent_names: Sequence[str]) -> List[Tuple[int, int]]:
    """(parent_qubit, child_qubit) pairs for every BN edge whose endpoints
    are both latent, with qubit index = position in ``latent_names``."""
    pos = {v: i for i, v in enumerate(latent_names)}
    edges = []
    for v in latent_names:
        for p in bn.parents[v]:
            if p in pos:
                edges.append((pos[p], pos[v]))
    return edges


def make_structured_probs_fn(num_wires: int, layers: int,
                             edges: Sequence[Tuple[int, int]],
                             dtype=jnp.complex64,
                             conditioning: bool = False):
    """probs(params[, embed_angles]) for the DAG-structured ansatz; params
    shape (3·L·n,). With ``conditioning=True`` the returned function takes a
    second argument of per-qubit embedding angles (RY(x_q) wall after the
    Hadamard wall — the angle-embedding scheme the reference declares but
    never implements, ``quantum_born_machine.py:132-137``)."""
    n = num_wires
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb
    edges = [(int(c), int(t)) for c, t in edges]
    for c, t in edges:
        if not (0 <= c < n and 0 <= t < n) or c == t:
            raise ValueError(f"bad edge ({c}, {t}) for {n} wires")
    has_edges = bool(edges)
    # numpy-side dtype probe: an EAGER jnp op here (jnp.real of a device
    # scalar) hits the axon backend outside any jit and fails with
    # UNIMPLEMENTED — factory functions must never touch the device.
    real_dtype = jnp.dtype(np.zeros(0, dtype=np.dtype(dtype)).real.dtype)

    def bit_mask(q):
        """0/1 indicator of qubit q's basis bit, iota-derived on device,
        shaped (R, 1) for row bits / (1, C) for column bits."""
        if q < rb:
            b = (jax.lax.iota(jnp.int32, R) >> (rb - 1 - q)) & 1
            return b.astype(real_dtype)[:, None]
        b = (jax.lax.iota(jnp.int32, C) >> (cb - 1 - (q - rb))) & 1
        return b.astype(real_dtype)[None, :]

    def flip_bit(X, q):
        """Reverse qubit q's basis bit: reshape + axis-flip (no gather)."""
        if q < rb:
            pre = 1 << q
            return X.reshape(pre, 2, R // (2 * pre), C)[:, ::-1].reshape(R, C)
        qq = q - rb
        pre = 1 << qq
        return X.reshape(R, pre, 2, C // (2 * pre))[:, :, ::-1].reshape(R, C)

    def apply_cnot(X, c, t):
        return X + bit_mask(c) * (flip_bit(X, t) - X)

    def odd_layer_sign():
        """All the odd layer's CZ(c, t) signs multiplied into one mask
        (CZs are diagonal, hence commuting)."""
        s = jnp.ones((1, 1), dtype=real_dtype)
        for c, t in edges:
            s = s * (1.0 - 2.0 * bit_mask(c) * bit_mask(t))
        return s

    def fold_rotations(U):
        """(L, n, 2, 2) per-qubit rotations -> ((L, R, R), (L, C, C))
        layer-batched Kronecker folds for the left/right matmuls."""
        M = kron_fold([U[:, q] for q in range(rb)])
        if cb == 0:
            return M, jnp.ones((layers, 1, 1), dtype=dtype)
        return M, kron_fold([U[:, q] for q in range(rb, n)])

    def embed_wall(X, embed_angles):
        """RY(x_q) wall folded into one left + one right matmul."""
        E = ry_batched(jnp.asarray(embed_angles).reshape(n)).astype(dtype)
        M = E[0]
        for q in range(1, rb):
            M = jnp.kron(M, E[q])
        X = M @ X
        if cb:
            N = E[rb]
            for q in range(rb + 1, n):
                N = jnp.kron(N, E[q])
            X = X @ N.T
        return X

    def run(params: jnp.ndarray, embed_angles=None) -> jnp.ndarray:
        a = params.reshape(layers, n, 3)
        U = rot_zyx_batched(a[..., 0], a[..., 1], a[..., 2]).astype(dtype)
        Lm, Rm = fold_rotations(U)

        X = jnp.full((R, C), 1.0 / np.sqrt(float(1 << n)), dtype=dtype)
        if conditioning:
            if embed_angles is None:
                raise ValueError("conditioning=True requires embed_angles")
            X = embed_wall(X, embed_angles)
        sign = odd_layer_sign() if has_edges else None
        for l in range(layers):
            X = Lm[l] @ X @ Rm[l].T
            if not has_edges:
                continue
            if l % 2 == 0:
                for c, t in edges:
                    X = apply_cnot(X, c, t)
            else:
                X = X * sign
        flat = X.reshape(-1)
        return jnp.real(flat * jnp.conj(flat))

    if conditioning:
        return run

    def probs(params: jnp.ndarray) -> jnp.ndarray:
        return run(params)

    return probs
