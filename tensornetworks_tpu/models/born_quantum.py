"""Quantum Born machine backed by the in-framework statevector simulator.

Replaces the reference's PennyLane QNode wrapper (``quantum_born_machine.py``)
with a pure-JAX model: ``probs(params)`` traces the whole circuit into the
surrounding XLA program and gradients flow through ``jax.grad`` — no
parameter-shift re-execution (2·3·L·n circuit sims per step in the reference,
``quantum_born_machine.py:58``).

Ansatz families, parameter counts and init methods match the reference
(``:30-47``): ``hardware_efficient``/``all_to_all`` use ``3·L·n`` params,
``basic`` ``2·L·n``; init ``zero | small_random (0.1·N(0,1)) |
random (U[0, 2π))``.

Conditioning: the reference *declares* ``conditioning_dim`` but never
implements it (``:132-137`` only prints a warning). Here it is implemented
via angle embedding — an RY(π·x) wall after the Hadamard wall, the
observation vector cycled across qubits — enabling amortized quantum
inference (pass ``x_condition`` to ``probs``/``sample``/``log_q``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.bits import (all_bitstrings, generate_all_binary_outcomes,
                         jnp_bits_to_index)
from ..sim.ansatz import ansatz_probs, ansatz_state_fn, num_ansatz_params
from ..sim.sampling import sample_bits

LOG_PROB_EPS = 1e-9  # reference clamp, quantum_born_machine.py:188


class QuantumBornMachine:
    def __init__(self, num_latent_vars: int, ansatz_layers: int = 1,
                 conditioning_dim: int = 0, ansatz_type: str = "hardware_efficient",
                 init_method: str = "small_random", dtype=jnp.complex64,
                 backend: str = "auto", block: int = 8, edges=None,
                 remat_layers: bool = False, grad_method: str = "autodiff",
                 cond_reupload: bool = False,
                 cond_learned_embedding: bool = False,
                 cond_embed_per_layer: bool = False):
        """``backend``: 'blocked' (TPU-layout-friendly block-matmul executor,
        the default for n >= 6), 'einsum' (per-gate contraction path), or
        'auto'. Both produce identical distributions (tests/test_blocked.py).

        ``ansatz_type="bn_structured"`` (beyond-reference): DAG-aware
        entangling map — pass ``edges`` = (parent_qubit, child_qubit) pairs,
        e.g. ``sim.structured.latent_edges(bn, latent_names)``. 3·L·n params;
        at 16 qubits reaches cold-start KSD TVD 0.16 where hardware_efficient
        stalls at 0.8 (RESULTS.md)."""
        self.num_latent_vars = num_latent_vars
        self.ansatz_layers = ansatz_layers
        self.conditioning_dim = conditioning_dim
        self.ansatz_type = ansatz_type
        self.init_method = init_method
        self.dtype = dtype
        self.grad_method = grad_method
        self.cond_reupload = cond_reupload
        if cond_reupload and (conditioning_dim <= 0 or ansatz_type != "bn_structured"):
            raise ValueError("cond_reupload requires a conditioned bn_structured "
                             "Born machine (the structured executors implement it)")
        # Learned conditioning embedding (round 4, amortized-capacity lever):
        # instead of the fixed wall angles π·x_q, the wall angle of each
        # qubit is a LEARNED linear map of the full binary interaction basis
        # of x — φ(x) = (Π_{j∈S} x_j)_{S ⊆ {1..d}}, 2^d features — so for
        # binary evidence the wall is freely observation-indexed while
        # remaining a smooth parametric map. Adds n·2^d trainable params
        # (appended to the circuit parameter vector); initialized to
        # REPRODUCE the fixed embedding exactly (W[q, {q mod d}] = π), so
        # the model starts identical to the unlearned one and can only gain.
        # Motivation: the 16q amortized conditioned direct-fit bound (0.0703)
        # showed the FIXED wall is the expressivity binding constraint
        # (RESULTS.md round 4).
        self.cond_learned_embedding = cond_learned_embedding
        if cond_learned_embedding:
            if conditioning_dim <= 0:
                raise ValueError("cond_learned_embedding requires a "
                                 "conditioned Born machine")
            if conditioning_dim > 10:
                raise ValueError("cond_learned_embedding builds 2^d "
                                 f"interaction features; d={conditioning_dim} "
                                 "is too large")
        # Per-layer embedding scales (round 5, the next amortized-capacity
        # lever): each re-uploaded wall l gets its own learned per-qubit
        # scale on the shared embedding map — angles_{l,q} =
        # s_{l,q} · (W φ(x))_q. Adds L·n params initialized to 1 (the model
        # starts identical to the shared-wall one). Lets the circuit vary
        # how strongly each layer re-reads the evidence — the fixed shared
        # wall forces every layer to inject the same rotation.
        self.cond_embed_per_layer = cond_embed_per_layer
        if cond_embed_per_layer and not (cond_learned_embedding
                                         and cond_reupload):
            raise ValueError("cond_embed_per_layer requires "
                             "cond_learned_embedding and cond_reupload")
        self._num_embed_params = (
            num_latent_vars * (1 << conditioning_dim)
            if cond_learned_embedding else 0)
        self._num_scale_params = (ansatz_layers * num_latent_vars
                                  if cond_embed_per_layer else 0)
        self._num_embed_params += self._num_scale_params
        if grad_method not in ("autodiff", "adjoint"):
            raise ValueError(f"grad_method must be autodiff|adjoint, got {grad_method!r}")
        if grad_method == "adjoint" and ansatz_type == "bn_structured":
            raise ValueError("grad_method='adjoint' covers the blocked reference "
                             "ansätze only (hardware_efficient/basic/all_to_all)")
        self.edges = list(edges) if edges is not None else None
        self._all_outcome_tuples = None  # lazy: 2^n Python tuples is seconds
        # of host time and GBs at n >= 20; only get_prob_dict needs them.
        if ansatz_type == "bn_structured":
            if self.edges is None:
                raise ValueError(
                    "ansatz_type='bn_structured' requires edges= "
                    "(see sim.structured.latent_edges)")
            self.num_params = 3 * ansatz_layers * num_latent_vars
            if backend == "structured2d":
                # 2D flip-select executor: exact, CPU/test path (its per-edge
                # flips relayout-crawl on the TPU — see structured.py).
                from ..sim.structured import make_structured_probs_fn

                if cond_reupload:
                    raise ValueError("cond_reupload is implemented by the "
                                     "flat/blockcomposed structured executors")
                self._blocked_probs = make_structured_probs_fn(
                    num_latent_vars, ansatz_layers, self.edges, dtype=dtype,
                    conditioning=conditioning_dim > 0)
                self.backend = "structured2d"
            elif backend == "structured_flat":
                from ..sim.structured import make_structured_probs_fn_flat

                self._blocked_probs = make_structured_probs_fn_flat(
                    num_latent_vars, ansatz_layers, self.edges, block=block,
                    dtype=dtype, conditioning=conditioning_dim > 0,
                    reupload=cond_reupload, remat_layers=remat_layers)
                self.backend = "structured_flat"
            else:
                # Production path (round 3): GF(2)-block-composed executor —
                # 4x faster fwd+grad than the per-edge flat executor at 20q
                # (RESULTS.md). Falls back to the flat executor for edge
                # lists with high→low cross-block edges (no BN-derived list
                # has them: parents-first order ⇒ parent qubit < child).
                from ..sim.structured import (
                    make_structured_probs_fn_blockcomposed,
                    make_structured_probs_fn_flat)

                try:
                    self._blocked_probs = make_structured_probs_fn_blockcomposed(
                        num_latent_vars, ansatz_layers, self.edges,
                        block=block, dtype=dtype,
                        conditioning=conditioning_dim > 0,
                        reupload=cond_reupload, remat_layers=remat_layers)
                    self.backend = "structured"
                except ValueError:
                    self._blocked_probs = make_structured_probs_fn_flat(
                        num_latent_vars, ansatz_layers, self.edges,
                        block=block, dtype=dtype,
                        conditioning=conditioning_dim > 0,
                        reupload=cond_reupload, remat_layers=remat_layers)
                    self.backend = "structured_flat"
            self._blocked_state = None
            self.num_circuit_params = self.num_params
            self.num_params += self._num_embed_params
            return
        self.num_params = num_ansatz_params(num_latent_vars, ansatz_layers, ansatz_type)
        ansatz_state_fn(ansatz_type)  # validate early
        if backend == "auto":
            backend = "blocked" if (num_latent_vars >= 6 or conditioning_dim > 0) else "einsum"
        if conditioning_dim > 0 and backend not in ("blocked",):
            raise ValueError("conditioned quantum Born machines require the 'blocked' backend")
        if grad_method == "adjoint" and backend != "blocked":
            raise ValueError("grad_method='adjoint' requires the 'blocked' backend "
                             f"(got {backend!r})")
        self.backend = backend
        if backend in ("blocked", "pallas2d", "pallas2d_grid"):
            from ..sim.blocked import make_blocked_probs_fn, make_blocked_state_fn

            cond = conditioning_dim > 0
            if grad_method == "adjoint":
                if cond:
                    raise ValueError(
                        "grad_method='adjoint' does not support conditioning")
                # O(1)-state-memory backward: the checkpointed autodiff
                # backward OOMs one chip at n >= 26 (sim/blocked_adjoint.py).
                from ..sim.blocked_adjoint import make_blocked_adjoint_probs_fn

                self._blocked_probs = make_blocked_adjoint_probs_fn(
                    num_latent_vars, ansatz_layers, ansatz_type, block=block,
                    dtype=dtype)
            else:
                self._blocked_probs = make_blocked_probs_fn(
                    num_latent_vars, ansatz_layers, ansatz_type, block=block,
                    dtype=dtype, conditioning=cond, remat_layers=remat_layers,
                )
            self._blocked_state = make_blocked_state_fn(
                num_latent_vars, ansatz_layers, ansatz_type, block=block, dtype=dtype,
                conditioning=cond, remat_layers=remat_layers,
            )
            if backend == "pallas2d":
                # Whole-circuit fused Pallas kernels (forward + adjoint VJP):
                # ~40% faster training epochs at n=16 on TPU. Opt-in — native
                # TPU only (interpret mode would crawl on CPU).
                from ..ops.pallas.circuit2d import make_pallas_circuit2d_probs

                self._blocked_probs = make_pallas_circuit2d_probs(
                    num_latent_vars, ansatz_layers, ansatz_type)
            elif backend == "pallas2d_grid":
                # Grid-over-layers variant: O(one layer) VMEM/program size —
                # the n >= 18 fused path where the whole-circuit kernel is
                # compile-bound (circuit2d_grid docstring).
                from ..ops.pallas.circuit2d_grid import (
                    make_pallas_circuit2d_grid_probs)

                self._blocked_probs = make_pallas_circuit2d_grid_probs(
                    num_latent_vars, ansatz_layers, ansatz_type)
        else:
            self._blocked_probs = None
            self._blocked_state = None
        self.num_circuit_params = self.num_params
        self.num_params += self._num_embed_params

    def init(self, key: jax.Array) -> jnp.ndarray:
        """θ init. Parity: ``quantum_born_machine.py:40-47``."""
        m = self.init_method
        nc = self.num_circuit_params
        if m == "zero":
            circ = jnp.zeros(nc, dtype=jnp.float32)
        elif m == "small_random":
            circ = 0.1 * jax.random.normal(key, (nc,), dtype=jnp.float32)
        else:
            circ = jax.random.uniform(key, (nc,), dtype=jnp.float32,
                                      maxval=2.0 * np.pi)
        if not self._num_embed_params:
            return circ
        # Embedding matrix initialized to reproduce the FIXED wall exactly:
        # angle_q = π·x_{q mod d} ⇔ W[q, singleton {q mod d}] = π.
        n, d = self.num_latent_vars, self.conditioning_dim
        W = np.zeros((n, 1 << d), dtype=np.float32)
        for q in range(n):
            W[q, 1 << (q % d)] = np.pi
        parts = [circ, jnp.asarray(W.reshape(-1))]
        if self._num_scale_params:
            # Per-layer scales start at 1: identical to the shared wall.
            parts.append(jnp.ones(self._num_scale_params, dtype=jnp.float32))
        return jnp.concatenate(parts)

    def _interaction_features(self, x: jnp.ndarray) -> jnp.ndarray:
        """φ(x): all 2^d subset products Π_{j∈S} x_j (φ_∅ = 1)."""
        d = self.conditioning_dim
        masks = np.asarray(all_bitstrings(d), dtype=np.float32)  # (2^d, d)
        # rows of all_bitstrings are MSB-first; index subsets LSB-first so
        # mask m selects bit j when (m >> j) & 1 — flip the column order.
        masks = masks[:, ::-1].copy()
        sel = jnp.where(jnp.asarray(masks) > 0, x[None, :], 1.0)
        return jnp.prod(sel, axis=1)

    def _embed_angles(self, x_condition, params=None) -> jnp.ndarray:
        """Wall angles: fixed π-scaled cycling of x, or (with
        ``cond_learned_embedding``) a learned map of the full binary
        interaction basis of x."""
        n = self.num_latent_vars
        x = jnp.asarray(x_condition, dtype=jnp.float32).reshape(-1)
        if self._num_embed_params:
            nw = n * (1 << self.conditioning_dim)
            tail = params[self.num_circuit_params:]
            W = tail[:nw].reshape(n, 1 << self.conditioning_dim)
            base = W @ self._interaction_features(x)
            if self._num_scale_params:
                # (layers, n) per-layer wall angles — the structured
                # executors apply wall l before layer l.
                s = tail[nw:].reshape(self.ansatz_layers, n)
                return s * base[None, :]
            return base
        reps = -(-n // x.shape[0])
        return jnp.pi * jnp.tile(x, reps)[:n]

    def _circuit_params(self, params: jnp.ndarray) -> jnp.ndarray:
        return (params[:self.num_circuit_params]
                if self._num_embed_params else params)

    def probs(self, params: jnp.ndarray, x_condition=None) -> jnp.ndarray:
        """Analytic q_θ(z[, |x]) over all 2^n outcomes (|ψ|²)."""
        if self.conditioning_dim > 0:
            if x_condition is None:
                raise ValueError("x_condition must be provided for a conditioned "
                                 "quantum Born machine.")
            return self._blocked_probs(self._circuit_params(params),
                                       self._embed_angles(x_condition, params))
        if self._blocked_probs is not None:
            return self._blocked_probs(params)
        return ansatz_probs(params, self.num_latent_vars, self.ansatz_layers,
                            self.ansatz_type, dtype=self.dtype)

    def state(self, params: jnp.ndarray, x_condition=None) -> jnp.ndarray:
        """Full statevector ψ(θ) as a (2,)*n tensor."""
        if self.ansatz_type == "bn_structured":
            raise NotImplementedError(
                "bn_structured exposes probabilities only (its executor "
                "works on |amplitude|^2 planes); use probs/sample/log_q")
        if self.conditioning_dim > 0:
            if x_condition is None:
                raise ValueError("x_condition must be provided for a conditioned "
                                 "quantum Born machine.")
            return self._blocked_state(
                self._circuit_params(params),
                self._embed_angles(x_condition, params)).reshape(
                    (2,) * self.num_latent_vars)
        if self._blocked_state is not None:
            return self._blocked_state(params).reshape((2,) * self.num_latent_vars)
        return ansatz_state_fn(self.ansatz_type)(params, self.num_latent_vars,
                                                 self.ansatz_layers, dtype=self.dtype)

    def log_probs(self, params, x_condition=None) -> jnp.ndarray:
        return jnp.log(jnp.clip(self.probs(params, x_condition), LOG_PROB_EPS, None))

    def log_q(self, params, z_samples, x_condition=None) -> jnp.ndarray:
        """log q_θ(z) for sample bit rows via gather
        (vs ``quantum_born_machine.py:180-201`` Python index loop)."""
        lp = self.log_probs(params, x_condition)
        return lp[jnp_bits_to_index(z_samples)]

    def sample(self, key, params, num_samples: int, x_condition=None) -> jnp.ndarray:
        p = self.probs(params, x_condition)
        p = p / p.sum()
        return sample_bits(key, p, num_samples, self.num_latent_vars)

    @property
    def all_outcome_tuples(self):
        if self._all_outcome_tuples is None:
            self._all_outcome_tuples = generate_all_binary_outcomes(
                self.num_latent_vars)
        return self._all_outcome_tuples

    def get_prob_dict(self, params, x_condition=None) -> dict:
        p = np.asarray(self.probs(params, x_condition))
        return {t: float(p[i]) for i, t in enumerate(self.all_outcome_tuples)}
