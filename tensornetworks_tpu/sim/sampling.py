"""On-device categorical sampling over the 2^n outcome space.

Replaces the reference's host-side ``torch.multinomial`` + Python index→tuple
loops (``born_machine_classical_sim.py:101-124``,
``quantum_born_machine.py:153-178``) with ``jax.random.categorical`` and a
vectorized bit-unpack — no host sync inside training steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.bits import jnp_index_to_bits


# Above this outcome-space size, Gumbel-max categorical sampling would
# materialize (num_samples, 2^n) noise; inverse-CDF + binary search draws the
# same distribution with O(num_samples·n) work instead.
CDF_SAMPLING_MIN_SIZE = 4096


def sample_indices(key: jax.Array, probs: jnp.ndarray, num_samples: int,
                   eps: float = 1e-10) -> jnp.ndarray:
    """Draw outcome indices ~ probs (with the reference's +1e-10 smoothing,
    ``born_machine_classical_sim.py:105``)."""
    p = probs + eps
    p = p / p.sum(axis=-1, keepdims=True)
    if probs.shape[-1] >= CDF_SAMPLING_MIN_SIZE and probs.ndim == 1:
        cdf = jnp.cumsum(p)
        u = jax.random.uniform(key, (num_samples,), dtype=cdf.dtype)
        return jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, probs.shape[-1] - 1)
    logits = jnp.log(p)
    return jax.random.categorical(key, logits, shape=(num_samples,) + probs.shape[:-1])


def sample_bits(key: jax.Array, probs: jnp.ndarray, num_samples: int, num_vars: int,
                dtype=jnp.float32) -> jnp.ndarray:
    """(num_samples, n) float bit rows sampled from a (2^n,) distribution."""
    idx = sample_indices(key, probs, num_samples)
    return jnp_index_to_bits(idx, num_vars, dtype=dtype)


def sample_indices_2d(key: jax.Array, P: jnp.ndarray, num_samples: int,
                      eps: float = 1e-10):
    """Exact two-stage categorical sampling of flat indices from an (R, C)
    probability matrix — measurement-shot sampling for very large n.

    Stage 1 draws the row (high bits) from the R-length row-marginal CDF;
    stage 2 draws the column (low bits) from the C-length CDFs of only the
    ``num_samples`` gathered rows. The sampled joint is exactly
    ``(P+eps)[r,c] / Σ(P+eps)`` — identical to :func:`sample_indices` on
    ``P.reshape(-1)`` with the same smoothing — but no 2^n-length CDF or
    searchsorted ever exists: auxiliary memory is O(2^{n/2} + M·2^{n/2})
    instead of O(2^n), which is what lets the sampled-KSD engine draw shots
    at n = 28 where the flat cumsum alone is a gigabyte. All gathers are on
    real f32 planes (complex gathers are unreliable on this backend).

    Returns ``(flat_idx, r, c)`` with ``flat_idx = r*C + c``.
    """
    R, C = P.shape
    Ps = P + eps
    m = Ps.sum(axis=1)                                   # (R,) row marginals
    key_r, key_c = jax.random.split(key)
    cdf_r = jnp.cumsum(m)
    cdf_r = cdf_r / cdf_r[-1]
    u_r = jax.random.uniform(key_r, (num_samples,), dtype=cdf_r.dtype)
    r = jnp.clip(jnp.searchsorted(cdf_r, u_r, side="right"), 0, R - 1)
    rows = jnp.take(Ps, r, axis=0)                       # (M, C) f32 gather
    cdf_c = jnp.cumsum(rows, axis=1)
    cdf_c = cdf_c / cdf_c[:, -1:]
    u_c = jax.random.uniform(key_c, (num_samples,), dtype=cdf_c.dtype)
    c = jnp.clip(
        jax.vmap(lambda cd, u: jnp.searchsorted(cd, u, side="right"))(cdf_c, u_c),
        0, C - 1)
    return r * C + c, r, c


def gather_2d(P: jnp.ndarray, r: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """P[r_i, c_i] via a row gather + per-row column pick (differentiable;
    the backward scatters into (M, C) then (R, C) rather than doing one flat
    2^n scatter)."""
    rows = jnp.take(P, r, axis=0)
    return jnp.take_along_axis(rows, c[:, None], axis=1)[:, 0]


def parameter_shift_jacobian(probs_fn, params: jnp.ndarray) -> jnp.ndarray:
    """Parameter-shift rule Jacobian dp/dθ for circuits of RX/RY/RZ rotations:
    dp/dθ_i = (p(θ + π/2 e_i) - p(θ - π/2 e_i)) / 2.

    This is the differentiation method the reference *pays for at runtime*
    (``diff_method="parameter-shift"``, ``quantum_born_machine.py:58``); here
    it exists only as a validation oracle for ``jax.grad`` (tests assert the
    two agree analytically).
    """
    num_params = params.shape[0]

    def shift(i, sign):
        return probs_fn(params.at[i].add(sign * jnp.pi / 2))

    cols = [(shift(i, 1.0) - shift(i, -1.0)) / 2.0 for i in range(num_params)]
    return jnp.stack(cols, axis=-1)  # (2^n, num_params)
