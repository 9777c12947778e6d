"""Classical Born machine: softmax table or conditional MLP over 2^n outcomes.

Functional JAX redesign of ``born_machine_classical_sim.py`` (reference):
parameters are explicit pytrees (``init`` → params, pure ``probs``/``sample``
functions), so a whole train step jits into one XLA program. All reference
parameterizations and init schemes are kept:

- unconditional: a raw ``2^n`` logits table with init ``zero | small_random
  (0.1·N(0,1)) | uniform (log(1/2^n) + 0.01·N(0,1)) | random``
  (``born_machine_classical_sim.py:51-60``), mapped by a max-subtracted
  softmax (``:95-96``) or by ``|·|/Σ`` when ``use_logits=False`` (``:97-99``);
- conditional: MLP ``x → 2^n`` logits, Xavier-uniform weights, zero biases,
  ReLU, Dropout(0.1), optional LayerNorm, default hidden dims
  ``[max(4d, 64), max(2d, 32)]`` (``:24-48``);
- fixed-probs mode freezing an explicit distribution for post-training
  evaluation (``:64-78``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.bits import generate_all_binary_outcomes, jnp_bits_to_index
from ..sim.sampling import sample_bits

PROB_EPS = 1e-10  # reference clamp, born_machine_classical_sim.py:148


class _CondNet(nn.Module):
    """x -> 2^n logits generator (born_machine_classical_sim.py:24-48)."""

    hidden_dims: Sequence[int]
    num_outcomes: int
    use_layer_norm: bool = False
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        for h in self.hidden_dims:
            x = nn.Dense(h, kernel_init=nn.initializers.xavier_uniform(),
                         bias_init=nn.initializers.zeros)(x)
            if self.use_layer_norm:
                x = nn.LayerNorm()(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.num_outcomes, kernel_init=nn.initializers.xavier_uniform(),
                        bias_init=nn.initializers.zeros)(x)


class ClassicalBornMachine:
    def __init__(self, num_latent_vars: int, use_logits: bool = True,
                 conditioning_dim: int = 0, init_method: str = "small_random",
                 hidden_dims: Optional[Sequence[int]] = None,
                 use_layer_norm: bool = False, dropout_rate: float = 0.1,
                 dtype=jnp.float32):
        self.num_latent_vars = num_latent_vars
        self.num_outcomes = 2**num_latent_vars
        self.use_logits = use_logits
        self.conditioning_dim = conditioning_dim
        self.init_method = init_method
        self.dtype = dtype
        self._fixed_probs = None
        if conditioning_dim > 0:
            if hidden_dims is None:
                hidden_dims = [max(conditioning_dim * 4, 64), max(conditioning_dim * 2, 32)]
            self.net = _CondNet(tuple(hidden_dims), self.num_outcomes,
                                use_layer_norm, dropout_rate)
        else:
            self.net = None
        self._all_outcome_tuples = None  # lazy: 2^n Python tuples is seconds
        # of host time and GBs at n >= 20; only get_prob_dict needs them.

    # ---------------------------------------------------------------- params

    def init(self, key: jax.Array):
        """Initial parameter pytree."""
        if self.conditioning_dim > 0:
            x0 = jnp.zeros((1, self.conditioning_dim), dtype=self.dtype)
            return self.net.init({"params": key}, x0, train=False)["params"]
        m = self.init_method
        if m == "zero":
            table = jnp.zeros(self.num_outcomes, dtype=self.dtype)
        elif m == "small_random":
            table = 0.1 * jax.random.normal(key, (self.num_outcomes,), dtype=self.dtype)
        elif m == "uniform":
            base = jnp.log(jnp.full(self.num_outcomes, 1.0 / self.num_outcomes, dtype=self.dtype))
            table = base + 0.01 * jax.random.normal(key, (self.num_outcomes,), dtype=self.dtype)
        else:  # 'random'
            table = jax.random.normal(key, (self.num_outcomes,), dtype=self.dtype)
        return {"table": table}

    # ----------------------------------------------------- fixed-probs mode

    def set_fixed_probs(self, probs):
        """Freeze an explicit distribution (born_machine_classical_sim.py:64-68)."""
        self._fixed_probs = jnp.asarray(probs)

    def clear_fixed_probs(self):
        self._fixed_probs = None

    # ----------------------------------------------------------------- probs

    def probs(self, params, x_condition=None, *, train: bool = False,
              dropout_rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Distribution over all 2^n outcomes; shape (2^n,) for a single
        condition (or none), (B, 2^n) for batched conditions."""
        if self._fixed_probs is not None:
            return self._fixed_probs
        if self.conditioning_dim > 0:
            if x_condition is None:
                raise ValueError("x_condition must be provided for conditional Born machine.")
            squeeze = x_condition.ndim == 1
            xb = x_condition[None, :] if squeeze else x_condition
            rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else {}
            raw = self.net.apply({"params": params}, xb.astype(self.dtype),
                                 train=train, rngs=rngs)
            out = self._normalize(raw)
            return out[0] if squeeze else out
        if x_condition is not None:
            raise ValueError("x_condition provided but conditioning_dim is 0.")
        return self._normalize(params["table"])

    def _normalize(self, raw):
        if self.use_logits:
            return jax.nn.softmax(raw - jax.lax.stop_gradient(raw.max(axis=-1, keepdims=True)),
                                  axis=-1)
        p = jnp.abs(raw)
        return p / p.sum(axis=-1, keepdims=True)

    # ----------------------------------------------------------- derived ops

    def log_probs(self, params, x_condition=None, **kw) -> jnp.ndarray:
        return jnp.log(jnp.clip(self.probs(params, x_condition, **kw), PROB_EPS, None))

    def log_q(self, params, z_samples, x_condition=None, **kw) -> jnp.ndarray:
        """log q(z|x) per sample row — a gather instead of the reference's
        O(2^n)-per-sample ``list.index`` walk
        (``born_machine_classical_sim.py:140-175``)."""
        lp = self.log_probs(params, x_condition, **kw)
        idx = jnp_bits_to_index(z_samples)
        if lp.ndim == 1:
            return lp[idx]
        return jnp.take_along_axis(lp, idx[:, None], axis=-1)[:, 0]

    def entropy(self, params, x_condition=None, **kw) -> jnp.ndarray:
        p = self.probs(params, x_condition, **kw)
        return -(p * jnp.log(jnp.clip(p, PROB_EPS, None))).sum(axis=-1)

    def sample(self, key, params, num_samples: int, x_condition=None, **kw) -> jnp.ndarray:
        """(num_samples, n) float bit rows (born_machine_classical_sim.py:101-124)."""
        p = self.probs(params, x_condition, **kw)
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
