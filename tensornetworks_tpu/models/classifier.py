"""MLP discriminator for adversarial VI, in Flax.

Parity target: ``classifier_pytorch.py`` (reference) — hidden dims default
``[max(2d, 32), max(d, 16)]`` (``:27``), ReLU, optional BatchNorm1d after each
linear (``:33-34``), single-logit head (``:39``). Sigmoid applied by callers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class BinaryClassifierMLP(nn.Module):
    input_dim: int
    hidden_dims: Optional[Sequence[int]] = None
    use_batch_norm: bool = False

    def _hidden(self):
        if self.hidden_dims is not None:
            return tuple(self.hidden_dims)
        return (max(self.input_dim * 2, 32), max(self.input_dim, 16))

    @nn.compact
    def __call__(self, x, train: bool = False):
        for h in self._hidden():
            x = nn.Dense(h)(x)
            if self.use_batch_norm:
                x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
        return nn.Dense(1)(x)

    def init_variables(self, key: jax.Array):
        x0 = jnp.zeros((1, self.input_dim), dtype=jnp.float32)
        return self.init({"params": key}, x0, train=False)

    def logits(self, variables, x, train: bool = False, mutable=False):
        return self.apply(variables, x, train=train, mutable=mutable)

    def get_probs(self, variables, x):
        """P(class 1 | x). Parity: ``classifier_pytorch.py:54-57``."""
        return jax.nn.sigmoid(self.apply(variables, x, train=False))
