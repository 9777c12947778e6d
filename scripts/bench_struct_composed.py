"""Composed vs flat structured-executor forward/grad benchmark on TPU.

Usage: python scripts/bench_struct_composed.py [n] [L]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tensornetworks_tpu.core import get_random_chain_network
from tensornetworks_tpu.sim.structured import (
    latent_edges, make_structured_probs_fn_flat,
    make_structured_probs_fn_composed, make_structured_probs_fn_blockcomposed)
from tensornetworks_tpu.engines.common import force_fetch, highest_matmul_precision


def _fetch(out):
    force_fetch(out[0] if isinstance(out, tuple) else out)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    bn = get_random_chain_network(n + 1, seed=0)
    edges = latent_edges(bn, [f"V{i}" for i in range(n)])
    print(f"n={n} L={L} edges={len(edges)}")
    p = jnp.asarray(0.1 * np.random.default_rng(0).normal(size=3 * L * n),
                    dtype=jnp.float32)

    with highest_matmul_precision():
        for name, factory in [
            ("flat", make_structured_probs_fn_flat),
            ("composed", make_structured_probs_fn_composed),
            ("blockcomp", make_structured_probs_fn_blockcomposed),
        ]:
            f = factory(n, L, edges)
            fwd = jax.jit(f)
            t_fwd = timeit(fwd, p)
            loss = jax.jit(jax.value_and_grad(lambda pp: (f(pp) ** 2).sum()))
            t_fg = timeit(loss, p)
            # cross-check outputs agree
            q = np.asarray(fwd(p))
            print(f"{name:9s} fwd {t_fwd*1e3:7.2f} ms   fwd+grad {t_fg*1e3:7.2f} ms"
                  f"   sum(q)={q.sum():.6f}")


if __name__ == "__main__":
    main()
