"""Time the structured-ansatz probs forward and fwd+grad in-scan at n qubits.

Usage: python scripts/bench_struct_fwd.py [n] [layers] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    import jax
    import jax.numpy as jnp

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines.common import highest_matmul_precision
    from tensornetworks_tpu.sim.structured import (
        latent_edges, make_structured_probs_fn, make_structured_probs_fn_flat)

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    edges = latent_edges(bn, latent)
    print(f"n={n} L={layers} edges={len(edges)}", flush=True)
    variant = sys.argv[4] if len(sys.argv) > 4 else "flat"
    maker = (make_structured_probs_fn_flat if variant == "flat"
             else make_structured_probs_fn)
    print(f"variant={variant}", flush=True)
    fn = maker(n, layers, edges)
    params = 0.1 * np.random.default_rng(0).normal(size=3 * layers * n)
    params = jnp.asarray(params, dtype=jnp.float32)

    def timed(step, label):
        def run(p):
            def body(c, _):
                return step(c), ()
            out, _ = jax.lax.scan(body, p, None, length=iters)
            return out

        rj = jax.jit(run)
        with highest_matmul_precision():
            t0 = time.perf_counter()
            np.asarray(rj(params)[:4])
            print(f"[{label}] compile+run {time.perf_counter()-t0:.1f}s", flush=True)
            t0 = time.perf_counter()
            np.asarray(rj(params)[:4])
            ms = 1e3 * (time.perf_counter() - t0) / iters
        print(f"[{label}] {ms:8.2f} ms/iter", flush=True)

    timed(lambda p: p + 1e-12 * fn(p)[0].astype(p.dtype), "fwd")
    timed(lambda p: p - 1e-9 * jax.grad(lambda q: fn(q).sum())(p), "fwd+grad")


if __name__ == "__main__":
    main()
