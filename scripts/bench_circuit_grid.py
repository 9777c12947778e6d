"""A/B the grid-over-layers Pallas circuit kernel vs the blocked XLA
executor at large n: forward and KSD fwd+bwd, in-scan, HIGHEST precision.

Usage: python scripts/bench_circuit_grid.py [n] [layers] [iters] [backends...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    backends = sys.argv[4:] or ["pallas2d_grid", "blocked"]

    import jax
    import jax.numpy as jnp

    from tensornetworks_tpu.engines.common import highest_matmul_precision
    from tensornetworks_tpu.models import QuantumBornMachine
    from tensornetworks_tpu.ops.stein import stein_matvec
    from tensornetworks_tpu.core.bits import all_bitstrings

    print(f"n={n} L={layers} iters={iters} dev={jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    size = 1 << n
    # Synthetic S/B (the Stein side is identical across backends; this
    # script isolates the circuit executor).
    S = jnp.asarray(rng.normal(size=(size, n)).astype(np.float32))
    B = jnp.asarray(all_bitstrings(n), dtype=jnp.float32)

    def timed(fn, init, label):
        def run(x):
            def body(c, _):
                return fn(c), ()
            out, _ = jax.lax.scan(body, x, None, length=iters)
            return out

        rj = jax.jit(run)
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(rj(init))[0])
        print(f"  [{label}] compile+run {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(rj(init))[0])
        ms = 1e3 * (time.perf_counter() - t0) / iters
        print(f"  [{label}] {ms:8.3f} ms/iter", flush=True)
        return ms

    for backend in backends:
        print(f"backend={backend}", flush=True)
        qbm = QuantumBornMachine(n, ansatz_layers=layers,
                                 ansatz_type="hardware_efficient",
                                 init_method="small_random", backend=backend)
        params = qbm.init(jax.random.PRNGKey(0))

        def loss(p):
            q = qbm.probs(p).astype(jnp.float32)
            y = stein_matvec(q, S, B, n, 1.0)
            return jnp.sqrt(jnp.clip(jnp.dot(q, y), 1e-12, None))

        with highest_matmul_precision():
            timed(lambda p: p + 1e-12 * qbm.probs(p)[0].astype(p.dtype),
                  params, "fwd")
            timed(lambda p: p - 1e-3 * jax.grad(loss)(p), params, "fwd+bwd")


if __name__ == "__main__":
    main()
