"""Time the fused roll-based Stein matvec kernel on the TPU vs the XLA path.

Usage: python scripts/bench_stein_fused.py [n] [iters] [rb]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    rb = int(sys.argv[3]) if len(sys.argv) > 3 else (n + 1) // 2

    import jax
    import jax.numpy as jnp

    from tensornetworks_tpu.ops.pallas.stein_fused import make_stein_matvec_fused

    R, C = 1 << rb, 1 << (n - rb)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.dirichlet(np.ones(1 << n)).astype(np.float32).reshape(R, C))
    S3 = jnp.asarray(rng.normal(size=(n, R, C)).astype(np.float32))

    mv = make_stein_matvec_fused(n, rb=rb)

    def run(q0, S3_):
        def body(carry, _):
            y = mv(carry, S3_)
            return y / jnp.sum(jnp.abs(y)), jnp.sum(carry * y)
        return jax.lax.scan(body, q0, None, length=iters)

    run_j = jax.jit(run)
    t0 = time.perf_counter()
    _, vals = run_j(q, S3)
    float(vals[-1])
    print(f"compile+run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    _, vals = run_j(q, S3)
    float(vals[-1])
    dt = time.perf_counter() - t0
    print(f"stein_fused n={n} rb={rb}: {1e3 * dt / iters:.3f} ms/call "
          f"({iters} in-scan iters)")


if __name__ == "__main__":
    main()
