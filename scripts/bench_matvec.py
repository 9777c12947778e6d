"""Time the Stein Kronecker matvec in-scan on the TPU at a given n.

Mirrors how engines consume it: many matvecs inside one lax.scan under
HIGHEST matmul precision, fetch-timed.

Usage: python scripts/bench_matvec.py [n] [iters] [variant: old|gcorr2d|gcorrrows|tables] [group]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    variant = sys.argv[3] if len(sys.argv) > 3 else "old"
    group = int(sys.argv[4]) if len(sys.argv) > 4 else 7
    corr = sys.argv[5] if len(sys.argv) > 5 else "flips"

    import jax
    import jax.numpy as jnp

    from tensornetworks_tpu.core.bits import all_bitstrings
    from tensornetworks_tpu.engines.common import highest_matmul_precision
    from tensornetworks_tpu.ops.stein import stein_matvec, stein_matvec_gcorr
    from functools import partial

    if variant == "tables":
        from tensornetworks_tpu.ops.stein import (make_gcorr_tables,
                                                  stein_matvec_gcorr_tables)
    mv = {
        "old": stein_matvec,
        "gcorr2d": partial(stein_matvec_gcorr, kron="2d"),
        "gcorrrows": partial(stein_matvec_gcorr, kron="rows"),
        "tables": None,
    }[variant]

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.dirichlet(np.ones(1 << n)).astype(np.float32))
    S = jnp.asarray(rng.normal(size=(1 << n, n)).astype(np.float32))
    B = (jnp.asarray(all_bitstrings(n), dtype=jnp.float32)
         if variant != "tables" else jnp.zeros((1, 1), dtype=jnp.float32))

    tab_ref = [None]
    extra = ()
    if variant == "tables":
        extra = (make_gcorr_tables(S, n, 1.0),)
        kr = "2d" if n <= 17 else "rows"
        mv = lambda q_, S_, B_, n_, ls_: stein_matvec_gcorr_tables(
            q_, tab_ref[0], n_, ls_, group=group, kron=kr, corr=corr)
        # the tables variant never reads S/B inside the scan — don't keep
        # 2·(2^n, n) dead arrays on the chip (3.2 GB at n = 24)
        S = jnp.zeros((1, 1), dtype=jnp.float32)
        B = jnp.zeros((1, 1), dtype=jnp.float32)

    def run(q0, S_, B_, *tabs):
        if tabs:
            tab_ref[0] = tabs[0]
        def body(carry, _):
            y = mv(carry, S_, B_, n, 1.0)
            # renormalize so the value stays bounded across iterations
            return y / jnp.sum(jnp.abs(y)), jnp.dot(carry, y)

        return jax.lax.scan(body, q0, None, length=iters)

    run_j = jax.jit(run)
    with highest_matmul_precision():
        t0 = time.perf_counter()
        _, vals = run_j(q, S, B, *extra)
        float(vals[-1])
        print(f"compile+run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        t0 = time.perf_counter()
        _, vals = run_j(q, S, B, *extra)
        float(vals[-1])
        dt = time.perf_counter() - t0
    tag = f"{variant}:{corr}" if variant == "tables" else variant
    print(f"stein_matvec[{tag}] n={n}: {1e3 * dt / iters:.3f} ms/call "
          f"({iters} in-scan iters)")


if __name__ == "__main__":
    main()
