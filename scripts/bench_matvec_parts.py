"""Component breakdown of the production gcorr-tables Stein matvec on TPU.

Times, in-scan and fetch-timed, at a given n:
  - full matvec (corr=matmul and corr=flips)
  - the V-build + Kronecker apply alone
  - kron + flip-free recombination (term_G/sumQ/w-terms, no acc)
so the correction-accumulator and reduction costs fall out by subtraction.

Usage: python scripts/bench_matvec_parts.py [n] [iters] [group]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    group = int(sys.argv[3]) if len(sys.argv) > 3 else 7

    import jax
    import jax.numpy as jnp

    from tensornetworks_tpu.engines.common import highest_matmul_precision
    from tensornetworks_tpu.ops.stein import (kron_matvec_rows,
                                              _kron_apply_2d, decay_factor,
                                              make_gcorr_tables,
                                              stein_matvec_gcorr_tables)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.dirichlet(np.ones(1 << n)).astype(np.float32))
    S = jnp.asarray(rng.normal(size=(1 << n, n)).astype(np.float32))
    tables = make_gcorr_tables(S, n, 1.0)
    kr = "2d" if n <= 17 else "rows"
    a = decay_factor(n, 1.0)
    A = np.array([[1.0, a], [a, 1.0]])

    def kron_only(qv, t):
        V = jnp.concatenate([qv[None, :], t.St * qv], axis=0)
        Y = _kron_apply_2d(V, A, n) if kr == "2d" else kron_matvec_rows(
            V, A, n, group=group)
        return Y[0] + Y[1:].sum(axis=0)

    def kron_reduce(qv, t):
        V = jnp.concatenate([qv[None, :], t.St * qv], axis=0)
        Y = _kron_apply_2d(V, A, n) if kr == "2d" else kron_matvec_rows(
            V, A, n, group=group)
        P0, Q = Y[0], Y[1:]
        term_G = (t.St * Q).sum(axis=0)
        sumQ = Q.sum(axis=0)
        return term_G + 0.37 * (t.Rv * P0 + sumQ) + 0.11 * P0

    cases = {
        "full:matmul": lambda qv, t: stein_matvec_gcorr_tables(
            qv, t, n, 1.0, group=group, kron=kr, corr="matmul"),
        "full:flips": lambda qv, t: stein_matvec_gcorr_tables(
            qv, t, n, 1.0, group=group, kron=kr, corr="flips"),
        "kron_only": kron_only,
        "kron_reduce": kron_reduce,
    }

    for name, fn in cases.items():
        def run(q0, t):
            def body(carry, _):
                y = fn(carry, t)
                return y / jnp.sum(jnp.abs(y)), jnp.dot(carry, y)
            return jax.lax.scan(body, q0, None, length=iters)

        run_j = jax.jit(run)
        with highest_matmul_precision():
            t0 = time.perf_counter()
            _, vals = run_j(q, tables)
            float(vals[-1])
            print(f"  [{name}] compile+run {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            t0 = time.perf_counter()
            _, vals = run_j(q, tables)
            float(vals[-1])
            dt = time.perf_counter() - t0
        print(f"matvec_part[{name}] n={n}: {1e3 * dt / iters:.3f} ms/call")


if __name__ == "__main__":
    main()
