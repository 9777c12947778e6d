"""Decompose stein_matvec_gcorr cost at large n: kron apply alone, + pure
recombination (corrections zeroed), + full corrections. In-scan, HIGHEST.

Usage: python scripts/bench_gcorr_parts.py [n] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    import jax
    import jax.numpy as jnp

    from tensornetworks_tpu.core.bits import all_bitstrings
    from tensornetworks_tpu.engines.common import highest_matmul_precision
    from tensornetworks_tpu.ops.hamming import decay_factor
    from tensornetworks_tpu.ops.kron import kron_matvec_rows
    from tensornetworks_tpu.ops.stein import stein_matvec_gcorr, _row_bit_flip

    a = decay_factor(n, 1.0)
    A = np.array([[1.0, a], [a, 1.0]])
    rng = np.random.default_rng(0)
    size = 1 << n
    q0 = jnp.asarray(rng.dirichlet(np.ones(size)).astype(np.float32))
    S = jnp.asarray(rng.normal(size=(size, n)).astype(np.float32))
    B = jnp.asarray(all_bitstrings(n), dtype=jnp.float32)
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb

    def kron_only(q, S_, B_):
        V = jnp.concatenate([q[None, :], S_.T * q], axis=0)
        Y = kron_matvec_rows(V, A, n, group=7)
        return Y[0] + Y[1:].sum(axis=0)

    def no_corr(q, S_, B_):
        St, Bt = S_.T, B_.T
        V = jnp.concatenate([q[None, :], St * q], axis=0)
        Y = kron_matvec_rows(V, A, n, group=7)
        P0, Q = Y[0], Y[1:]
        one2b = 1.0 - 2.0 * Bt
        u = (St * Bt).sum(axis=0)
        term_G = (St * Q).sum(axis=0)
        y_T1 = u * P0 + (St * one2b * Q).sum(axis=0)  # fake: Q in place of P
        y_T1t = (one2b * Q).sum(axis=0) + (Bt * Q).sum(axis=0)
        y_D = Bt.sum(axis=0) * P0 + (one2b * Q).sum(axis=0)
        return term_G + y_T1 + y_T1t + y_D + St.sum(axis=0) * P0 + Q.sum(axis=0)

    def flips_only(q, S_, B_):
        # the 2n sublane flips + transposes, on fake sources (q replicated)
        X0 = q.reshape(R, C)
        acc = jnp.zeros((R, C), dtype=q.dtype)
        for t in range(rb):
            acc = acc + _row_bit_flip(X0, t)
        Xt = X0.T
        acct = jnp.zeros((C, R), dtype=q.dtype)
        for t in range(cb):
            acct = acct + _row_bit_flip(Xt, t)
        return (acc + acct.T).reshape(-1)

    def full(q, S_, B_):
        return stein_matvec_gcorr(q, S_, B_, n, 1.0, kron="rows")

    for label, fn in [("kron only", kron_only), ("kron+recomb", no_corr),
                      ("flips(P0) only", flips_only), ("full gcorr", full)]:
        def run(q, S_, B_):
            def body(c, _):
                y = fn(c, S_, B_)
                return y / jnp.sum(jnp.abs(y)), ()
            out, _ = jax.lax.scan(body, q, None, length=iters)
            return out

        rj = jax.jit(run)
        with highest_matmul_precision():
            t0 = time.perf_counter()
            np.asarray(rj(q0, S, B)[:8])
            print(f"[{label}] compile+run {time.perf_counter() - t0:.1f}s",
                  flush=True)
            t0 = time.perf_counter()
            np.asarray(rj(q0, S, B)[:8])
            ms = 1e3 * (time.perf_counter() - t0) / iters
        print(f"[{label}] {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
