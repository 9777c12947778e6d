"""Compare Kronecker-apply formulations for the Stein matvec at large n.

Each applies K = A^{(x)n} to an (n+1, 2^n) rows-layout batch, in-scan at
HIGHEST precision. Candidates:
  rows7   - kron_matvec_rows, group=7 (current production path at n >= 18)
  hyb8    - dense (C=256) lane-side matmul + grouped sublane-side passes
  hyb10   - dense (C=1024) lane-side matmul + grouped sublane-side passes
  dense2d - two-sided dense split (current 13..17 path)

Usage: python scripts/bench_kron_forms.py [n] [iters] [form...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    forms = sys.argv[3:] or ["rows7", "hyb8", "hyb10", "dense2d"]

    import jax
    import jax.numpy as jnp

    from tensornetworks_tpu.engines.common import highest_matmul_precision
    from tensornetworks_tpu.ops.hamming import decay_factor
    from tensornetworks_tpu.ops.kron import (kron_matvec_rows, kron_power_np,
                                             _group_plan_head)
    from tensornetworks_tpu.ops.stein import _kron_apply_2d

    a = decay_factor(n, 1.0)
    A = np.array([[1.0, a], [a, 1.0]])
    cols = n + 1
    rng = np.random.default_rng(0)
    V0 = jnp.asarray(rng.normal(size=(cols, 1 << n)).astype(np.float32))

    def make_hybrid(cb, row_group=5):
        rb = n - cb
        R, C = 1 << rb, 1 << cb
        Mc = jnp.asarray(kron_power_np(A, cb).astype(np.float32))
        plan = _group_plan_head(rb, row_group)
        Ms = [jnp.asarray(kron_power_np(A, g).astype(np.float32))
              for _, g in plan]

        def apply(V):
            X = V.reshape(cols, R, C)
            X = jnp.einsum("brc,dc->brd", X, Mc,
                           preferred_element_type=jnp.float32)
            for (s, g), Mg in zip(plan, Ms):
                pre = 1 << s
                rest = R >> (s + g)
                Xv = X.reshape(cols, pre, 1 << g, rest * C)
                X = jnp.einsum("ij,bpjq->bpiq", Mg, Xv,
                               preferred_element_type=jnp.float32)
            return X.reshape(cols, 1 << n)

        return apply

    impls = {
        "rows7": lambda V: kron_matvec_rows(V, A, n, group=7),
        "hyb8": make_hybrid(8),
        "hyb10": make_hybrid(10),
        "dense2d": lambda V: _kron_apply_2d(V, A, n),
    }

    # exactness cross-check at a small n is done in tests; here assert the
    # forms agree with each other on-device once per form
    ref = None
    for form in forms:
        fn = impls[form]

        def run(V):
            def body(c, _):
                y = fn(c)
                return y / jnp.max(jnp.abs(y)), ()
            out, _ = jax.lax.scan(body, V, None, length=iters)
            return out

        rj = jax.jit(run)
        with highest_matmul_precision():
            t0 = time.perf_counter()
            out = rj(V0)
            np.asarray(out[0, :8])
            print(f"[{form}] compile+run {time.perf_counter() - t0:.1f}s",
                  flush=True)
            t0 = time.perf_counter()
            out = rj(V0)
            np.asarray(out[0, :8])
            ms = 1e3 * (time.perf_counter() - t0) / iters
        one = np.asarray(jax.jit(fn)(V0)[:, : 1 << 12])
        if ref is None:
            ref = one
        else:
            err = float(np.max(np.abs(one - ref)) / np.max(np.abs(ref)))
            print(f"[{form}] vs ref rel err {err:.2e}", flush=True)
        print(f"[{form}] {ms:8.3f} ms/apply", flush=True)


if __name__ == "__main__":
    main()
