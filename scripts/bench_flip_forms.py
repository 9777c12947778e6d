"""Per-bit cost of the three candidate flip-accumulate forms on TPU.

For Σ_b flip_b(F_b) over an (R, C) view at a given n, measures in-scan:
  - reverse:  _row_bit_flip (XLA reverse on the sublane axis)
  - fold:     per-bit folded-view permutation einsum, perm size max(R/2^b, 128)
  - batched:  the current whole-batch (rb, R, R) x (rb, R, C) einsum
and the three kron passes of kron_matvec_rows individually.

Usage: python scripts/bench_flip_forms.py [n] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import jax
    import jax.numpy as jnp

    from tensornetworks_tpu.engines.common import highest_matmul_precision
    from tensornetworks_tpu.ops.stein import _row_bit_flip
    from tensornetworks_tpu.ops.kron import kron_power_np, _group_plan_head

    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(rb, R, C)).astype(np.float32))

    def timed(name, fn, *args):
        def run(*a):
            def body(carry, _):
                y = fn(carry, *a[1:])
                return y / jnp.max(jnp.abs(y)), jnp.sum(y)
            return jax.lax.scan(body, a[0], None, length=iters)
        run_j = jax.jit(run)
        with highest_matmul_precision():
            _, vals = run_j(*args)
            float(vals[-1])
            t0 = time.perf_counter()
            _, vals = run_j(*args)
            float(vals[-1])
            dt = time.perf_counter() - t0
        print(f"  {name}: {1e3 * dt / iters:.4f} ms")

    # --- per-bit reverse flips (weighted accumulate, one bit) ---------------
    for b in range(rb):
        timed(f"reverse b={b} (stride {R >> (b + 1)} rows)",
              lambda x, w: x + _row_bit_flip(w * x, b), X, W[b])

    # --- per-bit folded perm einsum -----------------------------------------
    for b in range(rb):
        m = max(R >> b, 128)
        g = R // m
        idx = np.arange(m)
        stride = (R >> (b + 1))
        # inside the m-extent the bit sits at position log2(m / (2*stride_in_m))
        # simpler: global flip stride in rows is R >> (b+1); within each
        # m-block the flip toggles bit (stride % m scale)
        s_in = stride if stride < m else m // 2
        perm = idx ^ s_in
        P = jnp.asarray(np.eye(m, dtype=np.float32)[perm])

        def fold(x, w, P=P, g=g, m=m):
            F = (w * x).reshape(g, m, C)
            y = jnp.einsum("ms,gsc->gmc", P, F,
                           preferred_element_type=jnp.float32)
            return x + y.reshape(R, C)

        timed(f"fold    b={b} (perm {m})", fold, X, W[b])

    # --- batched whole einsum (current corr=matmul row side) ----------------
    xr = jnp.asarray([R >> (b + 1) for b in range(rb)],
                     dtype=jnp.int32)[:, None, None]
    ri = jax.lax.broadcasted_iota(jnp.int32, (rb, R, R), 1)
    si = jax.lax.broadcasted_iota(jnp.int32, (rb, R, R), 2)
    Pr = (si == (ri ^ xr)).astype(jnp.float32)

    def batched(x, w, Pr=Pr):
        F = w * x[None]
        return x + jnp.einsum("brs,bsc->rc", Pr, F,
                              preferred_element_type=jnp.float32)

    timed("batched all-bits einsum", batched, X, W)

    # --- kron passes individually -------------------------------------------
    cols = n + 1
    a = np.exp(-1.0 / n)
    A = np.array([[1.0, a], [a, 1.0]])
    V = jnp.asarray(rng.normal(size=(cols, 1 << n)).astype(np.float32))
    for s, g in _group_plan_head(n, 7):
        M = jnp.asarray(kron_power_np(A, g), dtype=jnp.float32)
        pre = cols << s
        blk = 1 << g
        post = 1 << (n - s - g)

        if post == 1:
            def kpass(v, M=M, pre=pre, blk=blk):
                out = jnp.einsum("aj,ij->ai", v.reshape(pre, blk), M,
                                 preferred_element_type=jnp.float32)
                return out.reshape(v.shape)
        else:
            def kpass(v, M=M, pre=pre, blk=blk, post=post):
                out = jnp.einsum("ij,ajb->aib", M,
                                 v.reshape(pre, blk, post),
                                 preferred_element_type=jnp.float32)
                return out.reshape(v.shape)

        timed(f"kron pass s={s} g={g} post={post}", kpass, V)


if __name__ == "__main__":
    main()
