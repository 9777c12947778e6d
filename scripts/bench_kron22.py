"""Kron-apply pass formulation sweep at large n (the n=22 bandwidth cliff).

Times, in-scan on the TPU, for the (n+1, 2^n) row-layout batch:
  - each grouped pass of the current einsum form individually
  - whole kron via: current form; dot_general-right form; transpose-shuttle
    form (every contraction on the lane axis, explicit transposes between)
  - bf16-IO variant of the current form (halved traffic probe)

Usage: python scripts/bench_kron22.py [n] [iters] [group]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    group = int(sys.argv[3]) if len(sys.argv) > 3 else 7

    import jax
    import jax.numpy as jnp

    from tensornetworks_tpu.engines.common import highest_matmul_precision
    from tensornetworks_tpu.ops.kron import (kron_power_np,
                                             _group_plan_balanced)

    cols = n + 1
    a = np.exp(-1.0 / n)
    A = np.array([[1.0, a], [a, 1.0]])
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.normal(size=(cols, 1 << n)).astype(np.float32) /
                    np.sqrt(1 << n))
    plan = _group_plan_balanced(n, group)
    print(f"n={n} plan={plan}", flush=True)
    Ms = [jnp.asarray(kron_power_np(A, g), dtype=jnp.float32)
          for _, g in plan]

    def timed(name, fn, *args):
        def run(*ar):
            def body(carry, _):
                y = fn(carry, *ar[1:])
                return y / jnp.max(jnp.abs(y)), jnp.sum(y)
            return jax.lax.scan(body, ar[0], None, length=iters)
        run_j = jax.jit(run)
        with highest_matmul_precision():
            t0 = time.perf_counter()
            _, vals = run_j(*args)
            float(vals[-1])
            print(f"  [{name}] compile+run {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            t0 = time.perf_counter()
            _, vals = run_j(*args)
            float(vals[-1])
            dt = time.perf_counter() - t0
        print(f"kron22[{name}] n={n}: {1e3 * dt / iters:.3f} ms/call",
              flush=True)

    # individual passes (current einsum form)
    for (s, g), M in zip(plan, Ms):
        pre = cols << s
        blk = 1 << g
        post = 1 << (n - s - g)
        if post == 1:
            fn = (lambda v, M=M, pre=pre, blk=blk:
                  jnp.einsum("aj,ij->ai", v.reshape(pre, blk), M,
                             preferred_element_type=jnp.float32)
                  .reshape(v.shape))
        else:
            fn = (lambda v, M=M, pre=pre, blk=blk, post=post:
                  jnp.einsum("ij,ajb->aib", M, v.reshape(pre, blk, post),
                             preferred_element_type=jnp.float32)
                  .reshape(v.shape))
        timed(f"pass s={s} g={g} post={post}", fn, V, M)

    # whole kron: current form
    def kron_cur(v, *Ms_):
        out = v
        for (s, g), M in zip(plan, Ms_):
            pre = cols << s
            blk = 1 << g
            post = 1 << (n - s - g)
            if post == 1:
                out = jnp.einsum("aj,ij->ai", out.reshape(pre, blk), M,
                                 preferred_element_type=jnp.float32)
            else:
                out = jnp.einsum("ij,ajb->aib", M, out.reshape(pre, blk, post),
                                 preferred_element_type=jnp.float32)
            out = out.reshape(v.shape)
        return out
    timed("whole current", kron_cur, V, *Ms)

    # whole kron: right-contraction form "ajb,jj->..." keeps output order
    def kron_right(v, *Ms_):
        out = v
        for (s, g), M in zip(plan, Ms_):
            pre = cols << s
            blk = 1 << g
            post = 1 << (n - s - g)
            if post == 1:
                out = jnp.einsum("aj,ij->ai", out.reshape(pre, blk), M,
                                 preferred_element_type=jnp.float32)
            else:
                out = jnp.einsum("ajb,ij->aib", out.reshape(pre, blk, post),
                                 M, preferred_element_type=jnp.float32)
            out = out.reshape(v.shape)
        return out
    timed("whole right-einsum", kron_right, V, *Ms)

    # whole kron: transpose shuttle — every contraction a plain 2D lane-axis
    # matmul; explicit transposes move each group to the trailing axis.
    def kron_shuttle(v, *Ms_):
        out = v
        for (s, g), M in zip(plan, Ms_):
            pre = cols << s
            blk = 1 << g
            post = 1 << (n - s - g)
            if post == 1:
                out = jnp.einsum("aj,ij->ai", out.reshape(pre, blk), M,
                                 preferred_element_type=jnp.float32)
            else:
                x = out.reshape(pre, blk, post).transpose(0, 2, 1)
                y = jnp.einsum("abj,ij->abi", x, M,
                               preferred_element_type=jnp.float32)
                out = y.transpose(0, 2, 1)
            out = out.reshape(v.shape)
        return out
    timed("whole shuttle", kron_shuttle, V, *Ms)

    # bf16 IO probe of the current form
    def kron_bf16(v, *Ms_):
        out = v.astype(jnp.bfloat16)
        for (s, g), M in zip(plan, Ms_):
            pre = cols << s
            blk = 1 << g
            post = 1 << (n - s - g)
            Mb = M.astype(jnp.bfloat16)
            if post == 1:
                out = jnp.einsum("aj,ij->ai", out.reshape(pre, blk), Mb,
                                 preferred_element_type=jnp.float32)
            else:
                out = jnp.einsum("ij,ajb->aib", Mb, out.reshape(pre, blk, post),
                                 preferred_element_type=jnp.float32)
            out = out.reshape(v.shape).astype(jnp.bfloat16)
        return out.astype(jnp.float32)
    timed("whole bf16-io", kron_bf16, V, *Ms)


def rot_variant():
    """Appended experiment: rotation-form kron (no output transposes)."""
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    group = int(sys.argv[3]) if len(sys.argv) > 3 else 7

    import jax
    import jax.numpy as jnp
    from tensornetworks_tpu.engines.common import highest_matmul_precision
    from tensornetworks_tpu.ops.kron import kron_power_np, _group_plan_balanced

    cols = n + 1
    a = np.exp(-1.0 / n)
    A = np.array([[1.0, a], [a, 1.0]])
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.normal(size=(cols, 1 << n)).astype(np.float32) /
                    np.sqrt(1 << n))
    sizes = [g for _, g in _group_plan_balanced(n, group)]
    Ms = [jnp.asarray(kron_power_np(A, g), dtype=jnp.float32) for g in sizes]

    def kron_rot(v, *Ms_):
        out = v
        for g, M in zip(sizes, Ms_):
            blk = 1 << g
            rest = (1 << n) // blk
            # contract the TOP group; dot_general's native (a, b, i) output
            # rotates it to the bottom — after the full cycle the original
            # bit order is restored (A^{\otimes g} is symmetric, no M^T).
            out = jnp.einsum("ajb,ji->abi", out.reshape(cols, blk, rest), M,
                             preferred_element_type=jnp.float32)
            out = out.reshape(cols, 1 << n)
        return out

    def timed(name, fn, *args):
        def run(*ar):
            def body(carry, _):
                y = fn(carry, *ar[1:])
                return y / jnp.max(jnp.abs(y)), jnp.sum(y)
            return jax.lax.scan(body, ar[0], None, length=iters)
        run_j = jax.jit(run)
        with highest_matmul_precision():
            t0 = time.perf_counter()
            _, vals = run_j(*args)
            float(vals[-1])
            print(f"  [{name}] compile+run {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            t0 = time.perf_counter()
            _, vals = run_j(*args)
            float(vals[-1])
            dt = time.perf_counter() - t0
        print(f"kron22[{name}] n={n}: {1e3 * dt / iters:.3f} ms/call",
              flush=True)

    timed("whole rotation", kron_rot, V, *Ms)

    # exactness probe vs current form (f32, should agree to ~1e-6 rel)
    from tensornetworks_tpu.ops.kron import kron_matvec_rows
    with highest_matmul_precision():
        y_cur = kron_matvec_rows(V, A, n, group=group)
        y_rot = kron_rot(V, *Ms)
        err = float(jnp.max(jnp.abs(y_cur - y_rot)) / jnp.max(jnp.abs(y_cur)))
    print(f"rotation-vs-current rel err: {err:.2e}")


if __name__ == "__main__":
    rot_variant() if os.environ.get("KRON_ROT") else main()
