"""Does the factory's eager real_dtype probe poison the axon backend?"""
import os, subprocess, sys

CASE = os.environ.get("CASE")
if CASE is not None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    import jax, jax.numpy as jnp
    from tensornetworks_tpu.sim.gates import batched_kron, rot_zyx_batched
    n, L = 10, 2
    rb = (n + 1) // 2; cb = n - rb
    R, C = 1 << rb, 1 << cb
    edges = [(0, 3), (3, 7), (2, 8), (1, 4)]

    if CASE == "eager_probe":
        rdt = jnp.real(jnp.zeros((), dtype=jnp.complex64)).dtype
        print("probe dtype:", rdt)

    def bit_mask(q):
        if q < rb:
            b = (jax.lax.iota(jnp.int32, R) >> (rb - 1 - q)) & 1
            return b.astype(jnp.float32)[:, None]
        b = (jax.lax.iota(jnp.int32, C) >> (cb - 1 - (q - rb))) & 1
        return b.astype(jnp.float32)[None, :]

    def flip_bit(X, q):
        if q < rb:
            pre = 1 << q
            return X.reshape(pre, 2, R // (2 * pre), C)[:, ::-1].reshape(R, C)
        qq = q - rb
        pre = 1 << qq
        return X.reshape(R, pre, 2, C // (2 * pre))[:, :, ::-1].reshape(R, C)

    def replica(params):
        a = params.reshape(L, n, 3)
        U = rot_zyx_batched(a[..., 0], a[..., 1], a[..., 2]).astype(jnp.complex64)
        M = U[:, 0]
        for q in range(1, rb):
            M = batched_kron(M, U[:, q])
        N = U[:, rb]
        for q in range(rb + 1, n):
            N = batched_kron(N, U[:, q])
        X = jnp.full((R, C), 1.0 / np.sqrt(float(1 << n)), dtype=jnp.complex64)
        s = jnp.ones((1, 1), dtype=jnp.float32)
        for c, t in edges:
            s = s * (1.0 - 2.0 * bit_mask(c) * bit_mask(t))
        for l in range(L):
            X = M[l] @ X @ N[l].T
            if l % 2 == 0:
                for c, t in edges:
                    X = X + bit_mask(c) * (flip_bit(X, t) - X)
            else:
                X = X * s
        flat = X.reshape(-1)
        return jnp.real(flat * jnp.conj(flat))

    p = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (3 * L * n,))
    q = jax.jit(replica)(p)
    print(f"sum={float(q.sum()):.6f}")
    sys.exit(0)

for case in ("plain", "eager_probe"):
    try:
        r = subprocess.run([sys.executable, __file__],
                           env={**os.environ, "CASE": case},
                           capture_output=True, text=True, timeout=240)
        tail = (r.stdout.strip().splitlines() or [""])[-1]
        err = "" if r.returncode == 0 else (r.stderr.strip().splitlines() or [""])[-1]
        print(f"{case}: rc={r.returncode} {tail} {err}", flush=True)
    except subprocess.TimeoutExpired:
        print(f"{case}: HANG", flush=True)
