"""Raw rate probes: complex vs f32 matmuls, fold construction, blocked apply."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tensornetworks_tpu.engines.common import force_fetch, highest_matmul_precision
from tensornetworks_tpu.sim.gates import batched_kron, rot_zyx_batched


def timeit(fn, *args, reps=10):
    out = fn(*args)
    force_fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force_fetch(out)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    K = 16  # chain length

    def chain_c(X, Ms):
        for i in range(K):
            X = jnp.einsum("ra,ab->rb", Ms[i], X)
        return jnp.real(X * jnp.conj(X))

    def chain_f(X, Ms):
        for i in range(K):
            X = jnp.einsum("ra,ab->rb", Ms[i], X)
        return X * X

    def chain_blocked(X, Ms_full):
        # (256,256) ops applied to (2^12, 256, 256) view both sides like the
        # blocked executor: contract middle axis then lane axis
        Ms = Ms_full[:, :256, :256]
        for i in range(K):
            v = X.reshape(4096, 256)
            v = jnp.einsum("ij,aj->ai", Ms[i], v)      # lane-axis apply
            v = v.reshape(16, 256, 256)
            v = jnp.einsum("ij,ajb->aib", Ms[i], v)    # middle-axis apply
            X = v.reshape(1024, 1024)
        return jnp.real(X * jnp.conj(X))

    def fold20(params):
        a = params.reshape(8, 20, 3)
        U = rot_zyx_batched(a[..., 0], a[..., 1], a[..., 2]).astype(jnp.complex64)
        M = U[:, 0]
        for q in range(1, 10):
            M = batched_kron(M, U[:, q])
        N = U[:, 10]
        for q in range(11, 20):
            N = batched_kron(N, U[:, q])
        return jnp.abs(M[0, 0, 0]) + jnp.abs(N[0, 0, 0])

    # all host math in numpy — eager jnp ops hit the axon backend outside
    # jit and fail with UNIMPLEMENTED
    Xc_np = (rng.normal(size=(1024, 1024))
             + 1j * rng.normal(size=(1024, 1024))).astype(np.complex64)
    Mc_np = 0.03 * (rng.normal(size=(K, 1024, 1024))
                    + 1j * rng.normal(size=(K, 1024, 1024)))
    Xc = jnp.asarray(Xc_np, dtype=jnp.complex64)
    Mc = jnp.asarray(Mc_np.astype(np.complex64))
    Xf = jnp.asarray(Xc_np.real.astype(np.float32))
    Mf = jnp.asarray(Mc_np.real.astype(np.float32))
    p = jnp.asarray(0.1 * rng.normal(size=480), dtype=jnp.float32)

    with highest_matmul_precision():
        t = timeit(jax.jit(chain_c), Xc, Mc)
        gf = K * 4 * 2 * 1024**3 / t / 1e12
        print(f"complex 1024 chain : {t*1e3:7.2f} ms  ({gf:6.1f} TF/s real-equiv)")
        t = timeit(jax.jit(chain_f), Xf, Mf)
        gf = K * 2 * 1024**3 / t / 1e12
        print(f"f32     1024 chain : {t*1e3:7.2f} ms  ({gf:6.1f} TF/s)")
        t = timeit(jax.jit(chain_blocked), Xc, Mc)
        gf = K * 2 * 4 * 2 * 1024 * 1024 * 256 / t / 1e12
        print(f"complex 256-blocked: {t*1e3:7.2f} ms  ({gf:6.1f} TF/s real-equiv)")
        t = timeit(jax.jit(fold20), p)
        print(f"fold 2x(8,1024,1024): {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
