"""Piecewise timing of the composed structured executor's components."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tensornetworks_tpu.core import get_random_chain_network
from tensornetworks_tpu.sim.structured import (
    latent_edges, _LayerMap, _perm_gather, _masked_sublane_flip)
from tensornetworks_tpu.sim.gates import batched_kron, rot_zyx_batched
from tensornetworks_tpu.engines.common import force_fetch, highest_matmul_precision


def timeit(fn, *args, reps=20):
    out = fn(*args)
    force_fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force_fetch(out)
    return (time.perf_counter() - t0) / reps


def main():
    n, L = 20, 8
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb
    bn = get_random_chain_network(n + 1, seed=0)
    edges = latent_edges(bn, [f"V{i}" for i in range(n)])
    lm = _LayerMap(edges, n, rb)
    print(f"b_flips: {[(j, len(b)) for j, b in lm.b_flips]}")
    rng = np.random.default_rng(0)
    p = jnp.asarray(0.1 * rng.normal(size=3 * L * n), dtype=jnp.float32)
    dtype = jnp.complex64

    def fold(U, lo, hi):
        M = U[:, lo]
        for q in range(lo + 1, hi):
            M = batched_kron(M, U[:, q])
        return M

    def mats(params):
        a = params.reshape(L, n, 3)
        U = rot_zyx_batched(a[..., 0], a[..., 1], a[..., 2]).astype(dtype)
        return fold(U, 0, rb), fold(U, rb, n)

    def rot_only(params):
        Lm, Rm = mats(params)
        X = jnp.full((R, C), 1.0 / np.sqrt(float(1 << n)), dtype=dtype)
        for l in range(L):
            Z1 = jnp.einsum("ra,ab->rb", Lm[l], X)
            X = jnp.einsum("rb,cb->rc", Z1, Rm[l])
        return jnp.real(X * jnp.conj(X)).reshape(-1)

    def with_perm(params):
        Lm, Rm = mats(params)
        LmE = _perm_gather(Lm[::2], lm.inv_r, lm.fwd_r, 1)
        RmE = _perm_gather(Rm[::2], lm.inv_c, lm.fwd_c, 1)
        X = jnp.full((R, C), 1.0 / np.sqrt(float(1 << n)), dtype=dtype)
        ei = 0
        for l in range(L):
            Ml, Mc = (LmE[ei], RmE[ei]) if l % 2 == 0 else (Lm[l], Rm[l])
            if l % 2 == 0:
                ei += 1
            Z1 = jnp.einsum("ra,ab->rb", Ml, X)
            X = jnp.einsum("rb,cb->rc", Z1, Mc)
        return jnp.real(X * jnp.conj(X)).reshape(-1)

    def mats_only(params):
        Lm, Rm = mats(params)
        return jnp.abs(Lm.sum() + Rm.sum())

    def flips_only_bench(params):
        # rotations in alternating orientation + flips, no perms
        Lm, Rm = mats(params)
        X = jnp.full((R, C), 1.0 / np.sqrt(float(1 << n)), dtype=dtype)
        transposed = False
        for l in range(L):
            Ml, Mc = Lm[l], Rm[l]
            want_cr = l % 2 == 0
            if not transposed:
                if want_cr:
                    Z1 = jnp.einsum("cb,ab->ca", Mc, X)
                    X = jnp.einsum("ca,ra->cr", Z1, Ml)
                else:
                    Z1 = jnp.einsum("ra,ab->rb", Ml, X)
                    X = jnp.einsum("rb,cb->rc", Z1, Mc)
            else:
                if want_cr:
                    Z1 = jnp.einsum("cb,ba->ca", Mc, X)
                    X = jnp.einsum("ca,ra->cr", Z1, Ml)
                else:
                    Z1 = jnp.einsum("ra,ba->rb", Ml, X)
                    X = jnp.einsum("rb,cb->rc", Z1, Mc)
            transposed = want_cr
            if want_cr:
                for j, bits in lm.b_flips:
                    m = ((jax.lax.iota(jnp.int32, R) >> (rb - 1 - j)) & 1
                         ).astype(jnp.float32)
                    X = _masked_sublane_flip(X, m, bits, cb)
        pr = jnp.real(X * jnp.conj(X))
        if transposed:
            pr = pr.T
        return pr.reshape(-1)

    with highest_matmul_precision():
        for name, f in [("mats_only", mats_only), ("rot_only", rot_only),
                        ("with_perm", with_perm),
                        ("alt_orient+flips", flips_only_bench)]:
            jf = jax.jit(f)
            t = timeit(jf, p)
            print(f"{name:18s} {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
