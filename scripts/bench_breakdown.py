"""Per-component epoch cost breakdown on the TPU at a given n.

Times, each inside its own lax.scan (fetch-timed, HIGHEST matmul precision):
  1. circuit forward (blocked executor, hardware_efficient)
  2. circuit forward + backward (KSD-loss grad)
  3. Stein Kronecker matvec alone
  4. full train epoch (fwd + grad + update + TVD eval) — the engine shape

Prints a roofline estimate next to each: FLOPs / min(MXU, HBM) time on
v5e (197 TFLOP/s bf16 -> ~33 TFLOP/s HIGHEST-f32 6-pass; 819 GB/s HBM).

Usage: python scripts/bench_breakdown.py [n] [layers] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_F32_FLOPS = 33e12   # HIGHEST precision ≈ 6-pass bf16 of 197 Tf/s
V5E_HBM_BPS = 819e9


def timed_scan(fn, init, iters, label, flops=None, bytes_moved=None,
               consts=()):
    import jax

    # ``consts`` ride as jit ARGUMENTS (closure capture would embed the
    # operator tables as HLO constants -> HTTP 413 from the remote compiler
    # at n >= 20).
    def run(x, *cs):
        def body(c, _):
            y = fn(c, *cs)
            return y, ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    rj = jax.jit(run)
    out = rj(init, *consts)
    np.asarray(jax.tree.leaves(out)[0])  # force fetch (warm-up)
    t0 = time.perf_counter()
    out = rj(init, *consts)
    np.asarray(jax.tree.leaves(out)[0])
    ms = 1e3 * (time.perf_counter() - t0) / iters
    line = f"{label:42s} {ms:8.3f} ms"
    if flops:
        mxu_ms = 1e3 * flops / V5E_F32_FLOPS
        line += f" | flop-floor {mxu_ms:7.3f} ms ({100 * mxu_ms / ms:5.1f}% MXU util)"
    if bytes_moved:
        hbm_ms = 1e3 * bytes_moved / V5E_HBM_BPS
        line += f" | hbm-floor {hbm_ms:7.3f} ms"
    print(line, flush=True)
    return ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    import jax
    import jax.numpy as jnp
    import optax

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines.common import (highest_matmul_precision,
                                                   make_optimizer)
    from tensornetworks_tpu.models import QuantumBornMachine
    from tensornetworks_tpu.ops import SteinOperator, score_table
    from tensornetworks_tpu.ops.stein import stein_matvec

    print(f"n={n} layers={layers} iters={iters} dev={jax.devices()}", flush=True)
    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    t = bn.conditional_joint_table(latent, {f"V{n}": 1})
    S = score_table(t)
    op = SteinOperator(S, n, dense=False)
    qbm = QuantumBornMachine(n, ansatz_layers=layers,
                             ansatz_type="hardware_efficient",
                             init_method="small_random")
    params = qbm.init(jax.random.PRNGKey(0))
    tables = op.args()
    size = 1 << n

    # FLOP model: blocked executor, blocks of 8 -> per layer ~sum over blocks
    # of 2*2^n*2^b complex(x4); matvec: (n+1) cols x ceil(n/7) grouped passes
    # x 2*2^n*2^7 (+ corrections, negligible).
    blocks = [min(8, n - s) for s in range(0, n, 8)]
    circ_fwd_flops = layers * sum(2 * size * (1 << b) * 4 for b in blocks)
    n_passes = -(-n // 7)
    mv_flops = (n + 1) * n_passes * 2 * size * 128
    mv_bytes = n_passes * 2 * (n + 1) * size * 4

    with highest_matmul_precision():
        # tiny data dependency on the probs output so scan cannot DCE it
        timed_scan(lambda p: p + 1e-12 * qbm.probs(p)[0].astype(p.dtype),
                   params, iters, "circuit fwd (blocked)",
                   flops=circ_fwd_flops)

        def loss(p, *tabs):
            q = qbm.probs(p).astype(jnp.float32)
            return op.ksd_loss_from(q, *tabs)

        timed_scan(lambda p, *tabs: p - 1e-12 * jax.grad(loss)(p, *tabs),
                   params, iters,
                   "loss fwd+bwd (circuit + matvec + grad)",
                   flops=3 * circ_fwd_flops + mv_flops, consts=tables)

        rng = np.random.default_rng(0)
        q0 = jnp.asarray(rng.dirichlet(np.ones(size)).astype(np.float32))
        from tensornetworks_tpu.ops.stein import stein_matvec_gcorr_tables
        (gtab,) = tables
        timed_scan(lambda q, gt: (y := stein_matvec_gcorr_tables(q, gt, n, 1.0, kron=op._gcorr_kron, corr=op._gcorr_corr),
                              y / jnp.sum(jnp.abs(y)))[1],
                   q0, iters, "stein matvec", flops=mv_flops,
                   bytes_moved=mv_bytes, consts=(gtab,))

        opt = make_optimizer("adam", 5e-3, 1000)
        post = q0

        def loss_q(p, *tabs):
            q = qbm.probs(p).astype(jnp.float32)
            return op.ksd_loss_from(q, *tabs), q

        def epoch(carry, *tabs):
            # engine-shaped epoch with eval reuse: the loss forward's q IS
            # the previous epoch's post-update eval (engines/ksd.py).
            p, s = carry
            (l, q), g = jax.value_and_grad(loss_q, has_aux=True)(p, *tabs)
            tvd = 0.5 * jnp.abs(q - post).sum()
            upd, s = opt.update(g, s, p)
            p = optax.apply_updates(p, upd)
            return (p + 0.0 * tvd, s)

        timed_scan(epoch, (params, opt.init(params)), iters,
                   "full epoch (fwd+bwd+update+TVD, eval-reuse)",
                   flops=3 * circ_fwd_flops + mv_flops, consts=tables)


if __name__ == "__main__":
    main()
