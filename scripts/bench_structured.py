"""Measure DAG-structured-ansatz KSD training throughput on the TPU.

Times the full jitted train epoch (fwd + grad + update, scanned) for the
``bn_structured`` ansatz at n qubits — the configuration of the RESULTS.md
"objective quality at scale" study. Run AFTER the flip-select CNOT rewrite
of ``sim/structured.py`` to quantify the speedup over the H·CZ-mask·H
executor (2.3 eps at 20q before).

Usage: python scripts/bench_structured.py [n_qubits] [layers] [epochs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    timed_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    import jax
    import jax.numpy as jnp
    import optax

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines.common import (highest_matmul_precision,
                                                   make_optimizer)
    from tensornetworks_tpu.models import QuantumBornMachine
    from tensornetworks_tpu.ops import SteinOperator, score_table
    from tensornetworks_tpu.sim.structured import latent_edges

    print(f"devices: {jax.devices()}", file=sys.stderr)
    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    edges = latent_edges(bn, latent)
    print(f"n={n} layers={layers} edges={len(edges)}", file=sys.stderr)
    t = bn.conditional_joint_table(latent, {f"V{n}": 1})
    S = score_table(t)
    op = SteinOperator(S, n, dense=False)

    qbm = QuantumBornMachine(n, ansatz_layers=layers, ansatz_type="bn_structured",
                             init_method="small_random", edges=edges)
    params = qbm.init(jax.random.PRNGKey(0))
    opt = make_optimizer("adam", 5e-3, 1000, use_lr_scheduler=True,
                         gradient_clip_norm=10.0)
    opt_state = opt.init(params)

    def loss_fn(p, tables):
        q = qbm.probs(p).astype(jnp.float32)
        return op.ksd_loss_from(q, *tables)

    def step(carry, _, tables):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, tables)
        updates, s = opt.update(grads, s, p)
        return (optax.apply_updates(p, updates), s), loss

    def run_epochs(p, s, tables):
        (p, s), losses = jax.lax.scan(lambda c, x: step(c, x, tables), (p, s),
                                      None, length=timed_epochs)
        return p, s, losses

    run_timed = jax.jit(run_epochs)
    tables = op.args()
    with highest_matmul_precision():
        t0 = time.perf_counter()
        params, opt_state, losses = run_timed(params, opt_state, tables)
        float(losses[-1])
        print(f"compile+first run: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        t0 = time.perf_counter()
        params, opt_state, losses = run_timed(params, opt_state, tables)
        float(losses[-1])
        elapsed = time.perf_counter() - t0
    print(f"structured {n}q L={layers}: {timed_epochs / elapsed:.2f} epochs/s "
          f"({1e3 * elapsed / timed_epochs:.2f} ms/epoch), "
          f"final loss {float(losses[-1]):.5f}")


if __name__ == "__main__":
    main()
