"""Per-chunk wall-clock of the structured KSD engine: separates the one-time
chunk-program compile from steady-state epoch cost.

Usage: python scripts/probe_engine_chunks.py [n] [chunks] [chunk_epochs] [backend]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ce = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    backend = sys.argv[4] if len(sys.argv) > 4 else "auto"

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines.common import (force_fetch,
                                                   highest_matmul_precision,
                                                   make_optimizer)
    from tensornetworks_tpu.engines.ksd import QuantumKSDVariationalInference

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)

    model = QuantumKSDVariationalInference(
        bn, latent, list(observed), qbm_num_latent_vars=n,
        qbm_ansatz_layers=8, qbm_ansatz_type="bn_structured",
        qbm_backend=backend, seed=0)
    print(f"backend={model.born_machine.backend}")
    op = model.build_operator(observed)
    optimizer = make_optimizer("adam", 0.05, chunks * ce, True, (0.9, 0.999),
                               10.0)
    bm = model.born_machine
    pv = jnp.asarray(post, dtype=jnp.float32)

    def eval_probs_fn(p):
        return bm.probs(p).astype(jnp.float32)

    sa = tuple(op.args())

    def _scan_chunk(carry, epochs, sa_t, pv_t):
        def step(c, e):
            params, opt_state, k, best_tvd, best_epoch, best_params, esi, stopped = c
            k, sub = jax.random.split(k)

            def loss_fn(p):
                q = eval_probs_fn(p)
                return op.ksd_loss_from(q, *sa_t), q

            (loss, q), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            tvd = 0.5 * jnp.abs(q - pv_t[0]).sum()
            improved = (tvd < best_tvd) & (e > 0)
            best_tvd = jnp.where(improved, tvd, best_tvd)
            best_epoch = jnp.where(improved, e - 1, best_epoch)
            best_params = jax.tree.map(
                lambda a, b: jnp.where(improved, a, b), params, best_params)
            import optax
            from tensornetworks_tpu.engines.common import guarded_update
            params, opt_state = guarded_update(
                optimizer, grads, opt_state, params, jnp.isfinite(loss))
            return (params, opt_state, k, best_tvd, best_epoch, best_params,
                    esi, stopped), (loss, tvd)

        return jax.lax.scan(step, carry, epochs)

    scan_chunk = jax.jit(_scan_chunk)
    p0 = model.params
    carry = (p0, optimizer.init(p0), jax.random.PRNGKey(0),
             jnp.asarray(np.inf, dtype=jnp.float32), jnp.asarray(-1), p0,
             jnp.asarray(0), jnp.asarray(False))
    with highest_matmul_precision():
        for i in range(chunks):
            epochs = jnp.arange(i * ce, (i + 1) * ce)
            t0 = time.perf_counter()
            carry, outs = scan_chunk(carry, epochs, sa, (pv,))
            force_fetch(outs[0])
            dt = time.perf_counter() - t0
            print(f"chunk {i}: {dt:.2f}s  ({ce / dt:.1f} eps)  "
                  f"loss={float(np.asarray(outs[0])[-1]):.4f} "
                  f"best_tvd={float(carry[3]):.4f}", flush=True)


if __name__ == "__main__":
    main()
