"""n=28 sampled-KSD long run with a quality surrogate (VERDICT r3 item 3c).

Past the exact-enumeration wall no 2^n posterior exists to TVD against, so
quality is reported as the per-variable posterior-marginal error:

- target marginals P(z_i=1 | x): likelihood weighting on the BN (host-side
  vectorized ancestral sampling, consistent, ESS-reported —
  ``core.bayes_net.likelihood_weighted_marginals``);
- model marginals: EXACT bit marginals of |psi|^2, computed from two axis
  reductions of the (2^14, 2^14) probs view (no shots noise, no 2^n
  auxiliary buffer beyond the probs the loss already materializes).

Reports mean/max |Δp| over the 28 latent bits plus the U-stat floor.

Usage: python scripts/quality28_sampled.py [epochs] [chunk] [shots] [layers]
           [lr] [--ls X|auto] [--seed K] [--n N]

``--n`` (default 28) sizes the problem: n=27 is the largest size whose
training program clears the round-4 remote compiler's tightened AOT HBM
estimate (the byte-identical n=28 program compiled at 15.6 GiB in round 3
but is now rejected at 16.11 GiB vs the 15.75 GiB limit — RESULTS.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    epochs = int(argv[0]) if len(argv) > 0 else 1200
    chunk = int(argv[1]) if len(argv) > 1 else 15
    shots = int(argv[2]) if len(argv) > 2 else 1024
    layers = int(argv[3]) if len(argv) > 3 else 4
    lr = float(argv[4]) if len(argv) > 4 else 0.05
    ls = "auto"
    if "--ls" in sys.argv:
        v = sys.argv[sys.argv.index("--ls") + 1]
        ls = v if v == "auto" else float(v)
    seed = (int(sys.argv[sys.argv.index("--seed") + 1])
            if "--seed" in sys.argv else 0)
    n = (int(sys.argv[sys.argv.index("--n") + 1])
         if "--n" in sys.argv else 28)

    import jax
    import jax.numpy as jnp

    from tensornetworks_tpu import get_random_chain_network
    from tensornetworks_tpu.engines import SampledKSDVariationalInference

    bn = get_random_chain_network(n + 1, seed=11)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}

    t0 = time.perf_counter()
    target = bn.likelihood_weighted_marginals(latent, observed,
                                              num_samples=2_000_000, seed=0)
    ess = target.pop("__ess__")
    print(f"LW target marginals: ESS {ess:,.0f} of 2,000,000 "
          f"[{time.perf_counter()-t0:.0f}s]", flush=True)

    engine = SampledKSDVariationalInference(
        bn, latent, list(observed), qbm_ansatz_layers=layers,
        qbm_backend="auto", num_samples=shots, seed=seed,
        base_kernel_length_scale=ls)

    def model_marginals(params):
        rb = n // 2
        R, C = 1 << rb, 1 << (n - rb)

        @jax.jit
        def margins(p):
            P = engine.born_machine.probs(p).reshape(R, C)
            return P.sum(axis=1), P.sum(axis=0)

        r, c = margins(params)
        r = np.asarray(r, dtype=np.float64).reshape((2,) * rb)
        c = np.asarray(c, dtype=np.float64).reshape((2,) * (n - rb))
        out = {}
        for i in range(rb):
            out[latent[i]] = float(
                r.sum(axis=tuple(j for j in range(rb) if j != i))[1])
        for i in range(n - rb):
            out[latent[rb + i]] = float(
                c.sum(axis=tuple(j for j in range(n - rb) if j != i))[1])
        return out

    init_m = model_marginals(engine.params)
    derr0 = [abs(init_m[k] - target[k]) for k in latent]
    print(f"init marginal error: mean {np.mean(derr0):.4f} "
          f"max {np.max(derr0):.4f}", flush=True)

    t0 = time.perf_counter()
    h = engine.train(observed, num_epochs=epochs, lr_born_machine=lr,
                     verbose=False, chunk_epochs=chunk)
    dt = time.perf_counter() - t0
    loss = np.asarray(h["loss_ksd"])
    k = max(1, len(loss) // 20)
    floor = float(np.convolve(loss, np.ones(k) / k, mode="valid").min())

    final_m = model_marginals(engine.params)
    derr = [abs(final_m[k_] - target[k_]) for k_ in latent]
    print(f"RESULT n={n} L={layers} shots={shots} epochs={epochs} ls={ls} "
          f"lr={lr} seed={seed} wall={dt/60:.1f}min "
          f"steady_eps={h.get('epochs_per_sec_steady', float('nan')):.3f} "
          f"ustat {loss[0]:.1f} -> {loss[-1]:.2f} (floor {floor:.2f}) "
          f"skipped={h['num_skipped_updates']}", flush=True)
    print(f"marginal error vs LW target: mean {np.mean(derr):.4f} "
          f"max {np.max(derr):.4f} (init: {np.mean(derr0):.4f}/"
          f"{np.max(derr0):.4f})", flush=True)


if __name__ == "__main__":
    main()
