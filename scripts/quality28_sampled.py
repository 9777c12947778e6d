"""Large-n (default n=28) sampled-KSD long run with a quality surrogate.

Past the exact-enumeration wall no 2^n posterior exists to TVD against, so
quality is reported as the per-variable posterior-marginal error:

- target marginals P(z_i=1 | x): likelihood weighting on the BN (host-side
  vectorized ancestral sampling, consistent, ESS-reported —
  ``core.bayes_net.likelihood_weighted_marginals``);
- model marginals: EXACT bit marginals of |psi|^2, computed from two axis
  reductions of the (2^ceil(n/2), 2^floor(n/2)) probs view (no shots noise,
  no 2^n auxiliary buffer beyond the probs the loss already materializes).

Reports mean/max |Δp| over the n latent bits plus the U-stat floor.

Usage: python scripts/quality28_sampled.py [epochs] [chunk] [shots] [layers]
           [lr] [--ls X|auto] [--seed K] [--n N]

``--n`` sets the problem size (default 28 — the program-diet target size;
no in-scan TVD eval exists at these sizes, so the training program is the
loss forward + REINFORCE backward only).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("epochs", nargs="?", type=int, default=1200)
    ap.add_argument("chunk", nargs="?", type=int, default=15)
    ap.add_argument("shots", nargs="?", type=int, default=1024)
    ap.add_argument("layers", nargs="?", type=int, default=4)
    ap.add_argument("lr", nargs="?", type=float, default=0.05)
    ap.add_argument("--ls", default="auto",
                    help="Hamming kernel length scale (float or 'auto')")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n", type=int, default=28)
    args = ap.parse_args()
    epochs, chunk, shots = args.epochs, args.chunk, args.shots
    layers, lr, seed, n = args.layers, args.lr, args.seed, args.n
    ls = args.ls if args.ls == "auto" else float(args.ls)

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
