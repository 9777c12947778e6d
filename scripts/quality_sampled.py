"""Sampled-KSD quality rows (VERDICT r3 item 3): train the sampled
U-statistic engine to convergence and report the FINAL EXACT TVD — the
end-to-end estimator validation the unit tests can't give. The exact engine's
quality at matched wall is the comparison row (RESULTS.md).

Usage: python scripts/quality_sampled.py [n] [--shots M] [--layers L]
           [--phases epochs:lr,...] [--chunk N] [--ls X|auto]
           [--ansatz bn_structured] [--seed K]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def opt(flag, default, cast=str):
    return (cast(sys.argv[sys.argv.index(flag) + 1])
            if flag in sys.argv else default)


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(argv[0]) if argv else 16
    shots = opt("--shots", 1024, int)
    layers = opt("--layers", 8, int)
    spec = opt("--phases", "6000:0.05,3000:0.005,3000:0.001")
    chunk = opt("--chunk", 1500, int)
    ls = opt("--ls", "auto")
    if ls != "auto":
        ls = float(ls)
    ansatz = opt("--ansatz", "bn_structured")
    seed = opt("--seed", 0, int)

    from tensornetworks_tpu import get_random_chain_network
    from tensornetworks_tpu.engines import SampledKSDVariationalInference

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)

    eng = SampledKSDVariationalInference(
        bn, latent, list(observed), qbm_ansatz_layers=layers,
        qbm_ansatz_type=ansatz, num_samples=shots, seed=seed,
        base_kernel_length_scale=ls)
    print(f"n={n} {ansatz} L={layers} shots={shots} "
          f"ls={eng.length_scale:.4g} phases={spec}", flush=True)

    phases = [tuple(p.split(":")) for p in spec.split(",")]
    best = np.inf
    t0 = time.perf_counter()
    steady = None
    for p_epochs, p_lr in phases:
        h = eng.train(observed, num_epochs=int(p_epochs),
                      lr_born_machine=float(p_lr), verbose=False,
                      true_posterior_for_tvd=post, chunk_epochs=chunk,
                      seed=seed)
        best = min(best, eng.best_tvd_)
        if steady is None:
            steady = h.get("epochs_per_sec_steady", h["epochs_per_sec"])
        print(f"  phase ({p_epochs}@{p_lr}): best exact TVD "
              f"{eng.best_tvd_:.4f}", flush=True)
    dt = time.perf_counter() - t0
    print(f"RESULT n={n} {ansatz} L={layers} shots={shots} "
          f"ls={eng.length_scale:.4g} phases={spec} wall={dt/60:.1f}min "
          f"steady_eps={steady:.2f} best_exact_tvd={best:.4f}", flush=True)


if __name__ == "__main__":
    main()
