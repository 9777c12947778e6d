"""Sampled-KSD quality rows (VERDICT r3 item 3): train the sampled
U-statistic engine to convergence and report the FINAL EXACT TVD — the
end-to-end estimator validation the unit tests can't give. The exact engine's
quality at matched wall is the comparison row (RESULTS.md).

Usage: python scripts/quality_sampled.py [n] [--shots M] [--layers L]
           [--phases epochs:lr[:ls],...] [--chunk N] [--ls X|auto]
           [--ansatz bn_structured] [--seed K] [--baseline loo|cv]
           [--no-eval-reuse] [--verbose]

The per-epoch exact-TVD eval reuses the loss forward by default (halves
statevector forwards per epoch; pass --no-eval-reuse for the two-forward
round-4 timing semantics).

Each phase restarts the cosine schedule from the previous phase's best
snapshot; an optional third component sets that phase's kernel length scale
(bandwidth annealing). The shot-noise PRNG is re-seeded per phase so
restarts draw fresh measurement noise.
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
    baseline = opt("--baseline", "loo")
    eval_reuse = "--no-eval-reuse" not in sys.argv

    from tensornetworks_tpu import get_random_chain_network
    from tensornetworks_tpu.engines import SampledKSDVariationalInference
    from tensornetworks_tpu.ops.hamming import resolve_length_scale

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)

    eng = SampledKSDVariationalInference(
        bn, latent, list(observed), qbm_ansatz_layers=layers,
        qbm_ansatz_type=ansatz, num_samples=shots, seed=seed,
        base_kernel_length_scale=ls, grad_baseline=baseline)
    print(f"n={n} {ansatz} L={layers} shots={shots} "
          f"ls={eng.length_scale:.4g} phases={spec} baseline={baseline}",
          flush=True)

    phases = [tuple(p.split(":")) for p in spec.split(",")]
    best = np.inf
    t0 = time.perf_counter()
    steady = None
    for pi, phase in enumerate(phases):
        p_epochs, p_lr = phase[0], phase[1]
        if len(phase) == 3:  # bandwidth annealing: per-phase length scale
            eng.length_scale = resolve_length_scale(
                phase[2] if phase[2] == "auto" else float(phase[2]), n)
        h = eng.train(observed, num_epochs=int(p_epochs),
                      lr_born_machine=float(p_lr),
                      verbose="--verbose" in sys.argv,
                      true_posterior_for_tvd=post, chunk_epochs=chunk,
                      reuse_loss_forward_for_eval=eval_reuse,
                      seed=seed + 7919 * pi)  # fresh shot noise per phase
        best = min(best, eng.best_tvd_)
        if steady is None:
            steady = h.get("epochs_per_sec_steady", h["epochs_per_sec"])
        print(f"  phase ({p_epochs}@{p_lr}"
              f"{':' + str(eng.length_scale) if len(phase) == 3 else ''}): "
              f"best exact TVD {eng.best_tvd_:.4f}", flush=True)
    dt = time.perf_counter() - t0
    print(f"RESULT n={n} {ansatz} L={layers} shots={shots} "
          f"ls={eng.length_scale:.4g} phases={spec} wall={dt/60:.1f}min "
          f"steady_eps={steady:.2f} best_exact_tvd={best:.4f}", flush=True)


if __name__ == "__main__":
    main()
