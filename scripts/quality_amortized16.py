"""Amortized quality campaign (VERDICT r3 item 1): one conditioned
bn_structured + reupload circuit against ALL observations of a 2-evidence
network, trained at the SHARP per-n kernel bandwidth with LR-annealed warm
restarts (both round-3 levers, which were never applied to the amortized
loss), on the round-4 engine (gcorr operator, best-snapshot restore,
eval-forward reuse).

Also reports the amortized expressivity bound via a conditioned direct fit
(``--bound``): separates "the conditioned ansatz can't represent 4
posteriors at once" from "the amortized KSD objective doesn't find them".

Usage: python scripts/quality_amortized16.py [n] [layers]
           [--ls X|auto] [--phases epochs:lr,...] [--chunk N] [--bound]
           [--lr X] [--seed K] [--learned-embedding] [--per-layer-scales]
"""
import os
import sys
import time
from itertools import product

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(argv[0]) if len(argv) > 0 else 16
    layers = int(argv[1]) if len(argv) > 1 else 8
    ls = "auto"
    if "--ls" in sys.argv:
        v = sys.argv[sys.argv.index("--ls") + 1]
        ls = v if v == "auto" else float(v)
    spec = (sys.argv[sys.argv.index("--phases") + 1] if "--phases" in sys.argv
            else "24000:0.05,12000:0.005,12000:0.001")
    chunk = (int(sys.argv[sys.argv.index("--chunk") + 1])
             if "--chunk" in sys.argv else 3000)
    seed = (int(sys.argv[sys.argv.index("--seed") + 1])
            if "--seed" in sys.argv else 0)

    from tensornetworks_tpu import get_random_chain_network
    from tensornetworks_tpu.engines.amortized import AmortizedKSD
    from tensornetworks_tpu.models import QuantumBornMachine
    from tensornetworks_tpu.ops.hamming import resolve_length_scale
    from tensornetworks_tpu.sim.structured import latent_edges

    bn = get_random_chain_network(n + 2, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed_names = [f"V{n}", f"V{n+1}"]
    observations = [dict(zip(observed_names, bits))
                    for bits in product((0, 1), repeat=len(observed_names))]
    targets = np.stack([bn.posterior_vector(latent, o) for o in observations])
    X = np.asarray([[o[k] for k in observed_names] for o in observations],
                   dtype=np.float64)

    def phases_list():
        out = []
        for part in spec.split(","):
            f = part.split(":")
            if len(f) == 3:
                out.append((int(f[0]), float(f[1]),
                            f[2] if f[2] == "auto" else float(f[2])))
            else:
                out.append((int(f[0]), float(f[1])))
        return out

    learned = "--learned-embedding" in sys.argv
    per_layer = "--per-layer-scales" in sys.argv
    qbm = QuantumBornMachine(
        n, ansatz_layers=layers, ansatz_type="bn_structured",
        conditioning_dim=len(observed_names),
        edges=latent_edges(bn, latent), cond_reupload=True,
        cond_learned_embedding=learned, cond_embed_per_layer=per_layer)

    if "--bound" in sys.argv:
        from tensornetworks_tpu.engines import fit_conditioned_born_machine

        t0 = time.perf_counter()
        best, h = fit_conditioned_born_machine(
            qbm, targets, X, num_epochs=2000, lr=0.05, seed=seed,
            chunk_epochs=min(chunk, 2000))
        print(f"BOUND n={n} L={layers} learned={learned} "
              f"per_layer={per_layer} conditioned direct "
              f"fit: best mean TVD {h['best_mean_tvd']:.4f} "
              f"[{time.perf_counter()-t0:.0f}s]", flush=True)
        return

    eng = AmortizedKSD(bn, latent, observed_names, born_machine=qbm,
                       seed=seed, base_kernel_length_scale=ls)
    print(f"n={n} L={layers} ls={eng.length_scale:.4g} backend={qbm.backend} "
          f"obs={len(observations)} phases={spec}", flush=True)
    t0 = time.perf_counter()
    h = eng.train(observations, gradient_clip_norm=10.0, entropy_weight=0.0,
                  verbose=True, seed=seed, chunk_epochs=chunk,
                  lr_phases=phases_list())
    dt = time.perf_counter() - t0

    tvds = []
    for obs in observations:
        post = bn.posterior_vector(latent, obs)
        q = np.asarray(eng.posterior_for(obs))
        tvds.append(0.5 * np.abs(q - post).sum())
    print(f"RESULT n={n} L={layers} ls={eng.length_scale:.4g} phases={spec} "
          f"learned={learned} per_layer={per_layer} wall={dt/60:.1f}min "
          f"steady_eps={h.get('epochs_per_sec_steady', float('nan')):.1f} "
          f"best_mean_tvd={eng.best_mean_tvd_:.4f}", flush=True)
    for obs, tv in zip(observations, tvds):
        print(f"  obs={tuple(obs.values())}: TVD {tv:.4f}", flush=True)
    print(f"  mean per-obs TVD at restored best: {np.mean(tvds):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
