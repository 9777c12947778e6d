"""LR-annealed warm restarts for AMORTIZED structured inference at 16q.

The amortized engine keeps its params across train() calls, so phases chain
naturally (since round 4 the engine restores the across-run best-mean-TVD
snapshot, so each phase restarts from the best state; prefer the engine's
built-in ``lr_phases`` — scripts/quality_amortized16.py — over this probe). Baseline: 0.166 mean per-observation
TVD at 24000 single-phase epochs (RESULTS.md).

Usage: python scripts/probe_amortized_phases16.py [n] [layers] [length_scale|auto]
"""
import os
import sys
import time
from itertools import product

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PHASES = [(24000, 0.05), (12000, 0.005), (12000, 0.001)]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ls = (sys.argv[3] if len(sys.argv) > 3 else 1.0)
    if ls != "auto":
        ls = float(ls)

    from tensornetworks_tpu import get_random_chain_network
    from tensornetworks_tpu.engines.amortized import AmortizedKSD
    from tensornetworks_tpu.models import QuantumBornMachine
    from tensornetworks_tpu.sim.structured import latent_edges

    bn = get_random_chain_network(n + 2, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed_names = [f"V{n}", f"V{n+1}"]
    observations = [dict(zip(observed_names, bits))
                    for bits in product((0, 1), repeat=len(observed_names))]

    qbm = QuantumBornMachine(
        n, ansatz_layers=layers, ansatz_type="bn_structured",
        conditioning_dim=len(observed_names),
        edges=latent_edges(bn, latent), cond_reupload=True)
    eng = AmortizedKSD(bn, latent, observed_names, born_machine=qbm, seed=0,
                       base_kernel_length_scale=ls)

    def mean_tvd():
        tvds = []
        for obs in observations:
            t = bn.conditional_joint_table(latent, obs)
            post = t / t.sum()
            q = np.asarray(eng.posterior_for(obs))
            tvds.append(0.5 * np.abs(q - post).sum())
        return float(np.mean(tvds)), tvds

    t0 = time.perf_counter()
    for epochs, lr in PHASES:
        eng.train(observations, num_epochs=epochs, lr=lr,
                  gradient_clip_norm=10.0, entropy_weight=0.0,
                  verbose=False, chunk_epochs=1500)
        m, _ = mean_tvd()
        print(f"phase ({epochs} @ {lr}): mean per-obs TVD {m:.4f} "
              f"[{time.perf_counter()-t0:.0f}s cum]", flush=True)
    m, tvds = mean_tvd()
    print(f"RESULT n={n} L={layers} annealed amortized mean TVD {m:.4f} "
          f"per-obs {['%.4f' % t for t in tvds]}")


if __name__ == "__main__":
    main()
