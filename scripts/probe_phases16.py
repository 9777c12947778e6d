"""Multi-phase LR-annealed restarts at 16q: each phase restarts the cosine
schedule from the best snapshot at a lower peak LR (warm-restart schedule).
Phase 1 alone plateaus at 0.0267 (48k epochs); phase 2 at lr/10 reached
0.0215 (probe_finetune16). This probe extends to a third phase and a
marginals warm-started variant.

Usage: python scripts/probe_phases16.py [n] [seed] [with_warm]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_phases(eng, observed, post, phases, chunk=1500, label=""):
    t0 = time.perf_counter()
    bests = []
    for epochs, lr in phases:
        eng.train(observed, num_epochs=epochs, lr_born_machine=lr,
                  verbose=False, true_posterior_for_tvd=post,
                  chunk_epochs=chunk)
        bests.append(eng.best_tvd_)
        print(f"  {label} phase ({epochs} @ lr {lr}): best TVD "
              f"{eng.best_tvd_:.4f} [{time.perf_counter()-t0:.0f}s cum]")
    return bests


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    with_warm = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines import (
        QuantumKSDVariationalInference, fit_born_machine, marginals_product)

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)

    def make_engine():
        return QuantumKSDVariationalInference(
            bn, latent, list(observed), qbm_num_latent_vars=n,
            qbm_ansatz_layers=8, qbm_ansatz_type="bn_structured", seed=seed)

    # A) 3-phase annealed restarts, cold start.
    eng = make_engine()
    cold = run_phases(eng, observed, post,
                      [(48000, 0.05), (24000, 0.005), (24000, 0.001)],
                      label="cold")

    # B) marginals warm start, then the same 3 phases (measured NEGATIVE for
    # bn_structured at 16q — kept selectable for other ansatz families).
    if not with_warm:
        print(f"RESULT n={n} seed={seed} cold={['%.4f' % b for b in cold]}")
        return
    eng2 = make_engine()
    warm, wh = fit_born_machine(eng2.born_machine, marginals_product(post, n),
                                num_epochs=2000, lr=0.05, chunk_epochs=1500,
                                seed=seed)
    print(f"  warm surrogate fit TVD {wh['best_tvd']:.4f}")
    eng2.params = warm
    warm_b = run_phases(eng2, observed, post,
                        [(48000, 0.05), (24000, 0.005), (24000, 0.001)],
                        label="warm")

    print(f"RESULT n={n} seed={seed} cold={['%.4f' % b for b in cold]} "
          f"warm={['%.4f' % b for b in warm_b]}")


if __name__ == "__main__":
    main()
