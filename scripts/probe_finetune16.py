"""Two-phase KSD fine-tuning probe at 16q: cold run, then restart from the
best snapshot at a lower peak LR (the cosine schedule re-anneals from the new
peak). Tests whether the 0.0267 48k-epoch plateau (RESULTS.md) is an
optimization artifact — the cosine floor lr/10 may keep the iterate orbiting
the basin — or the KSD objective's preferred point for this ansatz.

Usage: python scripts/probe_finetune16.py [n] [epochs1] [epochs2] [lr1] [lr2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    epochs1 = int(sys.argv[2]) if len(sys.argv) > 2 else 48000
    epochs2 = int(sys.argv[3]) if len(sys.argv) > 3 else 24000
    lr1 = float(sys.argv[4]) if len(sys.argv) > 4 else 0.05
    lr2 = float(sys.argv[5]) if len(sys.argv) > 5 else 0.005

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines import QuantumKSDVariationalInference

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)

    eng = QuantumKSDVariationalInference(
        bn, latent, list(observed), qbm_num_latent_vars=n,
        qbm_ansatz_layers=8, qbm_ansatz_type="bn_structured", seed=0)

    t0 = time.perf_counter()
    eng.train(observed, num_epochs=epochs1, lr_born_machine=lr1,
              verbose=False, true_posterior_for_tvd=post, chunk_epochs=1500)
    tvd1 = eng.best_tvd_
    print(f"phase 1 ({epochs1} epochs, lr {lr1}): best TVD {tvd1:.4f} "
          f"[{time.perf_counter()-t0:.0f}s]")

    # Restart from the BEST params (not the final ones) at the reduced peak.
    eng.params = eng.best_params_
    t1 = time.perf_counter()
    eng.train(observed, num_epochs=epochs2, lr_born_machine=lr2,
              verbose=False, true_posterior_for_tvd=post, chunk_epochs=1500)
    tvd2 = eng.best_tvd_
    print(f"phase 2 ({epochs2} epochs, lr {lr2}): best TVD {tvd2:.4f} "
          f"[{time.perf_counter()-t1:.0f}s]")
    print(f"RESULT n={n} phase1 {tvd1:.4f} -> phase2 {tvd2:.4f} "
          f"({'improved' if tvd2 < tvd1 - 1e-4 else 'no gain'})")


if __name__ == "__main__":
    main()
