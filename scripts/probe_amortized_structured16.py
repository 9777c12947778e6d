"""Amortized structured quantum inference at 16 qubits — ONE conditioned
bn_structured circuit trained against ALL observations of a multi-evidence
network simultaneously (the round-1/2 flagship ideas composed: DAG-matched
ansatz + angle-embedding conditioning + the amortized KSD engine).

Usage: python scripts/probe_amortized_structured16.py [n] [epochs] [chunk] [layers] [--reupload] [--lr X]
"""
import os
import sys
import time
from itertools import product

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 1500
    layers = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    reupload = "--reupload" in sys.argv
    lr = float(sys.argv[sys.argv.index("--lr") + 1]) if "--lr" in sys.argv else 0.05

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
        edges=latent_edges(bn, latent), cond_reupload=reupload)
    eng = AmortizedKSD(bn, latent, observed_names, born_machine=qbm, seed=0)
    print(f"backend={qbm.backend} observations={len(observations)}")

    t0 = time.perf_counter()
    h = eng.train(observations, num_epochs=epochs, lr=lr,
                  gradient_clip_norm=10.0, entropy_weight=0.0,
                  verbose=False, chunk_epochs=chunk)
    dt = time.perf_counter() - t0

    # Per-observation final TVD vs each exact posterior.
    tvds = []
    for obs in observations:
        t = bn.conditional_joint_table(latent, obs)
        post = t / t.sum()
        q = np.asarray(eng.posterior_for(obs))
        tvds.append(0.5 * np.abs(q - post).sum())
    print(f"RESULT n={n} L={layers} reupload={reupload} lr={lr} epochs={epochs} wall={dt:.1f}s "
          f"eps={epochs / dt:.1f} mean_tvd_hist_final={h['mean_tvd'][-1]:.4f}")
    for obs, tv in zip(observations, tvds):
        print(f"  obs={tuple(obs.values())}: final TVD {tv:.4f}")
    print(f"  mean final TVD: {np.mean(tvds):.4f}")


if __name__ == "__main__":
    main()
