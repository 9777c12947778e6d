"""Expressivity attribution at 24 qubits: direct distillation fit.

The 24q structured (L=8) KSD quality runs saturate at best TVD ~0.125-0.14
by ~3000 epochs (RESULTS.md). This probe separates "the ansatz cannot
represent the posterior" from "the KSD objective does not prefer it" by
fitting the SAME circuit directly to the exact posterior with a TVD loss —
the diagnostic that attributed the 16q plateau in round 1 (RESULTS.md,
"Objective quality at scale").

Runs chunked (the tunneled backend kills >~2-min device programs).

Usage: python scripts/probe_distill24.py [n] [layers] [epochs] [chunk] [lr] [remat]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3000
    # Even at 150 epochs/chunk the pre-eval-reuse distill epoch blew the
    # tunnel's ~2-min program kill at n=24 (two worker crashes); with the
    # engines' eval-forward-reuse convention (one circuit pass/epoch) and
    # chunk 75 each chunk stays well under the bound.
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 75
    lr = float(sys.argv[5]) if len(sys.argv) > 5 else 0.05
    # Distill runs TWO forwards + a backward per epoch (the engines reuse
    # the loss forward); at n=24 the un-remat backward crashed the worker
    # where n<=22 ran fine — per-layer remat trades FLOPs for live set.
    remat = bool(int(sys.argv[6])) if len(sys.argv) > 6 else (n >= 24)

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines import fit_born_machine
    from tensornetworks_tpu.models import QuantumBornMachine
    from tensornetworks_tpu.sim.structured import latent_edges

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    post = bn.posterior_vector(latent, {f"V{n}": 1})
    print(f"n={n} L={layers} epochs={epochs} chunk={chunk} lr={lr}")

    bm = QuantumBornMachine(num_latent_vars=n, ansatz_layers=layers,
                            ansatz_type="bn_structured",
                            init_method="small_random",
                            edges=latent_edges(bn, latent),
                            remat_layers=remat)
    t0 = time.perf_counter()
    params, hist = fit_born_machine(bm, post, num_epochs=epochs, lr=lr,
                                    chunk_epochs=chunk, seed=0)
    wall = time.perf_counter() - t0
    tvds = np.asarray(hist["tvd"])
    print(f"direct-fit best TVD {hist['best_tvd']:.4f} at epoch "
          f"{hist['best_epoch']} ({wall:.0f}s wall, "
          f"{epochs / wall:.1f} eps incl. compile)")
    for e in range(0, epochs, max(1, epochs // 10)):
        print(f"  epoch {e}: tvd {tvds[e]:.4f}")
    print(f"  final tvd {tvds[-1]:.4f}")


if __name__ == "__main__":
    main()
