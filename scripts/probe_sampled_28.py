"""Sampled-KSD training at n >= 27 on one chip — past the exact-probs wall.

At this scale no exact 2^n auxiliary object is feasible on the host or the
device besides the statevector itself (2^28 c64 = 2 GB): the flat inverse-CDF
cumsum alone would be 1 GB, the exact posterior/score tables far more. The
engine's two-stage measurement sampling (sim.sampling.sample_indices_2d) and
CPT-factored scores keep everything else at O(M) / O(2^{n/2}); per-layer
remat bounds the adjoint's live buffers.

Usage: python scripts/probe_sampled_28.py [n] [epochs] [chunk] [shots] [layers] [length_scale|auto]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    shots = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
    layers = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    ls = (sys.argv[6] if len(sys.argv) > 6 else 1.0)
    if ls != "auto":
        ls = float(ls)

    from tensornetworks_tpu import get_random_chain_network
    from tensornetworks_tpu.engines import SampledKSDVariationalInference

    bn = get_random_chain_network(n + 1, seed=11)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}

    engine = SampledKSDVariationalInference(
        bn, latent, list(observed), qbm_ansatz_layers=layers,
        qbm_backend="auto", num_samples=shots, seed=0,
        base_kernel_length_scale=ls)
    t0 = time.perf_counter()
    h = engine.train(observed, num_epochs=epochs, lr_born_machine=0.05,
                     verbose=False, chunk_epochs=chunk)
    dt = time.perf_counter() - t0
    loss = np.asarray(h["loss_ksd"])
    print(f"RESULT n={n} L={layers} shots={shots} epochs={epochs} ls={ls} "
          f"eps={h['epochs_per_sec']:.2f} "
          f"steady_eps={h.get('epochs_per_sec_steady', float('nan')):.2f} "
          f"wall={dt:.1f}s "
          f"ustat: {loss[0]:.2f} -> {loss[-1]:.3f} "
          f"(min {loss.min():.3f}) skipped={h['num_skipped_updates']}")


if __name__ == "__main__":
    main()
