"""20-qubit cold-start quality run: DAG-structured ansatz + optional
tempered annealing, chunked + resumable on the tunneled TPU.

Usage:
  python scripts/quality20.py [--layers 8] [--epochs 6000] [--lr 0.05]
      [--chunk 500] [--betas 0.25,0.5,0.75,1.0] [--seed 0] [--n 20]
      [--ansatz bn_structured] [--state /tmp/q20.npz] [--backend auto]

The previous round's best at 20q was TVD 0.158 (1200 epochs, still
improving). Target: < 0.1 (VERDICT item 8).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=6000)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--betas", type=str, default="")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--ansatz", type=str, default="bn_structured")
    ap.add_argument("--backend", type=str, default="auto")
    ap.add_argument("--state", type=str, default="")
    args = ap.parse_args()

    import jax

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines import QuantumKSDVariationalInference

    n = args.n
    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    posterior = bn.posterior_vector(latent, observed)
    tvd_u = 0.5 * np.abs(np.asarray(posterior) - 1.0 / (1 << n)).sum()
    print(f"n={n} L={args.layers} ansatz={args.ansatz} lr={args.lr} "
          f"epochs={args.epochs} betas={args.betas or '-'} seed={args.seed} "
          f"TVD(uniform,post)={tvd_u:.3f} dev={jax.devices()}", flush=True)

    model = QuantumKSDVariationalInference(
        bn, latent, list(observed), qbm_num_latent_vars=n,
        qbm_ansatz_layers=args.layers, qbm_ansatz_type=args.ansatz,
        qbm_backend=args.backend, seed=args.seed)
    betas = ([float(b) for b in args.betas.split(",")] if args.betas else None)
    t0 = time.time()
    hist = model.train(
        observed, num_epochs=args.epochs, lr_born_machine=args.lr,
        true_posterior_for_tvd=posterior, verbose=True,
        chunk_epochs=args.chunk, temper_betas=betas,
        resume_state_path=args.state or None, seed=args.seed)
    tvd = np.asarray(hist["tvd"])
    loss = np.asarray(hist["loss_ksd"])
    print(f"wall {time.time()-t0:.0f}s  eps {hist['epochs_per_sec']:.1f}")
    print(f"loss {loss[0]:.3f} -> {loss[-1]:.4f}")
    k = max(1, len(tvd) // 12)
    print("tvd trajectory:", " ".join(f"{v:.3f}" for v in tvd[::k]))
    print(f"BEST TVD {model.best_tvd_:.4f} at epoch {model.best_epoch_}")


if __name__ == "__main__":
    main()
