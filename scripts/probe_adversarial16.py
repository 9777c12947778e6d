"""Adversarial-objective optimization campaign at scale (VERDICT r4 item 4).

The round-4 result (16q bn_structured, batch 256, k_D=3, single 3000-epoch
phase: best TVD 0.1292) got none of the optimization science the KSD path
did. This probe sweeps the three REINFORCE levers the KSD experience says
matter — sample batch (the gradient-noise lever, cf. the sampled-KSD shot
series), LR-annealed warm restarts (`lr_phases`), and discriminator
steps/LR — one configuration per invocation so runs can be queued on the
serialized TPU tunnel.

Usage: python scripts/probe_adversarial16.py [n] [--layers L] [--batch B]
           [--kd K] [--lrd-mult M] [--phases epochs:lr,...] [--seed S]
           [--chunk N] [--track on|off|auto]

Reference being exceeded: adversarial_vi.py trains n=3 only (its exact
log p(x|z) table is enumerated, and its ±inf edge convention freezes
REINFORCE from n=16 — see engines/advi.py log_p_floor).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=16)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--kd", type=int, default=3)
    ap.add_argument("--lrd-mult", type=float, default=10.0)
    ap.add_argument("--phases", default="3000:0.005")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--track", default="auto", choices=["auto", "on", "off"])
    args = ap.parse_args()

    from tensornetworks_tpu.runners.scale import run_scale_experiment

    phases = []
    for part in args.phases.split(","):
        e, lr = part.split(":")[:2]
        phases.append((int(e), float(lr)))

    t0 = time.perf_counter()
    out = run_scale_experiment(
        num_qubits=args.n, layers=args.layers, objective="adversarial",
        ansatz="bn_structured", seed=args.seed, verbose=True,
        chunk_epochs=args.chunk, lr_phases=phases,
        adv_batch_size=args.batch, adv_k_classifier=args.kd,
        adv_lr_classifier_mult=args.lrd_mult,
        track_tvd={"auto": None, "on": True, "off": False}[args.track])
    dt = time.perf_counter() - t0
    model = out["model"]
    best = getattr(model, "best_tvd_", float("nan"))
    h = out["history"]
    print(f"RESULT adv n={args.n} L={args.layers} batch={args.batch} "
          f"kd={args.kd} lrd_mult={args.lrd_mult} phases={args.phases} "
          f"seed={args.seed} wall={dt/60:.1f}min "
          f"steady_eps={h.get('epochs_per_sec_steady', h.get('epochs_per_sec', float('nan'))):.1f} "
          f"best_tvd={best:.4f}", flush=True)


if __name__ == "__main__":
    main()
