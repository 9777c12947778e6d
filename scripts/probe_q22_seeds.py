"""22q optimization-gap attack (VERDICT r3 item 4): the one size where the
KSD-trained quality (0.0435) sits above its direct-fit expressivity bound
(0.0295). Fixed problem (bn seed 0); vary the INIT seed (the CLI's --seed
changes the network too) and optionally anneal the kernel bandwidth across
the LR phases.

Usage: python scripts/probe_q22_seeds.py [seed ...]
           [--phases epochs:lr[:ls],...] [--n N] [--layers L]
Default phases: 3000:0.05,1500:0.005,1500:0.001 at ls=2/n.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_phases(spec, n):
    out = []
    for part in spec.split(","):
        f = part.split(":")
        ls = None
        if len(f) == 3:
            ls = 2.0 / n if f[2] == "auto" else float(f[2])
        out.append((int(f[0]), float(f[1]), ls))
    return out


def main():
    args = sys.argv[1:]
    n = int(args[args.index("--n") + 1]) if "--n" in args else 22
    layers = int(args[args.index("--layers") + 1]) if "--layers" in args else 8
    spec = (args[args.index("--phases") + 1] if "--phases" in args
            else "3000:0.05,1500:0.005,1500:0.001")
    seeds = [int(a) for a in args if not a.startswith("--")
             and args[max(0, args.index(a) - 1)] not in ("--n", "--layers",
                                                         "--phases")]
    seeds = seeds or [1, 2]
    phases = parse_phases(spec, n)

    from tensornetworks_tpu import get_random_chain_network
    from tensornetworks_tpu.engines import QuantumKSDVariationalInference

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)

    for seed in seeds:
        eng = QuantumKSDVariationalInference(
            bn, latent, list(observed), qbm_num_latent_vars=n,
            qbm_ansatz_layers=layers, qbm_ansatz_type="bn_structured",
            seed=seed, base_kernel_length_scale=2.0 / n)
        best = np.inf
        t0 = time.perf_counter()
        for p_epochs, p_lr, p_ls in phases:
            if p_ls is not None:
                eng.base_kernel_length_scale = p_ls
            eng.train(observed, num_epochs=p_epochs, lr_born_machine=p_lr,
                      verbose=False, true_posterior_for_tvd=post,
                      chunk_epochs=500, seed=seed)
            best = min(best, eng.best_tvd_)
            print(f"  seed {seed} phase ({p_epochs}@{p_lr}"
                  f"{'' if p_ls is None else f',ls={p_ls:.4g}'}): "
                  f"best {eng.best_tvd_:.4f}", flush=True)
        print(f"seed {seed}: best TVD {best:.4f} "
              f"[{time.perf_counter()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
