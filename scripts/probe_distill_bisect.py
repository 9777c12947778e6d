"""Bisect the distill-at-large-n worker crash: run a short chunked
fit_born_machine at increasing n and report where it dies. The exact KSD
ENGINE at n=24 runs fine on this backend; the distill program crashed the
worker twice (chunk 400 and 150), so the failure is program-specific —
this isolates the breaking width.

Usage: python scripts/probe_distill_bisect.py [n1,n2,...] [epochs] [chunk]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ns = ([int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1
          else [20, 22])
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines import fit_born_machine
    from tensornetworks_tpu.models import QuantumBornMachine
    from tensornetworks_tpu.sim.structured import latent_edges

    for n in ns:
        bn = get_random_chain_network(n + 1, seed=0)
        latent = [f"V{i}" for i in range(n)]
        post = bn.posterior_vector(latent, {f"V{n}": 1})
        bm = QuantumBornMachine(num_latent_vars=n, ansatz_layers=8,
                                ansatz_type="bn_structured",
                                init_method="small_random",
                                edges=latent_edges(bn, latent))
        t0 = time.perf_counter()
        _, hist = fit_born_machine(bm, post, num_epochs=epochs, lr=0.05,
                                   chunk_epochs=chunk, seed=0)
        print(f"n={n}: OK best TVD {hist['best_tvd']:.4f} "
              f"[{time.perf_counter()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
