"""LR-annealed warm restarts: reference-best posterior quality at 16 qubits.

Single-phase KSD training of the DAG-structured ansatz plateaus at best TVD
0.0267 (48k epochs) — an optimization artifact, not the objective's floor:
restarting the cosine schedule from the best snapshot at a lower peak LR
walks further into the basin. Measured on one TPU v5e chip (RESULTS.md):

    48000 @ lr 0.05   -> 0.0267
    +24000 @ lr 0.005 -> 0.0215
    +24000 @ lr 0.001 -> 0.0201   (~3 min total)

0.0201 is the reference implementation's own best measured quality class
(0.0193, BASELINE.md "Measured reference runs") — achieved there on a
2^3-state problem; here on 2^16 states. The same schedule at 20 qubits:
0.0542 -> 0.0435. Combined with the sharp Hamming-kernel bandwidth
(--length-scale auto; RESULTS.md bandwidth sweeps) the same three phases
reach 0.0061 at 16q and 0.0217 at 20q (l=0.1).

Equivalent CLI line:
    tntpu scale --qubits 16 --ansatz bn_structured --layers 8 \
        --chunk-epochs 1500 --lr-phases 48000:0.05,24000:0.005,24000:0.001

Run: python examples/annealed_restarts_16_qubits.py   (~4 min on a v5e chip)
"""

from tensornetworks_tpu.runners.scale import run_scale_experiment


def main():
    out = run_scale_experiment(
        num_qubits=16,
        layers=8,
        ansatz="bn_structured",
        lr_phases=[(48000, 0.05), (24000, 0.005), (24000, 0.001)],
        chunk_epochs=1500,
        num_epochs=0, lr=0.0,  # overridden by lr_phases
    )
    print(f"across-phase best TVD: {out['model'].best_tvd_:.4f}")


if __name__ == "__main__":
    main()
