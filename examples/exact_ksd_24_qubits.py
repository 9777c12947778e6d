"""Exact KSD-VI at 24 qubits on one TPU chip — past the reference's horizon.

The full 2^24-state Stein operator (tile-folded G-corrections, lazy device
tables) trains end to end at ~4.6 epochs/sec; the reference's O(4^n) epoch at
this scale is ~2.8e14 scalar kernel evaluations (``ksd_vi_quantum.py:125-142``
— roughly 700 years at its measured pair rate). The DAG-structured ansatz
keeps the posterior learnable at this width, and per-epoch exact TVD tracking
is still affordable (one extra pass over the 2^24 vector).

Equivalent CLI line:
    tntpu scale --qubits 24 --layers 8 --ansatz bn_structured \
        --epochs 3000 --lr 0.05 --chunk-epochs 100 --track-tvd on

Best measured 24q quality: LR-annealed warm restarts
(``--lr-phases 3000:0.05,1500:0.005,1500:0.001``) reach best TVD 0.1059 in
49 min (single-phase saturates at ~0.125; the direct-fit expressivity bound
is 0.0383 — RESULTS.md).

Run: python examples/exact_ksd_24_qubits.py   (~20 min on a v5e chip,
most of it the one-time chunk-program compile)
"""

from tensornetworks_tpu.runners.scale import run_scale_experiment


def main():
    out = run_scale_experiment(
        num_qubits=24,
        layers=8,
        num_epochs=3000,
        lr=0.05,
        ansatz="bn_structured",
        # The tunneled backend kills >~2-min device programs; 100-epoch
        # chunks run ~25 s each with bit-identical results across the split.
        chunk_epochs=100,
        track_tvd=True,
    )
    hist = out["history"]
    print(f"steady epochs/sec: {hist.get('epochs_per_sec_steady'):.2f}")


if __name__ == "__main__":
    main()
