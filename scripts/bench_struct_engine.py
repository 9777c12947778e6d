"""End-to-end structured-engine throughput at n qubits (TPU).

Usage: python scripts/bench_struct_engine.py [n] [epochs] [chunk] [backend]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    backend = sys.argv[4] if len(sys.argv) > 4 else "auto"

    from tensornetworks_tpu.runners.scale import run_scale_experiment

    out = run_scale_experiment(
        num_qubits=n, layers=8, num_epochs=epochs, lr=0.05,
        objective="ksd", ansatz="bn_structured", backend=backend,
        chunk_epochs=chunk, seed=0)
    h = out["history"]
    print(f"RESULT n={n} backend={out['model'].born_machine.backend} "
          f"eps={h['epochs_per_sec']:.1f} "
          f"steady_eps={h.get('epochs_per_sec_steady', float('nan')):.1f} "
          f"best_tvd={out['model'].best_tvd_:.4f}")


if __name__ == "__main__":
    main()
