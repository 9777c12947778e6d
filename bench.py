"""Benchmark: 16-qubit quantum KSD-VI training throughput (epochs/sec).

The BASELINE.json north-star metric: quantum KSD-VI at 16 qubits on one TPU
chip, ≥100x faster per epoch than the reference (PennyLane/PyTorch) at
matched final TVD. The reference publishes no numbers (BASELINE.md), so the
baseline is *measured here*: a faithful cost probe of the reference's
per-pair Stein-kernel evaluation (scalar torch ops with bit-flip loops,
``stein_utils.py:138-197``) is timed on this host and multiplied by the
4^16 pair count of its per-epoch Gram loop (``ksd_vi.py:114-131``). The
parameter-shift backward cost (2·3·L·n extra statevector sims/epoch) is
ignored — conservative in the reference's favor.

The probe is validated against a real measured reference run at n=3
(BASELINE.md "Measured reference runs"): probe-predicted Gram cost 24.8 ms
vs 62.5 ms measured full epoch, i.e. the extrapolated baseline UNDERSTATES
the reference's true epoch cost by ~2.5x and ``vs_baseline`` is a floor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


N_QUBITS = 16
LAYERS = 4
TIMED_EPOCHS = 200


def measure_reference_pair_seconds(num_vars: int, n_pairs: int = 300) -> float:
    """Time the reference's per-pair Stein kernel cost pattern with torch.

    This mirrors the *computational shape* of ``get_stein_kernel_kp_value``
    (reference ``stein_utils.py:138-197``): per pair, ~(5n+1) base-kernel
    evaluations, each building fresh scalar float64 tensors, plus the
    bit-flip tuple churn. It is a cost model, not a port.
    """
    import torch

    n = num_vars

    def flip(t, i):
        l = list(t)
        l[i] = 1 - l[i]
        return tuple(l)

    def base_kernel(z1, z2):
        d = torch.sum(torch.abs(z1 - z2))
        return torch.exp(-d / float(n))

    rng = np.random.default_rng(0)
    zs = [tuple(int(b) for b in rng.integers(0, 2, n)) for _ in range(64)]
    sps = [torch.tensor(rng.normal(size=n), dtype=torch.float64) for _ in range(64)]

    t0 = time.perf_counter()
    for p in range(n_pairs):
        z1_t, z2_t = zs[p % 64], zs[(p * 7 + 3) % 64]
        sp1, sp2 = sps[p % 64], sps[(p * 7 + 3) % 64]
        z1 = torch.tensor(z1_t, dtype=torch.float64)
        z2 = torch.tensor(z2_t, dtype=torch.float64)
        k12 = base_kernel(z1, z2)
        term1 = torch.dot(sp1, sp2) * k12
        d2 = torch.zeros(n, dtype=torch.float64)
        for j in range(n):
            d2[j] = k12 - base_kernel(z1, torch.tensor(flip(z2_t, j), dtype=torch.float64))
        term2 = -torch.dot(sp1, d2)
        d1 = torch.zeros(n, dtype=torch.float64)
        for i in range(n):
            d1[i] = k12 - base_kernel(torch.tensor(flip(z1_t, i), dtype=torch.float64), z2)
        term3 = -torch.dot(d1, sp2)
        tr = torch.tensor(0.0, dtype=torch.float64)
        for i in range(n):
            z1n = torch.tensor(flip(z1_t, i), dtype=torch.float64)
            z2n = torch.tensor(flip(z2_t, i), dtype=torch.float64)
            tr = tr + (k12 - base_kernel(z1, z2n) - base_kernel(z1n, z2)
                       + base_kernel(z1n, z2n))
        _ = term1 + term2 + term3 + tr
    return (time.perf_counter() - t0) / n_pairs


def measure_quality_path():
    """Quality-matched driver metric: the bn_structured 16q configuration —
    the ansatz that actually reaches reference-beating posterior quality
    (RESULTS.md: HE converges to TVD ~0.8 at 16q; bn_structured to ~0.04) —
    trained END TO END through the production engine body (per-epoch exact
    TVD eval, best-snapshotting, guarded updates, chunked dispatch).

    Returns steady-state engine epochs/sec (post-compile chunks) and the
    best TVD actually reached, so "faster at matched final TVD"
    (BASELINE.json north_star) is demonstrated by this one artifact.

    Round 3: the configuration is the LR-annealed warm-restart schedule
    (48k @ 0.05 → 24k @ 0.005 → 24k @ 0.001, each phase restarting the
    cosine schedule from the previous best snapshot) at the sharp Hamming
    bandwidth ℓ=0.0625 (n·ℓ ≈ 1, one kernel e-fold per bit — the large-n
    optimum; the reference's ℓ=1 was tuned at n=3). Measured best TVD
    0.0061 (RESULTS.md) — 3.2× below the reference's own best measured
    quality (0.0193 at n=3, BASELINE.md) at 2^16 states.
    """
    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines.ksd import QuantumKSDVariationalInference

    n = N_QUBITS
    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)
    eng = QuantumKSDVariationalInference(
        bn, latent, list(observed), qbm_num_latent_vars=n,
        qbm_ansatz_layers=8, qbm_ansatz_type="bn_structured", seed=0,
        base_kernel_length_scale=0.0625)
    phases = [(48000, 0.05), (24000, 0.005), (24000, 0.001)]
    best_tvd, steady = np.inf, None
    for p_epochs, p_lr in phases:
        h = eng.train(observed, num_epochs=p_epochs, lr_born_machine=p_lr,
                      verbose=False, true_posterior_for_tvd=post,
                      chunk_epochs=1500)
        best_tvd = min(best_tvd, eng.best_tvd_)
        if steady is None:  # throughput from the long first phase
            steady = h.get("epochs_per_sec_steady", h["epochs_per_sec"])
    return {
        "ansatz": "bn_structured",
        "num_qubits": n,
        "epochs": sum(e for e, _ in phases),
        "lr_phases": [list(p) for p in phases],
        "kernel_length_scale": 0.0625,
        "epochs_per_sec": round(steady, 1),
        "final_tvd": round(best_tvd, 4),
        "backend": eng.born_machine.backend,
    }


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines.common import make_optimizer
    from tensornetworks_tpu.models import QuantumBornMachine
    from tensornetworks_tpu.ops import SteinOperator, score_table

    n = N_QUBITS
    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    t = bn.conditional_joint_table(latent, {f"V{n}": 1})
    S = score_table(t)
    # Default (non-pallas) operator: at n=16 stein_matvec picks the
    # two-big-dots 2D split — measured faster than both the fused Pallas
    # matvec kernel and the grouped path (RESULTS.md optimization log).
    op = SteinOperator(S, n, dense=False)

    # Prefer the fused Pallas circuit kernels; fall back to the pure-XLA
    # blocked executor only on backend-capability errors (Mosaic/XLA lowering
    # rejections), never on genuine bugs in the kernel path.
    circuit_path = "pallas2d"
    try:
        qbm = QuantumBornMachine(n, ansatz_layers=LAYERS,
                                 ansatz_type="hardware_efficient",
                                 init_method="small_random", backend="pallas2d")
        jax.jit(qbm.probs)(qbm.init(jax.random.PRNGKey(0))).block_until_ready()
    except (NotImplementedError, jax.errors.JaxRuntimeError) as e:
        print(f"# pallas2d circuit unavailable ({type(e).__name__}), using blocked XLA",
              file=sys.stderr)
        circuit_path = "blocked-xla"
        qbm = QuantumBornMachine(n, ansatz_layers=LAYERS,
                                 ansatz_type="hardware_efficient",
                                 init_method="small_random")
    params = qbm.init(jax.random.PRNGKey(0))
    opt = make_optimizer("adam", 5e-3, 1000, use_lr_scheduler=True,
                         gradient_clip_norm=10.0)
    opt_state = opt.init(params)

    # The operator tables pass through the jit boundary as arguments —
    # closure capture would embed them as (huge) HLO constants.
    def loss_fn(p, tables):
        q = qbm.probs(p).astype(jnp.float32)
        return op.ksd_loss_from(q, *tables)

    def step(carry, _, tables):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, tables)
        updates, s = opt.update(grads, s, p)
        return (optax.apply_updates(p, updates), s), loss

    # Epochs run inside one scanned XLA program (exactly how the training
    # engines execute), so the measurement reflects on-device epoch cost, not
    # per-call dispatch latency.
    def run_epochs(p, s, tables):
        (p, s), losses = jax.lax.scan(lambda c, x: step(c, x, tables), (p, s),
                                      None, length=TIMED_EPOCHS)
        return p, s, losses

    from tensornetworks_tpu.engines.common import highest_matmul_precision

    run_timed = jax.jit(run_epochs)
    tables = op.args()
    # HIGHEST matmul precision: TPU default precision degrades final TVD
    # >20x (RESULTS.md) — the bench measures the quality-matched config.
    with highest_matmul_precision():
        # Warm-up compile+run; any failure here is a real regression and
        # must surface, not be silently benched on a slower path.
        params, opt_state, losses = run_timed(params, opt_state, tables)
        float(losses[-1])

        t0 = time.perf_counter()
        params, opt_state, losses = run_timed(params, opt_state, tables)
        # Fetch a value (not just block_until_ready) — the tunnel-backed
        # runtime must fully materialize the result before the clock stops.
        float(losses[-1])
        elapsed = time.perf_counter() - t0
    epochs_per_sec = TIMED_EPOCHS / elapsed

    pair_sec = measure_reference_pair_seconds(n)
    ref_epoch_sec = pair_sec * float(4**n)
    ref_eps = 1.0 / ref_epoch_sec

    # Quality-matched configuration (VERDICT r2 item 2): the structured
    # ansatz trained through the real engine, with its measured final TVD —
    # the throughput claim earned on the config that achieves the quality.
    try:
        quality = measure_quality_path()
        quality["vs_baseline"] = round(quality["epochs_per_sec"] / ref_eps, 1)
    except Exception as e:  # never lose the primary metric to a quality-path failure
        print(f"# quality path failed: {type(e).__name__}: {e}", file=sys.stderr)
        quality = None

    print(json.dumps({
        "metric": f"quantum_ksd_epochs_per_sec_{n}q",
        "value": round(epochs_per_sec, 3),
        "unit": "epochs/sec",
        "vs_baseline": round(epochs_per_sec / ref_eps, 1),
        "path": circuit_path,
        "quality_path": quality,
    }))


if __name__ == "__main__":
    main()
