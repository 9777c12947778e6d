"""Runner + CLI smoke tests with tiny epoch counts."""

import numpy as np

from tensornetworks_tpu.runners import (
    AdversarialConfig,
    ClassicalKSDConfig,
    QuantumKSDConfig,
    run_sprinkler_experiment,
    run_sprinkler_ksd_experiment,
    run_sprinkler_quantum_ksd_experiment,
)
from tensornetworks_tpu.runners.cli import build_parser, main
from tensornetworks_tpu.runners.scale import make_scale_problem, run_scale_experiment
import pytest


def test_ksd_runner_smoke(tmp_path):
    cfg = ClassicalKSDConfig(num_epochs=30)
    out = run_sprinkler_ksd_experiment(cfg, verbose=False,
                                       plot_path=str(tmp_path / "ksd.png"))
    assert out is not None
    assert np.isfinite(out["final_tvd"])
    assert (tmp_path / "ksd.png").exists()
    assert len(out["history"]["loss_ksd"]) == 30


def test_quantum_runner_smoke():
    cfg = QuantumKSDConfig(num_epochs=25, ansatz_layers=2)
    out = run_sprinkler_quantum_ksd_experiment(cfg, verbose=False)
    assert np.isfinite(out["final_tvd"])


@pytest.mark.slow
def test_adversarial_runner_smoke():
    cfg = AdversarialConfig(num_epochs=20)
    out = run_sprinkler_experiment(cfg, verbose=False)
    assert np.isfinite(out["final_tvd"])


def test_adversarial_scale_lr_phases():
    """Annealed warm restarts on the adversarial objective (round-5): each
    phase restarts from the best snapshot; the across-phase best is kept."""
    out = run_scale_experiment(num_qubits=4, layers=2, objective="adversarial",
                               lr_phases=[(25, 5e-3), (15, 1e-3)],
                               verbose=False, seed=0)
    model = out["model"]
    assert np.isfinite(model.best_tvd_)
    # The final phase's history is returned (15 epochs).
    assert len(out["history"]["tvd"]) == 15
    # The restored best is at least as good as the final phase's own best.
    assert model.best_tvd_ <= float(np.nanmin(out["history"]["tvd"])) + 1e-9


def test_cli_parser():
    p = build_parser()
    args = p.parse_args(["quantum-ksd", "--epochs", "5", "--layers", "2"])
    assert args.command == "quantum-ksd" and args.epochs == 5

    args = p.parse_args(["scale", "--qubits", "10", "--objective", "adversarial"])
    assert args.qubits == 10


def test_cli_main_runs():
    out = main(["quantum-ksd", "--epochs", "5", "--layers", "1"])
    assert out is not None


def test_scale_problem_factory():
    bn, latent, observed = make_scale_problem(6, seed=1)
    assert len(latent) == 6 and bn.num_nodes == 7
    assert abs(bn.joint_table().sum() - 1.0) < 1e-9


def test_scale_experiment_smoke():
    out = run_scale_experiment(num_qubits=5, layers=2, num_epochs=15,
                               objective="ksd", verbose=False)
    assert np.isfinite(out["history"]["loss_ksd"]).all()


def test_stability_plot(tmp_path):
    from tensornetworks_tpu.utils import plot_posterior_comparison, plot_stability_analysis

    history = {"tvd": list(np.linspace(0.5, 0.01, 120)),
               "loss_ksd": list(np.linspace(10, 0.1, 120))}
    plot_stability_analysis(history, save_path=str(tmp_path / "stab.png"))
    assert (tmp_path / "stab.png").exists()
    plot_posterior_comparison({(0,): 0.3, (1,): 0.7}, {(0,): 0.25, (1,): 0.75},
                              save_path=str(tmp_path / "bar.png"))
    assert (tmp_path / "bar.png").exists()


def test_scale_sampled_ksd_objective():
    out = run_scale_experiment(num_qubits=5, layers=2, num_epochs=15,
                               objective="sampled-ksd", verbose=False)
    import numpy as np
    assert np.isfinite(np.asarray(out["history"]["loss_ksd"])).all()


@pytest.mark.slow
def test_cli_amortized_reupload_flag():
    from tensornetworks_tpu.runners.cli import main

    out = main(["amortized", "--qubits", "3", "--epochs", "60",
                "--quantum", "--ansatz", "bn_structured", "--reupload",
                "--lr", "0.05"])
    assert out["model"].born_machine.cond_reupload is True
    assert all(np.isfinite(v) for v in out["per_obs_tvd"].values())


@pytest.mark.slow
def test_cli_scale_sampled_grad_method():
    from tensornetworks_tpu.runners.cli import main

    out = main(["scale", "--qubits", "6", "--objective", "sampled-ksd",
                "--epochs", "30", "--num-samples", "128",
                "--grad-method", "adjoint"])
    assert out["model"].born_machine.grad_method == "adjoint"


@pytest.mark.slow
def test_cli_scale_warm_start_marginals():
    out = main(["scale", "--qubits", "5", "--ansatz", "bn_structured",
                "--layers", "3", "--epochs", "40",
                "--warm-start", "marginals", "--warm-start-epochs", "200"])
    # The warm start must leave the engine at a sane, finite state and the
    # run must finish with a tracked TVD no worse than a cold surrogate miss.
    best = out["model"].best_tvd_
    assert np.isfinite(best)
    assert best < 0.5


@pytest.mark.slow
def test_cli_scale_lr_phases():
    """LR-annealed warm restarts: phases chain from best snapshots and the
    model ends restored at the across-phase best."""
    out = main(["scale", "--qubits", "5", "--ansatz", "bn_structured",
                "--layers", "3", "--lr-phases", "60:0.05,40:0.005"])
    eng = out["model"]
    assert np.isfinite(eng.best_tvd_)
    # Restored params must reproduce the reported across-phase best TVD.
    import jax.numpy as jnp
    from tensornetworks_tpu.core import get_random_chain_network
    bn = get_random_chain_network(6, seed=0)
    post = bn.posterior_vector([f"V{i}" for i in range(5)], {"V5": 1})
    q = np.asarray(eng.born_machine.probs(eng.params))
    tvd = 0.5 * np.abs(q - np.asarray(post)).sum()
    np.testing.assert_allclose(tvd, eng.best_tvd_, atol=1e-5)


def test_cli_scale_length_scale():
    out = main(["scale", "--qubits", "4", "--ansatz", "bn_structured",
                "--layers", "2", "--epochs", "30", "--length-scale", "0.5"])
    assert out["model"].base_kernel_length_scale == 0.5
    assert np.isfinite(out["model"].best_tvd_)


def test_cli_scale_length_scale_auto():
    """'auto' resolves to l = 1/n (one kernel e-fold per flipped bit — the
    measured large-n optimum, RESULTS.md bandwidth sweeps)."""
    out = main(["scale", "--qubits", "4", "--ansatz", "bn_structured",
                "--layers", "2", "--epochs", "30", "--length-scale", "auto"])
    assert out["model"].base_kernel_length_scale == 0.25
    assert np.isfinite(out["model"].best_tvd_)


def test_cli_scale_lr_phases_with_length_scale():
    """Phase triples epochs:lr:ls anneal the kernel bandwidth across
    LR-annealed warm restarts; 'auto' resolves to 1/n per phase."""
    out = main(["scale", "--qubits", "4", "--ansatz", "bn_structured",
                "--layers", "2",
                "--lr-phases", "30:0.05:0.5,30:0.01:auto"])
    model = out["model"]
    assert model.base_kernel_length_scale == 0.25  # final phase: auto = 1/4
    assert np.isfinite(model.best_tvd_)
