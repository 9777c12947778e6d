"""Coverage for less-traveled branches: SGD/no-scheduler optimizers,
unconditional adversarial VI, BatchNorm classifier in-scan, batched Hamming
kernels, seeded forward sampling."""

import numpy as np
import jax
import jax.numpy as jnp

from tensornetworks_tpu.core import get_sprinkler_network
from tensornetworks_tpu.engines import (
    AdversarialVariationalInference,
    KSDVariationalInference,
)
from tensornetworks_tpu.ops import base_hamming_kernel, hamming_distance


def test_batched_hamming_kernel():
    z1 = jnp.asarray(np.random.default_rng(0).integers(0, 2, (5, 4)), dtype=jnp.float64)
    z2 = jnp.asarray(np.random.default_rng(1).integers(0, 2, (5, 4)), dtype=jnp.float64)
    d = np.asarray(hamming_distance(z1, z2))
    k = np.asarray(base_hamming_kernel(z1, z2, 4, 0.5))
    np.testing.assert_allclose(k, np.exp(-d / 2.0), atol=1e-12)
    # n=0 edge: kernel is 1 (stein_utils.py:36-40).
    k0 = base_hamming_kernel(jnp.zeros((3, 0)), jnp.zeros((3, 0)), 0)
    np.testing.assert_allclose(np.asarray(k0), 1.0)


def test_sgd_without_scheduler():
    bn = get_sprinkler_network()
    post, _ = bn.get_true_posterior(["C", "S", "R"], {"W": 1})
    m = KSDVariationalInference(bn, ["C", "S", "R"], ["W"],
                                born_machine_config={"conditioning_dim": 0})
    h = m.train({"W": 1}, num_epochs=100, lr_born_machine=0.05, verbose=False,
                true_posterior_for_tvd=post, optimizer_type="sgd",
                use_lr_scheduler=False, entropy_weight=1e-3)
    assert h["loss_ksd"][-1] < h["loss_ksd"][0]


def test_advi_unconditional_z_only_classifier():
    # include_x=False branch: classifier sees z only (adversarial_vi.py:161-163).
    bn = get_sprinkler_network()
    post, _ = bn.get_true_posterior(["C", "S", "R"], {"W": 1})
    m = AdversarialVariationalInference(
        bn, ["C", "S", "R"], ["W"],
        born_machine_config={"use_logits": True, "conditioning_dim": 0},
        classifier_config={"hidden_dims": [16, 8]},
    )
    assert m.classifier_input_dim == 3
    h = m.train({"W": 1}, num_epochs=40, batch_size=64, lr_born_machine=5e-3,
                lr_classifier=3e-2, verbose=False, true_posterior_for_tvd=post)
    assert np.isfinite(h["loss_classifier"]).all()
    assert h["tvd"][-1] < h["tvd"][0]


def test_advi_batchnorm_classifier_in_scan():
    bn = get_sprinkler_network()
    post, _ = bn.get_true_posterior(["C", "S", "R"], {"W": 1})
    m = AdversarialVariationalInference(
        bn, ["C", "S", "R"], ["W"],
        born_machine_config={"use_logits": True, "conditioning_dim": 0},
        classifier_config={"hidden_dims": [8], "use_batch_norm": True},
    )
    assert "batch_stats" in m.classifier_vars
    h = m.train({"W": 1}, num_epochs=10, batch_size=32, lr_born_machine=5e-3,
                lr_classifier=1e-2, verbose=False, true_posterior_for_tvd=post)
    assert np.isfinite(h["loss_classifier"]).all()


def test_forward_sampling_seeded_reproducible():
    bn = get_sprinkler_network()
    _, t1 = bn.sample_forward(100, seed=7)
    _, t2 = bn.sample_forward(100, seed=7)
    assert t1 == t2
    _, t3 = bn.sample_forward(100, seed=8)
    assert t1 != t3


def test_bf16_compute_dtype_matvec():
    # Reduced-precision Kronecker passes with f32 accumulation: ~0.5% rel
    # error, gradients via the custom VJP stay consistent.
    import jax.numpy as jnp
    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.ops import SteinOperator, score_table

    n = 8
    bnet = get_random_chain_network(n + 1, seed=2)
    t = bnet.conditional_joint_table([f"V{i}" for i in range(n)], {f"V{n}": 1})
    S = score_table(t)
    op32 = SteinOperator(S, n, dense=False)
    opbf = SteinOperator(S, n, dense=False, compute_dtype=jnp.bfloat16)
    q = jnp.asarray(np.random.default_rng(1).random(2**n), dtype=jnp.float32)
    y32, ybf = op32.matvec(q), opbf.matvec(q)
    rel = float(jnp.abs(ybf - y32).max() / jnp.abs(y32).max())
    assert rel < 0.02
    g32 = jax.grad(op32.quadform)(q)
    gbf = jax.grad(opbf.quadform)(q)
    assert float(jnp.abs(gbf - g32).max() / jnp.abs(g32).max()) < 0.02
