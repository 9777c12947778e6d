"""Differential tests against the reference implementation itself.

Imports the actual reference modules from /root/reference (skipped when that
tree is absent, e.g. outside the build environment) and asserts mechanical
equality of the objective math — base Hamming kernel, discrete score
function, Stein kernel Gram — on the Sprinkler network and on random inputs.
This closes the loop the hand-transcribed oracles in test_stein.py leave
open: the parity claim is checked against the reference's own code, not a
transcription of it.

Reference entry points exercised: ``stein_utils.base_hamming_kernel_torch``
(:30), ``get_score_function_sp_for_z`` (:115), ``get_stein_kernel_kp_value``
(:138), ``born_machine_classical_sim.ClassicalBornMachine.get_probabilities``
(:74), ``bayesian_network.get_sprinkler_network`` (:312).
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_DIR = "/root/reference"

if not os.path.isdir(REFERENCE_DIR):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

torch = pytest.importorskip("torch")

sys.path.insert(0, REFERENCE_DIR)

import stein_utils as ref_stein  # noqa: E402
from bayesian_network import get_sprinkler_network as ref_sprinkler  # noqa: E402
from born_machine_classical_sim import ClassicalBornMachine as RefBornMachine  # noqa: E402

from tensornetworks_tpu.core import get_sprinkler_network
from tensornetworks_tpu.core.bits import generate_all_binary_outcomes
from tensornetworks_tpu.models import ClassicalBornMachine
from tensornetworks_tpu.ops import score_table, stein_gram_dense
from tensornetworks_tpu.ops.hamming import decay_factor


LATENT = ["C", "S", "R"]
OBSERVED = {"W": 1}


def _ref_bn():
    return ref_sprinkler(random_cpts=False)


def test_base_hamming_kernel_matches_reference():
    rng = np.random.default_rng(0)
    for n in (2, 3, 5, 8):
        a = decay_factor(n, length_scale=1.0)
        for _ in range(10):
            z1 = rng.integers(0, 2, n)
            z2 = rng.integers(0, 2, n)
            ref = float(ref_stein.base_hamming_kernel_torch(
                torch.tensor(z1, dtype=torch.float64),
                torch.tensor(z2, dtype=torch.float64),
                num_vars=n, length_scale=1.0))
            ours = a ** int(np.sum(z1 != z2))
            assert abs(ref - ours) < 1e-12


def test_score_table_matches_reference_sprinkler():
    ref_bn = _ref_bn()
    bn = get_sprinkler_network(random_cpts=False)
    t = bn.conditional_joint_table(LATENT, OBSERVED)
    S = score_table(t)  # (8, 3)
    for i, z in enumerate(generate_all_binary_outcomes(3)):
        sp_ref = ref_stein.get_score_function_sp_for_z(
            ref_bn, OBSERVED, tuple(z), LATENT, ["W"], device="cpu")
        np.testing.assert_allclose(
            S[i], np.asarray(sp_ref, dtype=np.float64), atol=1e-12,
            err_msg=f"score at z={z}")


def test_stein_gram_matches_reference_sprinkler():
    ref_bn = _ref_bn()
    bn = get_sprinkler_network(random_cpts=False)
    t = bn.conditional_joint_table(LATENT, OBSERVED)
    S = score_table(t)
    import jax.numpy as jnp

    G = np.asarray(stein_gram_dense(jnp.asarray(S), 3, 1.0, dtype=jnp.float64))

    from functools import partial

    kernel = partial(ref_stein.base_hamming_kernel_torch, num_vars=3,
                     length_scale=1.0)
    outcomes = generate_all_binary_outcomes(3)
    sp = {z: ref_stein.get_score_function_sp_for_z(
        ref_bn, OBSERVED, tuple(z), LATENT, ["W"], device="cpu")
        for z in outcomes}
    for i, z1 in enumerate(outcomes):
        for j, z2 in enumerate(outcomes):
            ref_val = float(ref_stein.get_stein_kernel_kp_value(
                tuple(z1), tuple(z2), OBSERVED, ref_bn, LATENT, ["W"],
                kernel, sp[z1], sp[z2], device="cpu"))
            assert abs(G[i, j] - ref_val) < 1e-10, f"K_p[{i},{j}]"


def test_classical_born_machine_probs_match_reference():
    """Same logits table -> same softmax distribution, both frameworks."""
    import jax.numpy as jnp

    n = 3
    rng = np.random.default_rng(7)
    logits = rng.normal(size=2**n)

    ref_bm = RefBornMachine(num_latent_vars=n, use_logits=True,
                            conditioning_dim=0, init_method="zero")
    with torch.no_grad():
        ref_bm.params.copy_(torch.tensor(logits, dtype=torch.float32))
    p_ref = ref_bm.get_probabilities().detach().numpy().squeeze()

    bm = ClassicalBornMachine(num_latent_vars=n, use_logits=True,
                              init_method="zero")
    params = {"table": jnp.asarray(logits, dtype=jnp.float32)}
    p_ours = np.asarray(bm.probs(params))

    np.testing.assert_allclose(p_ours, p_ref, atol=1e-6)
