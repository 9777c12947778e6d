"""Recorded-fixture parity for the quantum ansätze (VERDICT r2 missing-3).

The ansätze were transcribed by hand from the reference's PennyLane QNodes
(``quantum_born_machine.py:57-128``). These tests check the framework
simulator against probability vectors recorded by
``scripts/gen_quantum_fixtures.py`` from an implementation that shares no
code with ``tensornetworks_tpu.sim``: either PennyLane itself (when the
fixtures were generated in an environment that has it) or the script's
independent dense-unitary numpy executor. Each fixture records its
``source``; tests skip cleanly if no fixtures are committed.
"""

import glob
import os

import numpy as np
import pytest

import jax

from tensornetworks_tpu.models import QuantumBornMachine

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
FIXTURES = sorted(glob.glob(os.path.join(FIXTURE_DIR, "quantum_ref_*.npz")))

pytestmark = pytest.mark.skipif(
    not FIXTURES, reason="no recorded quantum fixtures (scripts/gen_quantum_fixtures.py)")


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_simulator_matches_recorded_reference(path):
    fx = np.load(path)
    n, layers = int(fx["n"]), int(fx["layers"])
    ansatz = str(fx["ansatz"])
    qbm = QuantumBornMachine(n, ansatz_layers=layers, ansatz_type=ansatz,
                             backend="einsum")
    probs = np.asarray(jax.jit(qbm.probs)(fx["theta"]))
    np.testing.assert_allclose(probs, fx["probs"], atol=1e-6,
                               err_msg=f"{ansatz} n={n} L={layers} "
                                       f"(source={fx['source']})")


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_blocked_backend_matches_recorded_reference(path):
    """The production blocked executor against the same recordings (the
    einsum test pins the transcription; this pins the TPU layout machinery)."""
    fx = np.load(path)
    n, layers = int(fx["n"]), int(fx["layers"])
    ansatz = str(fx["ansatz"])
    qbm = QuantumBornMachine(n, ansatz_layers=layers, ansatz_type=ansatz,
                             backend="blocked", block=2)
    probs = np.asarray(jax.jit(qbm.probs)(fx["theta"]))
    np.testing.assert_allclose(probs, fx["probs"], atol=1e-6)
