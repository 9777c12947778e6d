"""Engine-level checkpoint saving."""

import numpy as np

from tensornetworks_tpu.core import get_sprinkler_network
from tensornetworks_tpu.engines import QuantumKSDVariationalInference
from tensornetworks_tpu.train import load_checkpoint


def test_quantum_ksd_checkpoint_save(tmp_path):
    bn = get_sprinkler_network()
    post, _ = bn.get_true_posterior(["C", "S", "R"], {"W": 1})
    m = QuantumKSDVariationalInference(bn, ["C", "S", "R"], ["W"],
                                       qbm_num_latent_vars=3, qbm_ansatz_layers=1)
    path = str(tmp_path / "qksd")
    m.train({"W": 1}, num_epochs=20, lr_born_machine=5e-3, verbose=False,
            true_posterior_for_tvd=post, checkpoint_path=path)
    restored = load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(restored["params"]),
                               np.asarray(m.params), atol=1e-7)
    assert "best_params" in restored and "best_tvd" in restored
