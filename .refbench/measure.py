"""Measure the reference implementation's per-epoch training cost directly.

Imports the reference modules from /root/reference (executing them as-is; no
code is copied) and times ONLY the train() loops, so the numbers in
BASELINE.md are measurements rather than extrapolations.
"""

import json
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

from bayesian_network import get_sprinkler_network
from ksd_vi import KSDVariationalInference
from adversarial_vi import AdversarialVariationalInference

torch.manual_seed(42)
np.random.seed(42)

bn = get_sprinkler_network(random_cpts=False)
latent = ["C", "S", "R"]
observed = {"W": 1}
true_post, p_obs = bn.get_true_posterior(latent, observed)

out = {}

# ---- classical KSD: same config as run_sprinkler_ksd.py:32-60, but with
# early stopping disabled (patience > epochs) to time a fixed epoch count.
EPOCHS = 300
model = KSDVariationalInference(
    bayesian_network=bn,
    latent_vars_names=latent,
    observed_vars_names=["W"],
    born_machine_config={
        "conditioning_dim": 1,
        "init_method": "uniform",
        "use_logits": True,
    },
    base_kernel_length_scale=1.0,
    device="cpu",
)
t0 = time.perf_counter()
hist = model.train(
    x_observation_dict=observed,
    num_epochs=EPOCHS,
    lr_born_machine=3e-3,
    optimizer_type="adam",
    gradient_clip_norm=5.0,
    entropy_weight=1e-3,
    patience=10**9,
    verbose=False,
    true_posterior_for_tvd=true_post,
)
ksd_sec = time.perf_counter() - t0
out["ksd_classical"] = {
    "epochs": EPOCHS,
    "sec_per_epoch": ksd_sec / EPOCHS,
    "epochs_per_sec": EPOCHS / ksd_sec,
    "best_tvd": float(min(hist["tvd"])),
}

# ---- adversarial VI: config of run_sprinkler_adversarial.py:37-72.
torch.manual_seed(42)
np.random.seed(42)
model_a = AdversarialVariationalInference(
    bayesian_network=bn,
    latent_vars_names=latent,
    observed_vars_names=["W"],
    born_machine_config={
        "conditioning_dim": 0,
        "init_method": "small_random",
        "use_logits": True,
    },
    classifier_config={"hidden_dims": [32, 16], "use_batch_norm": False},
    device="cpu",
)
EPOCHS_A = 300
t0 = time.perf_counter()
hist_a = model_a.train(
    x_observation_dict=observed,
    num_epochs=EPOCHS_A,
    batch_size=100,
    lr_born_machine=3e-3,
    lr_classifier=3e-2,
    k_classifier_steps=5,
    k_born_steps=1,
    optimizer_type="adam",
    adam_betas=(0.5, 0.999),
    gradient_clip_norm=5.0,
    baseline_decay=0.95,
    verbose=False,
    true_posterior_for_tvd=true_post,
)
advi_sec = time.perf_counter() - t0
out["advi"] = {
    "epochs": EPOCHS_A,
    "sec_per_epoch": advi_sec / EPOCHS_A,
    "epochs_per_sec": EPOCHS_A / advi_sec,
    "best_tvd": float(min(hist_a["tvd"])),
}

print(json.dumps(out, indent=2))
