"""Checkpoint/resume and profiling-hook tests (SURVEY.md §5.1/§5.4 build
equivalents)."""

import numpy as np
import jax
import jax.numpy as jnp

from tensornetworks_tpu.train import (
    StepTimer,
    debug_nans,
    load_checkpoint,
    save_checkpoint,
    training_bundle,
)


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "b": jnp.ones(3, dtype=jnp.float32)}
    bundle = training_bundle(params, best_tvd=jnp.asarray(0.01), epoch=jnp.asarray(42))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, bundle)
    restored = load_checkpoint(path, target=bundle)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.asarray(params["w"]))
    assert float(restored["best_tvd"]) == 0.01
    assert int(restored["epoch"]) == 42


def test_checkpoint_resume_training(tmp_path):
    # Save mid-training state, restore, and confirm training continues
    # deterministically from the same point.
    import optax

    opt = optax.adam(1e-2)
    params = jnp.asarray([1.0, -2.0, 3.0])
    state = opt.init(params)

    def loss(p):
        return (p**2).sum()

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(3):
        params, state = step(params, state)
    path = str(tmp_path / "resume")
    save_checkpoint(path, training_bundle(params, opt_state=state))
    p2, s2 = params, state
    for _ in range(2):
        p2, s2 = step(p2, s2)

    restored = load_checkpoint(path, target=training_bundle(params, opt_state=state))
    p3, s3 = restored["params"], restored["opt_state"]
    for _ in range(2):
        p3, s3 = step(p3, s3)
    np.testing.assert_allclose(np.asarray(p3), np.asarray(p2), atol=1e-7)


def test_debug_nans_context():
    with debug_nans(False):
        assert not jax.config.jax_debug_nans
    assert not jax.config.jax_debug_nans


def test_step_timer():
    t = StepTimer()
    with t:
        sum(range(1000))
    assert t.mean >= 0
    assert len(t.times) == 1
