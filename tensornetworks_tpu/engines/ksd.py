"""KSD variational inference engines (classical + quantum Born machines).

Rebuild of ``ksd_vi.py`` / ``ksd_vi_quantum.py`` (reference) as one fully
jitted ``lax.scan`` program: per epoch the loss is
``sqrt(clamp(qᵀ K_p q, 1e-12)) - entropy_weight·H(q)`` where ``K_p`` is the
precompiled Stein Gram operator (``ops.stein``), and TVD-vs-truth tracking,
best-snapshotting and early stopping all run on device in the scan carry —
zero host syncs per epoch. This is the ≥100x lever over the reference's
O(4^n)-Python-ops-per-epoch loop (``ksd_vi.py:114-131``).

Matched semantics (reference file:line):
- loss = sqrt(clamp(Σ qᵢqⱼ k_p, 1e-12)) (``ksd_vi.py:133-134``)
- entropy regularizer − w·H(q), classical only (``ksd_vi.py:136-140``)
- adam/sgd + cosine LR→lr/10 + global-norm clip (``ksd_vi.py:84-93,148``)
- NaN/Inf loss skips the update *and* the scheduler step (``:142-153``)
- TVD evaluated after the update, every epoch (``:159-163``)
- best-TVD snapshot each epoch; early stop after ``patience`` non-improving
  epochs once epoch > 300, classical only (``:165-184``)
- classical restore via fixed-probs mode with post-restore verification
  (``:199-214``); quantum restores best params (``ksd_vi_quantum.py:187-190``
  — the reference's no-deepcopy/verbose-gated restore bugs are fixed here,
  noted in docstrings).

Known deviations (documented improvements): the entropy term reuses the same
probability vector as the KSD term instead of re-running the (dropout-noisy)
forward; TVD evaluation uses deterministic probabilities; logged grad_norm is
the true pre-clip global norm every epoch rather than a stale local.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.bayes_net import BayesianNetwork
from ..core.bits import generate_all_binary_outcomes
from ..core.metrics import calculate_tvd
from ..models.born_classical import ClassicalBornMachine
from ..models.born_quantum import QuantumBornMachine
from ..ops.hamming import resolve_length_scale
from ..ops.stein import SteinOperator, score_table
from .common import (force_fetch, global_norm, guarded_update, history_to_numpy,
                     make_optimizer, scan_logging_supported, tree_select)


def _posterior_vec_from(true_posterior, num_latent_vars, dtype):
    """Accept the reference's dict format or a dense vector."""
    if true_posterior is None:
        return None
    if isinstance(true_posterior, dict):
        outcomes = generate_all_binary_outcomes(num_latent_vars)
        vec = np.array([true_posterior.get(t, 0.0) for t in outcomes])
    else:
        vec = np.asarray(true_posterior)
    return jnp.asarray(vec, dtype=dtype)


def _resume_fingerprint(init_carry, num_epochs: int, chunk_epochs: int) -> str:
    """Config fingerprint stored in the resume snapshot: resuming after
    changing the epoch budget, chunking, model/optimizer shapes or dtypes
    would silently replay a stale carry — refuse instead."""
    leaves = jax.tree_util.tree_leaves(init_carry)
    shapes = ";".join(f"{tuple(np.shape(x))}:{np.asarray(x).dtype}"
                      for x in leaves)
    return f"v2|epochs={num_epochs}|chunk={chunk_epochs}|{shapes}"


def _save_chunk_state(path: str, carry, parts, next_start: int,
                      fingerprint: str) -> None:
    """Durable chunk-resume snapshot: every carry leaf + the per-epoch
    history recorded so far, written atomically (tmp + rename)."""
    import os

    leaves = jax.tree_util.tree_leaves(carry)
    outs = (parts[0] if len(parts) == 1
            else jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts))
    payload = {f"carry{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload.update({f"out{i}": np.asarray(x) for i, x in enumerate(outs)})
    payload["next_start"] = np.asarray(next_start)
    payload["fingerprint"] = np.asarray(fingerprint)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def _load_chunk_state(path: str, init_carry, fingerprint: str):
    """Inverse of ``_save_chunk_state``; ``init_carry`` supplies the pytree
    structure (the numpy roundtrip is bit-exact, so a resumed run replays
    identically to an uninterrupted one). Raises if the snapshot was written
    under a different config fingerprint."""
    data = np.load(path)
    saved = str(data["fingerprint"]) if "fingerprint" in data.files else None
    if saved != fingerprint:
        raise ValueError(
            f"resume snapshot {path!r} was written under a different "
            f"configuration (saved fingerprint {saved!r} != current "
            f"{fingerprint!r}); delete it or restore the original config")
    treedef = jax.tree_util.tree_structure(init_carry)
    n_leaves = treedef.num_leaves
    carry = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(data[f"carry{i}"]) for i in range(n_leaves)])
    n_outs = sum(1 for k in data.files if k.startswith("out"))
    outs = (tuple(jnp.asarray(data[f"out{i}"]) for i in range(n_outs))
            if n_outs else None)
    return carry, outs, int(data["next_start"])


def run_ksd_scan(
    *,
    probs_fn,                 # (params, rng) -> q  (training forward)
    eval_probs_fn,            # params -> q         (deterministic eval)
    params0,
    op: SteinOperator,
    num_epochs: int,
    optimizer,
    entropy_weight: Optional[float],
    posterior_vec: Optional[jnp.ndarray],
    early_stopping: bool,
    patience: int,
    min_epochs_before_stop: int = 300,
    key: Optional[jax.Array] = None,
    log_every: int = 0,
    stein_args: Optional[tuple] = None,
    chunk_epochs: Optional[int] = None,
    resume_state_path: Optional[str] = None,
    fail_after_chunks: Optional[int] = None,
    stein_args_schedule=None,
    reuse_loss_forward_for_eval: bool = False,
    noisy_eval: bool = False,
    chunk_progress: bool = False,
):
    """One jitted training program shared by the classical and quantum KSD
    engines. Returns (final_params, best dict, history arrays, stop_epoch).

    ``chunk_epochs``: when set, the epoch scan is split into separately
    dispatched device programs of at most that many epochs, with the carry
    (params, optimizer state, best snapshot, early-stop counters — and hence
    the cosine schedule, which lives in the optimizer count) flowing across
    chunks unchanged. Use on backends that bound single-program runtime
    (e.g. tunneled TPU workers); results are bit-identical to the single
    scan. Additionally the chunk loop BREAKS once the carried early-stop
    flag is set (post-stop epochs are frozen no-ops in the single scan, so
    nothing observable changes — the reference also breaks,
    ``ksd_vi.py:178-184``) and the recorded history simply ends at that
    chunk boundary. In chunked mode the caller must NOT wrap this function
    in ``jax.jit`` — each chunk jits itself, and the Stein tables /
    posterior ride along as operands (never HLO constants).

    ``resume_state_path`` (chunked mode only): durable mid-training resume.
    After every chunk the full carry + history-so-far is written to this
    ``.npz`` path (atomic tmp+rename); if the file already exists when
    training starts, completed chunks are skipped and the run continues
    from the saved carry — bit-identical to an uninterrupted run (the
    device→numpy→device roundtrip is exact). The file is removed on
    successful completion. Callers must keep ``num_epochs``/optimizer/
    chunking identical across the interrupted and resumed invocations.

    ``fail_after_chunks``: fault-injection hook for testing resume — raises
    after that many chunks have completed (simulating a killed worker).

    ``stein_args_schedule`` (chunked mode only): ``chunk_index -> tuple`` of
    per-chunk operator tables replacing ``stein_args`` — the tempered-target
    hook (train against p^β with β annealed chunk-by-chunk). Shapes must
    match across chunks (the chunk program is compiled once).

    ``noisy_eval``: evaluate the per-epoch TVD on the TRAINING forward
    (``probs_fn`` with a fresh rng — i.e. dropout active), which is the
    reference's evaluation convention (``ksd_vi.py:159-163`` calls
    ``get_probabilities()`` with the torch module still in train mode).
    The default (False) evaluates the deterministic forward — a documented
    deviation (PARITY.md); this flag exists to reproduce the reference's
    numbers for the quality-parity attribution study (BASELINE.md).

    ``reuse_loss_forward_for_eval``: epoch t's post-update probabilities are
    exactly epoch t+1's loss-forward probabilities, so with this flag the
    per-epoch TVD/best-snapshot evaluation consumes the loss forward instead
    of running a second forward — halving forwards per epoch (one final
    deterministic eval outside the scan covers the last epoch). Requires
    ``probs_fn`` to be deterministic and equal to ``eval_probs_fn`` (true
    for the quantum engines; NOT for a dropout-regularized classical BM) and
    shifts early-stop *decisions* one epoch later (the quantum engine does
    not early-stop). Best-snapshot/restore semantics are unchanged: every
    post-update state including the last is still a candidate."""
    if stein_args_schedule is not None and not chunk_epochs:
        raise ValueError("stein_args_schedule requires chunk_epochs")
    key = key if key is not None else jax.random.PRNGKey(0)
    opt_state = optimizer.init(params0)
    q0 = jax.jit(eval_probs_fn)(params0) if chunk_epochs else eval_probs_fn(params0)
    dtype = q0.dtype
    track_tvd = posterior_vec is not None

    def make_epoch_step(sa, pv):
        def epoch_step(carry, epoch):
            params, opt_state, k, best_tvd, best_epoch, best_params, esi, stopped = carry
            k, sub = jax.random.split(k)

            def loss_fn(p):
                q = probs_fn(p, sub)
                ksd = (op.ksd_loss_from(q, *sa) if sa is not None
                       else op.ksd_loss(q))
                ent = -(q * jnp.log(jnp.clip(q, 1e-10, None))).sum()
                loss = ksd if entropy_weight is None else ksd - entropy_weight * ent
                return loss, (ksd, ent, q)

            (loss, (ksd, ent, q_loss)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            gnorm = global_norm(grads)
            do_update = jnp.isfinite(loss) & ~stopped

            # NOTE: the best 2^n probability vector is NOT carried through the
            # scan — eval_probs_fn is deterministic in both engines, so it is
            # recomputed once post-scan as eval_probs_fn(best_params)
            # (bit-identical; saves an O(2^n) carry read-modify-write per
            # epoch at large n).
            if reuse_loss_forward_for_eval and track_tvd:
                # q_loss at the CURRENT params is the previous epoch's
                # post-update distribution (or the init at epoch 0) — use it
                # as that epoch's eval; the final epoch is evaluated once
                # after the scan. Saves a full circuit forward per epoch.
                tvd = 0.5 * jnp.abs(q_loss - pv).sum()
                # epoch 0's q_loss is the INIT state — not a best candidate
                # (parity with the two-forward path / reference, which track
                # from the first post-update state).
                improved = (tvd < best_tvd) & ~stopped & (epoch > 0)
                best_tvd = jnp.where(improved, tvd, best_tvd)
                best_epoch = jnp.where(improved, epoch - 1, best_epoch)
                best_params = tree_select(improved, params, best_params)
                esi = jnp.where(stopped, esi, jnp.where(improved, 0, esi + 1))
                if early_stopping:
                    stopped = stopped | ((esi > patience) & (epoch > min_epochs_before_stop))
                params, opt_state = guarded_update(optimizer, grads, opt_state, params, do_update)
            elif track_tvd:
                params, opt_state = guarded_update(optimizer, grads, opt_state, params, do_update)
                if noisy_eval:
                    k, sub_eval = jax.random.split(k)
                    q_eval = probs_fn(params, sub_eval)
                else:
                    q_eval = eval_probs_fn(params)
                tvd = 0.5 * jnp.abs(q_eval - pv).sum()
                improved = (tvd < best_tvd) & ~stopped
                best_tvd = jnp.where(improved, tvd, best_tvd)
                best_epoch = jnp.where(improved, epoch, best_epoch)
                best_params = tree_select(improved, params, best_params)
                esi = jnp.where(stopped, esi, jnp.where(improved, 0, esi + 1))
                if early_stopping:
                    stopped = stopped | ((esi > patience) & (epoch > min_epochs_before_stop))
            else:
                params, opt_state = guarded_update(optimizer, grads, opt_state, params, do_update)
                tvd = jnp.asarray(jnp.nan, dtype=dtype)

            if log_every:
                # Reference-style periodic console logging (ksd_vi.py:188-196),
                # emitted from device via an async host callback.
                def _log(e, k_, t_):
                    print(f"Epoch {int(e) + 1}/{num_epochs} | KSD: {float(k_):.6f}"
                          + (f" | TVD: {float(t_):.6f}" if np.isfinite(float(t_)) else ""))

                jax.lax.cond(
                    ((epoch % log_every) == 0) | (epoch == num_epochs - 1),
                    lambda args: jax.debug.callback(_log, *args),
                    lambda args: None,
                    (epoch, ksd, tvd),
                )

            carry = (params, opt_state, k, best_tvd, best_epoch, best_params, esi, stopped)
            return carry, (ksd, tvd, gnorm, ent, stopped, ~do_update & ~stopped)

        return epoch_step

    # Explicit (non-weak) dtypes: a weak-typed int scalar in the carry makes
    # chunk 1 recompile the whole chunk program — the step returns strong
    # int32 (jnp.where with the scan's arange), changing the carry aval after
    # the first dispatch. Measured: a second full ~40 s compile at 20q and a
    # 2.7x-understated steady-eps report.
    init = (
        params0, opt_state, key,
        jnp.asarray(jnp.inf, dtype=dtype), jnp.asarray(-1, jnp.int32),
        params0, jnp.asarray(0, jnp.int32), jnp.asarray(False),
    )
    epochs_dispatched = 0
    if chunk_epochs:
        # Chunked mode (also taken when chunk_epochs >= num_epochs: one
        # jitted chunk — callers of chunked mode never jit-wrap this
        # function, so the single-scan branch would dispatch eagerly).
        # sa/pv arrive as (possibly empty) tuple operands so the per-chunk
        # jit never bakes large tables in as HLO constants.
        def _scan_chunk(carry, epochs, sa_t, pv_t):
            step = make_epoch_step(sa_t if sa_t else None,
                                   pv_t[0] if pv_t else None)
            return jax.lax.scan(step, carry, epochs)

        scan_chunk = jax.jit(_scan_chunk)
        sa_t = tuple(stein_args) if stein_args is not None else ()
        pv_t = (posterior_vec,) if track_tvd else ()
        carry, parts, start = init, [], 0
        fingerprint = _resume_fingerprint(init, num_epochs, chunk_epochs)
        if resume_state_path:
            import os

            if os.path.exists(resume_state_path):
                carry, prev_outs, start = _load_chunk_state(
                    resume_state_path, init, fingerprint)
                if prev_outs is not None:
                    parts.append(prev_outs)
        done_chunks = 0
        chunk_seconds = []
        for s in range(start, num_epochs, chunk_epochs):
            epochs = jnp.arange(s, min(s + chunk_epochs, num_epochs),
                                dtype=jnp.int32)
            if stein_args_schedule is not None:
                # Per-chunk operator tables (e.g. tempered/annealed targets):
                # same shapes each chunk, so the chunk program never
                # recompiles — only the operand values change.
                sa_t = tuple(stein_args_schedule(s // chunk_epochs))
            t_chunk = time.perf_counter()
            carry, o = scan_chunk(carry, epochs, sa_t, pv_t)
            # Sync point: the previous program must finish before the next
            # launches (bounded-runtime backends kill long programs).
            stopped_now = bool(np.asarray(carry[7]))
            chunk_seconds.append((int(len(epochs)), time.perf_counter() - t_chunk))
            parts.append(o)
            done_chunks += 1
            epochs_dispatched += int(len(epochs))
            if chunk_progress and done_chunks % 10 == 0:
                # Host-side progress line (in-scan logging is a host
                # callback, which the axon backend rejects): every 10
                # dispatched chunks, the running best TVD from the carry.
                bt = float(np.asarray(carry[3]))
                print(f"  [chunk] {s + len(epochs)}/{num_epochs} epochs "
                      f"{sum(t for _, t in chunk_seconds):.0f}s"
                      + (f" best_tvd={bt:.4f}" if np.isfinite(bt) else ""),
                      flush=True)
            if resume_state_path:
                _save_chunk_state(resume_state_path, carry, parts,
                                  s + len(epochs), fingerprint)
            if fail_after_chunks is not None and done_chunks >= fail_after_chunks:
                raise RuntimeError(
                    f"fault injection: killed after {done_chunks} chunks")
            if stopped_now:
                # Early-stopped: every remaining epoch would be a frozen
                # no-op in the single scan — skip dispatching them.
                break
        if resume_state_path:
            import os

            if os.path.exists(resume_state_path):
                os.remove(resume_state_path)
        outs = (parts[0] if len(parts) == 1
                else jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts))
        (params, _, _, best_tvd, best_epoch, best_params, _, _) = carry
    else:
        chunk_seconds = None
        (params, _, _, best_tvd, best_epoch, best_params, _, _), outs = jax.lax.scan(
            make_epoch_step(stein_args, posterior_vec), init,
            jnp.arange(num_epochs, dtype=jnp.int32)
        )
        epochs_dispatched = num_epochs
    ksd_hist, tvd_hist, gnorm_hist, ent_hist, stopped_hist, skipped_hist = outs
    if reuse_loss_forward_for_eval and track_tvd:
        # Final epoch's post-update eval (the in-scan evals lag one epoch)
        # + history shift so tvd_hist[t] is epoch t's post-update TVD,
        # matching the non-reuse path exactly. best_probs is recomputed from
        # best_params (deterministic eval) rather than carried in the scan.
        last_epoch = int(tvd_hist.shape[0]) - 1

        def _final(p, pv, bt, be, bp, th):
            q_last = eval_probs_fn(p)
            tvd_last = 0.5 * jnp.abs(q_last - pv).sum()
            improved = tvd_last < bt
            bt = jnp.where(improved, tvd_last, bt)
            be = jnp.where(improved, last_epoch, be)
            bp = tree_select(improved, p, bp)
            bq = jnp.where(improved, q_last, eval_probs_fn(bp))
            th = jnp.concatenate(
                [th[1: 1 + stop_len - 1], tvd_last[None].astype(th.dtype)])
            return bt, be, bp, bq, th

        stop_len = tvd_hist.shape[0]
        fin = jax.jit(_final) if chunk_epochs else _final
        (best_tvd, best_epoch, best_params, best_probs, tvd_hist) = fin(
            params, posterior_vec, best_tvd, best_epoch, best_params,
            tvd_hist)
    else:
        bq_fn = jax.jit(eval_probs_fn) if chunk_epochs else eval_probs_fn
        best_probs = bq_fn(best_params)
    return {
        "params": params,
        "best_tvd": best_tvd,
        "best_epoch": best_epoch,
        "best_params": best_params,
        "best_probs": best_probs,
        "loss_ksd": ksd_hist,
        "tvd": tvd_hist,
        "grad_norm": gnorm_hist,
        "entropy": ent_hist,
        "stopped": stopped_hist,
        "skipped": skipped_hist,
        "epochs_dispatched": epochs_dispatched,
        # (epochs, wall seconds) per dispatched chunk (chunked mode only);
        # the first entry of a cold run includes the one-time program
        # compile, so the post-first-chunk rate is the steady-state rate.
        "chunk_seconds": chunk_seconds,
    }


def steady_epochs_per_sec(chunk_seconds) -> Optional[float]:
    """Steady-state engine epoch rate from per-chunk (epochs, seconds)
    timings, excluding the first chunk (which pays the one-time XLA program
    compile). None when fewer than two chunks were dispatched."""
    if not chunk_seconds or len(chunk_seconds) < 2:
        return None
    eps_total = sum(e for e, _ in chunk_seconds[1:])
    sec_total = sum(s for _, s in chunk_seconds[1:])
    return eps_total / sec_total if sec_total > 0 else None


class KSDVariationalInference:
    """Classical-Born-machine KSD engine. Parity: ``ksd_vi.py:19-216``."""

    def __init__(self, bayesian_network: BayesianNetwork, latent_vars_names: Sequence[str],
                 observed_vars_names: Sequence[str], born_machine_config: dict,
                 base_kernel_length_scale: float = 1.0, dtype=jnp.float32,
                 dense: Optional[bool] = None, seed: int = 0):
        self.bn = bayesian_network
        self.latent_vars_names = list(latent_vars_names)
        self.observed_vars_names = list(observed_vars_names)
        self.num_latent_vars = len(latent_vars_names)
        self.num_observed_vars = len(observed_vars_names)
        self.base_kernel_length_scale = resolve_length_scale(
            base_kernel_length_scale, self.num_latent_vars)
        self.dtype = dtype
        self.dense = dense
        self.seed = seed
        # Reference forces small_random init regardless of config (ksd_vi.py:30).
        born_machine_config = {**born_machine_config, "init_method": "small_random"}
        self.born_machine = ClassicalBornMachine(
            num_latent_vars=self.num_latent_vars, dtype=dtype, **born_machine_config
        )
        self.params = self.born_machine.init(jax.random.PRNGKey(seed))
        self._all_latent_states_tuples: Optional[list] = None
        self._x_condition = None
        self.history_: Optional[dict] = None

    @property
    def all_latent_states_tuples(self) -> list:
        # Built lazily: the 2^n Python tuple list (~8 GB host, minutes of
        # interpreter time at n = 24) is only needed by the dict-keyed TVD
        # paths — never by large-n array-path training.
        if self._all_latent_states_tuples is None:
            self._all_latent_states_tuples = generate_all_binary_outcomes(
                self.num_latent_vars)
        return self._all_latent_states_tuples

    def _x_cond_tensor(self, x_observation_dict):
        if self.num_observed_vars == 0:
            return None
        if set(x_observation_dict) != set(self.observed_vars_names):
            raise ValueError("Keys in x_observation_dict must match self.observed_vars_names.")
        x = jnp.asarray(
            [x_observation_dict[n] for n in self.observed_vars_names], dtype=jnp.float32
        )
        if self.born_machine.conditioning_dim > 0:
            if self.born_machine.conditioning_dim != self.num_observed_vars:
                raise ValueError("Born machine conditioning_dim must match num_observed_vars.")
            return x
        return None

    def build_operator(self, x_observation_dict) -> SteinOperator:
        """Score table + Stein Gram, computed once per observation
        (the reference recomputes every epoch — SURVEY.md §3.1)."""
        t = self.bn.conditional_joint_table(self.latent_vars_names, x_observation_dict)
        S = score_table(t)
        return SteinOperator(S, self.num_latent_vars, self.base_kernel_length_scale,
                            dtype=self.dtype, dense=self.dense)

    def train(self, x_observation_dict: Dict[str, int], num_epochs: int,
              lr_born_machine: float, verbose: bool = True,
              true_posterior_for_tvd=None, use_lr_scheduler: bool = True,
              gradient_clip_norm: float = 10.0, optimizer_type: str = "adam",
              adam_betas=(0.9, 0.999), entropy_weight: float = 0.01,
              patience: int = 200, seed: Optional[int] = None,
              checkpoint_path: Optional[str] = None,
              profile_dir: Optional[str] = None,
              chunk_epochs: Optional[int] = None,
              resume_state_path: Optional[str] = None,
              eval_convention: str = "deterministic") -> dict:
        """``eval_convention``: 'deterministic' (default — TVD on the
        dropout-free forward) or 'train_noisy' (the reference's convention,
        ``ksd_vi.py:159-163``: TVD on the train-mode forward with dropout
        active; best-snapshot then selects by noisy TVD). Used by the
        quality-parity attribution study in BASELINE.md."""
        if resume_state_path and not chunk_epochs:
            raise ValueError("resume_state_path requires chunk_epochs")
        if eval_convention not in ("deterministic", "train_noisy"):
            raise ValueError(f"unknown eval_convention {eval_convention!r}")
        noisy_eval = eval_convention == "train_noisy"
        x_cond = self._x_cond_tensor(x_observation_dict)
        self._x_condition = x_cond
        op = self.build_operator(x_observation_dict)
        posterior_vec = _posterior_vec_from(true_posterior_for_tvd, self.num_latent_vars, self.dtype)
        optimizer = make_optimizer(optimizer_type, lr_born_machine, num_epochs,
                                   use_lr_scheduler, adam_betas, gradient_clip_norm)
        bm = self.born_machine

        def probs_fn(p, rng):
            return bm.probs(p, x_cond, train=True, dropout_rng=rng)

        def eval_probs_fn(p):
            return bm.probs(p, x_cond)

        track = posterior_vec is not None

        def _run(p0, k, tables, post):
            return run_ksd_scan(
                probs_fn=probs_fn, eval_probs_fn=eval_probs_fn, params0=p0, op=op,
                num_epochs=num_epochs, optimizer=optimizer,
                entropy_weight=entropy_weight, posterior_vec=post,
                early_stopping=track, patience=patience, key=k,
                log_every=(max(1, num_epochs // 20)
                           if verbose and scan_logging_supported() else 0),
                stein_args=tables, chunk_epochs=chunk_epochs,
                resume_state_path=resume_state_path,
                noisy_eval=noisy_eval,
                chunk_progress=verbose and not scan_logging_supported(),
            )

        if chunk_epochs:
            # Chunked mode manages its own per-chunk jit (see run_ksd_scan).
            run = _run if track else (lambda p0, k, tables: _run(p0, k, tables, None))
        else:
            run = jax.jit(_run) if track else jax.jit(lambda p0, k, tables: _run(p0, k, tables, None))
        from ..train.profiling import profile_trace
        from .common import highest_matmul_precision

        t0 = time.perf_counter()
        with profile_trace(profile_dir), highest_matmul_precision():
            key0 = jax.random.PRNGKey(self.seed if seed is None else seed)
            out = (run(self.params, key0, op.args(), posterior_vec) if track
                   else run(self.params, key0, op.args()))
            force_fetch(out["loss_ksd"])
        elapsed = time.perf_counter() - t0

        stopped = np.asarray(out["stopped"])
        stop_epoch = int(stopped.argmax()) + 1 if stopped.any() else num_epochs
        self.params = out["params"]
        self.best_params_ = out["best_params"]
        self.best_tvd_ = float(out["best_tvd"])
        self.best_epoch_ = int(out["best_epoch"])

        history = history_to_numpy(
            {k: out[k] for k in ("loss_ksd", "tvd", "grad_norm", "entropy")},
            length=stop_epoch,
        )
        # Rate over the epochs actually dispatched THIS invocation (a resumed
        # chunked run skips completed chunks; dividing the full stop_epoch by
        # the remaining-chunks wall time would inflate the metric).
        ran = min(stop_epoch, out["epochs_dispatched"])
        history["epochs_per_sec"] = ran / elapsed if elapsed > 0 else float("inf")
        history["train_seconds"] = elapsed
        history["num_skipped_updates"] = int(np.asarray(out["skipped"]).sum())
        steady = steady_epochs_per_sec(out["chunk_seconds"])
        if steady is not None:
            # Post-compile engine-body rate (incl. per-epoch TVD eval +
            # best-snapshot) — the number a long run sustains.
            history["epochs_per_sec_steady"] = steady
        self.history_ = history

        if posterior_vec is not None and np.isfinite(self.best_tvd_) and noisy_eval:
            # Reference convention: best_tvd was measured on a dropout-noisy
            # forward that is not reproducible post-hoc; restore the
            # deterministic distribution at the best parameters without the
            # exact-match drift verification.
            if verbose:
                print(f"Restoring best parameters (noisy-eval TVD: "
                      f"{self.best_tvd_:.6f} from epoch {self.best_epoch_ + 1})")
            bm.set_fixed_probs(out["best_probs"])
        elif posterior_vec is not None and np.isfinite(self.best_tvd_):
            if verbose:
                print(f"Restoring best probabilities (TVD: {self.best_tvd_:.6f} "
                      f"from epoch {self.best_epoch_ + 1})")
            # Fixed-probs restore + verification (ksd_vi.py:199-214).
            bm.set_fixed_probs(out["best_probs"])
            final_q = bm.get_prob_dict(self.params, x_cond)
            final_tvd = calculate_tvd(
                true_posterior_for_tvd
                if isinstance(true_posterior_for_tvd, dict)
                else {t: float(posterior_vec[i]) for i, t in enumerate(self.all_latent_states_tuples)},
                final_q,
            )
            if abs(final_tvd - self.best_tvd_) > 1e-6:
                print(f"WARNING: restoration drift — expected TVD {self.best_tvd_:.6f}, "
                      f"got {final_tvd:.6f}")
            elif verbose:
                print(f"Successfully restored best probabilities! Final TVD: {final_tvd:.6f}")
        if checkpoint_path:
            from ..train import save_checkpoint, training_bundle

            save_checkpoint(checkpoint_path, training_bundle(
                self.params, best_params=self.best_params_,
                best_tvd=jnp.asarray(self.best_tvd_),
                epoch=jnp.asarray(stop_epoch)))
        if verbose:
            print(f"KSD training: {stop_epoch} epochs in {elapsed:.3f}s "
                  f"({history['epochs_per_sec']:.1f} epochs/s)")
        return history

    def get_prob_dict(self, x_condition=None) -> dict:
        return self.born_machine.get_prob_dict(
            self.params, self._x_condition if x_condition is None else x_condition
        )


class QuantumKSDVariationalInference:
    """Quantum-Born-machine KSD engine. Parity: ``ksd_vi_quantum.py:18-192``.

    Constructor keywords mirror the reference's ``qbm_*`` names; the
    PennyLane device name is accepted and ignored (the in-framework
    statevector simulator is always used).
    """

    def __init__(self, bayesian_network: BayesianNetwork, latent_vars_names: Sequence[str],
                 observed_vars_names: Sequence[str], qbm_num_latent_vars: int,
                 qbm_ansatz_layers: int = 1, qbm_conditioning_dim: int = 0,
                 qbm_pennylane_device_name: str = "default.qubit",
                 qbm_ansatz_type: str = "hardware_efficient",
                 qbm_init_method: str = "small_random",
                 base_kernel_length_scale: float = 1.0, dtype=jnp.float32,
                 dense: Optional[bool] = None, seed: int = 0,
                 qbm_backend: str = "auto", qbm_edges=None):
        del qbm_pennylane_device_name  # simulator is in-framework
        if qbm_ansatz_type == "bn_structured" and qbm_edges is None:
            from ..sim.structured import latent_edges

            qbm_edges = latent_edges(bayesian_network, latent_vars_names)
        self.bn = bayesian_network
        self.latent_vars_names = list(latent_vars_names)
        self.observed_vars_names = list(observed_vars_names)
        self.num_latent_vars = qbm_num_latent_vars
        self.num_observed_vars = len(observed_vars_names)
        self.base_kernel_length_scale = resolve_length_scale(
            base_kernel_length_scale, self.num_latent_vars)
        self.dtype = dtype
        self.dense = dense
        self.seed = seed
        self.born_machine = QuantumBornMachine(
            num_latent_vars=qbm_num_latent_vars, ansatz_layers=qbm_ansatz_layers,
            conditioning_dim=qbm_conditioning_dim, ansatz_type=qbm_ansatz_type,
            init_method=qbm_init_method, backend=qbm_backend, edges=qbm_edges,
        )
        self.params = self.born_machine.init(jax.random.PRNGKey(seed))
        self._all_latent_states_tuples: Optional[list] = None
        self.history_: Optional[dict] = None

    @property
    def all_latent_states_tuples(self) -> list:
        # Lazy for the same reason as the classical engine's: 2^n tuples are
        # a dict-API convenience, not a training dependency (n = 24 exact
        # runs would otherwise pay ~8 GB host RAM in the constructor).
        if self._all_latent_states_tuples is None:
            self._all_latent_states_tuples = generate_all_binary_outcomes(
                self.num_latent_vars)
        return self._all_latent_states_tuples

    def build_operator(self, x_observation_dict, temper_beta: float = 1.0) -> SteinOperator:
        t = self.bn.conditional_joint_table(self.latent_vars_names, x_observation_dict)
        S = score_table(t)
        if temper_beta != 1.0:
            # Tempered target p^β: the discrete score s = 1 - p(flip)/p maps
            # to s_β = 1 - (p(flip)/p)^β = 1 - (1 - s)^β; the zero-prob guard
            # rows (s = 0) are fixed points, so the guard is preserved.
            S = 1.0 - np.power(1.0 - S, temper_beta)
        return SteinOperator(S, self.num_latent_vars, self.base_kernel_length_scale,
                            dtype=self.dtype, dense=self.dense)

    def train(self, x_observation_dict: Dict[str, int], num_epochs: int,
              lr_born_machine: float, verbose: bool = True,
              true_posterior_for_tvd=None, use_lr_scheduler: bool = True,
              gradient_clip_norm: float = 10.0, optimizer_type: str = "adam",
              adam_betas=(0.9, 0.999), seed: Optional[int] = None,
              checkpoint_path: Optional[str] = None,
              profile_dir: Optional[str] = None,
              chunk_epochs: Optional[int] = None,
              resume_state_path: Optional[str] = None,
              temper_betas: Optional[Sequence[float]] = None) -> dict:
        """``temper_betas`` (requires ``chunk_epochs``): per-chunk inverse
        temperatures — chunk i trains against the annealed target p^β[i]
        (β past the end of the list holds at its last value; end the list
        with 1.0 to finish on the true posterior). TVD is always tracked
        against the UNtempered posterior, so best-snapshot restore still
        selects by true quality."""
        if resume_state_path and not chunk_epochs:
            raise ValueError("resume_state_path requires chunk_epochs")
        if temper_betas is not None and not chunk_epochs:
            raise ValueError("temper_betas requires chunk_epochs")
        if self.num_observed_vars > 0 and set(x_observation_dict) != set(self.observed_vars_names):
            raise ValueError("Keys in x_observation_dict must match self.observed_vars_names.")
        op = self.build_operator(x_observation_dict)
        posterior_vec = _posterior_vec_from(true_posterior_for_tvd, self.num_latent_vars, self.dtype)
        optimizer = make_optimizer(optimizer_type, lr_born_machine, num_epochs,
                                   use_lr_scheduler, adam_betas, gradient_clip_norm)
        bm = self.born_machine
        # Conditioned QBM (angle-embedding, beyond the reference's warn-only
        # stub): feed the observation vector into the circuit.
        x_cond = None
        if bm.conditioning_dim > 0 and self.num_observed_vars > 0:
            x_cond = jnp.asarray(
                [x_observation_dict[nm] for nm in self.observed_vars_names],
                dtype=jnp.float32,
            )

        def probs_fn(p, rng):
            del rng
            return bm.probs(p, x_cond).astype(self.dtype)

        def eval_probs_fn(p):
            return bm.probs(p, x_cond).astype(self.dtype)

        track = posterior_vec is not None

        schedule = None
        if temper_betas is not None:
            betas = [float(b) for b in temper_betas]
            cache: dict = {}

            def schedule(chunk_index):
                beta = betas[min(chunk_index, len(betas) - 1)]
                if beta not in cache:
                    cache[beta] = (op.args() if beta == 1.0 else
                                   self.build_operator(x_observation_dict,
                                                       temper_beta=beta).args())
                return cache[beta]

        def _run(p0, k, tables, post):
            return run_ksd_scan(
                probs_fn=probs_fn, eval_probs_fn=eval_probs_fn, params0=p0, op=op,
                num_epochs=num_epochs, optimizer=optimizer, entropy_weight=None,
                posterior_vec=post, early_stopping=False, patience=0, key=k,
                log_every=(max(1, num_epochs // 20)
                           if verbose and scan_logging_supported() else 0),
                stein_args=tables, chunk_epochs=chunk_epochs,
                resume_state_path=resume_state_path,
                stein_args_schedule=schedule,
                chunk_progress=verbose and not scan_logging_supported(),
                # quantum probs are deterministic (no dropout), so the TVD
                # eval reuses the loss forward — one circuit fwd per epoch.
                reuse_loss_forward_for_eval=True,
            )

        if chunk_epochs:
            # Chunked mode manages its own per-chunk jit (see run_ksd_scan).
            run = _run if track else (lambda p0, k, tables: _run(p0, k, tables, None))
        else:
            run = jax.jit(_run) if track else jax.jit(lambda p0, k, tables: _run(p0, k, tables, None))
        from ..train.profiling import profile_trace
        from .common import highest_matmul_precision

        t0 = time.perf_counter()
        with profile_trace(profile_dir), highest_matmul_precision():
            key0 = jax.random.PRNGKey(self.seed if seed is None else seed)
            out = (run(self.params, key0, op.args(), posterior_vec) if track
                   else run(self.params, key0, op.args()))
            force_fetch(out["loss_ksd"])
        elapsed = time.perf_counter() - t0

        self.params = out["params"]
        self._x_condition = x_cond
        self.best_params_ = out["best_params"]
        self.best_tvd_ = float(out["best_tvd"])
        self.best_epoch_ = int(out["best_epoch"])
        history = history_to_numpy(
            {k: out[k] for k in ("loss_ksd", "tvd", "grad_norm")}
        )
        # Rate over the epochs dispatched THIS invocation (see classical
        # engine note — resumed runs only pay for the remaining chunks).
        history["epochs_per_sec"] = (out["epochs_dispatched"] / elapsed
                                     if elapsed > 0 else float("inf"))
        history["train_seconds"] = elapsed
        history["num_skipped_updates"] = int(np.asarray(out["skipped"]).sum())
        steady = steady_epochs_per_sec(out["chunk_seconds"])
        if steady is not None:
            # Post-compile engine-body rate (incl. per-epoch TVD eval +
            # best-snapshot) — the number a long run sustains.
            history["epochs_per_sec_steady"] = steady
        self.history_ = history

        if posterior_vec is not None and np.isfinite(self.best_tvd_):
            # Reference restores best params only under verbose and without a
            # deep copy (ksd_vi_quantum.py:173-175, 187-190); here the best
            # snapshot is a real on-device copy and is always restored.
            if verbose:
                print(f"Restoring best parameters (TVD: {self.best_tvd_:.6f})")
            self.params = self.best_params_
        if checkpoint_path:
            from ..train import save_checkpoint, training_bundle

            save_checkpoint(checkpoint_path, training_bundle(
                self.params, best_params=self.best_params_,
                best_tvd=jnp.asarray(self.best_tvd_)))
        if verbose:
            print(f"Quantum KSD training: {num_epochs} epochs in {elapsed:.3f}s "
                  f"({history['epochs_per_sec']:.1f} epochs/s)")
        return history

    def get_prob_dict(self, x_condition=None) -> dict:
        if x_condition is None:
            x_condition = getattr(self, "_x_condition", None)
        return self.born_machine.get_prob_dict(self.params, x_condition)
