"""Orbax checkpointing: durable save/restore of params, optimizer state and
best-TVD snapshots.

The reference keeps best snapshots only in memory (``adversarial_vi.py:249-252``,
``ksd_vi_quantum.py:173-175``) and has no resume capability (SURVEY.md §5.4);
this module adds the disk-backed equivalent.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, state: Any, *, force: bool = True) -> str:
    """Save an arbitrary pytree (params / opt-state / best snapshot bundle)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=force)
    return path


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; ``target`` (matching structure of abstract arrays)
    guides dtypes/shapes when provided."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, "shape")
                else x,
                target,
            )
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def training_bundle(params, opt_state=None, best_params=None, best_tvd=None,
                    epoch=None) -> dict:
    """Canonical checkpoint layout for the engines."""
    bundle = {"params": params}
    if opt_state is not None:
        bundle["opt_state"] = opt_state
    if best_params is not None:
        bundle["best_params"] = best_params
    if best_tvd is not None:
        bundle["best_tvd"] = best_tvd
    if epoch is not None:
        bundle["epoch"] = epoch
    return bundle
