"""Orbax checkpointing of the FULL train state.

The reference checkpoints a hand-assembled dict and then forgets to restore
E / E_optimizer / Q_dummy on resume (`train_gen_recon.py:163-170,282-294`) —
a documented bug (SURVEY.md §5). Here the whole `DAMCState` pytree (params,
EMA params, all three optimizer states, PRNG key, step) is one checkpoint
atom, so resume is exact by construction. Best-metric checkpoints mirror the
reference's `best.pth.tar` gating (`train_gen_recon.py:307-320`).
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, name: str, state: Any) -> str:
    """Save `state` under <directory>/<name> (e.g. '100000' or 'best')."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, name))
    _checkpointer().save(path, state, force=True)
    return path


def restore_checkpoint(directory: str, name: str, target: Any) -> Any:
    """Restore into the structure of `target` (a template DAMCState).

    Multi-process: orbax's jax.Array deserialization demands concrete
    global shardings it cannot derive from a host-local template (it fails
    with "sharding ... should be specified"); every process instead reads
    the full tree as host numpy — equivalent values on all hosts — and the
    caller places/replicates them over its mesh (parallel.replicate is
    multi-host-aware)."""
    import jax

    path = os.path.abspath(os.path.join(directory, name))
    if jax.process_count() > 1:
        import numpy as np
        import orbax.checkpoint as ocp

        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), target
        )
        return _checkpointer().restore(
            path, item=target, restore_args=restore_args
        )
    restored = _checkpointer().restore(path, item=target)
    return restored


def latest_step(directory: str) -> Optional[int]:
    """Largest integer-named checkpoint in `directory`, or None.

    Torn directories from a hard-killed save are never picked up: orbax
    writes into a '<name>.orbax-checkpoint-tmp-*' staging dir and commits
    via atomic rename, and staging names fail the isdigit() filter."""
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
    return max(steps) if steps else None
