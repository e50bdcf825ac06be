"""Failure handling — a principled version of the reference's fault story.

The reference wraps every training iteration in ``try/except:
traceback.print_exc(); pass`` (train.py:179,229-231): OOM/NaN/IO errors
are printed and silently skipped, and crash recovery is manual
resume-from-weights.  Here:

  * ``nonfinite_guard``  — a jit-compatible update filter: if any gradient
    or loss is non-finite, the whole update is skipped (params/opt_state
    unchanged) and a counter increments.  Deterministic, visible, and no
    silent divergence — the legitimate core of what the reference's
    blanket except was protecting against.
  * ``CheckpointOnSignal`` — SIGTERM/SIGINT handler that requests a final
    checkpoint before exit (preemption safety the reference lacks).
"""

from __future__ import annotations

import signal
from typing import Any, Tuple

import jax
import jax.numpy as jnp


def tree_all_finite(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    finite = jnp.array(True)
    for leaf in leaves:
        finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(leaf)))
    return finite


def apply_update_if_finite(old_state, new_state, loss: jnp.ndarray,
                           grads) -> Tuple[Any, jnp.ndarray]:
    """Select new_state only when loss and grads are finite.

    Returns (state, skipped_flag). Usable inside jit (pure select)."""
    ok = jnp.logical_and(jnp.isfinite(loss), tree_all_finite(grads))
    state = jax.tree.map(
        lambda new, old: jnp.where(ok, new, old), new_state, old_state)
    return state, jnp.logical_not(ok)


class CheckpointOnSignal:
    """``with CheckpointOnSignal() as stop: ... if stop.requested: save``"""

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = signals
        self.requested = False
        self._old = {}

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self):
        for s in self._signals:
            self._old[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, old in self._old.items():
            signal.signal(s, old)
        return False
