"""Unified checkpointing: {params, extra, opt_state, step, rng} per step.

The reference saves weights only, in per-model heterogeneous formats, and
parses the resume iteration from the checkpoint *filename*
(adain_rp.py:103-108, 178-185; SURVEY §2.3).  Here a single orbax pytree
checkpoint per step restores training exactly: optimizer state and RNG
included, step stored in the tree (and mirrored in the directory name for
human/legacy compatibility)."""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(root, step: int) -> Path:
    return Path(root).resolve() / f"{step}"


def save_checkpoint(root, state) -> str:
    """Write one checkpoint directory for ``state``.

    Multi-process: EVERY process must call this (orbax synchronizes
    internally — a lone caller deadlocks on the sync barrier).  Leaves are
    passed as global jax.Arrays so each process writes only the shards it
    owns; this covers replicated, DP, and cross-host TP state without a
    pre-gather.  Single-process keeps the plain host-numpy write."""
    step = int(state.step)
    path = _ckpt_dir(root, step)
    ckptr = ocp.PyTreeCheckpointer()
    if jax.process_count() > 1:
        tree = {"step": step, "params": state.params, "extra": state.extra,
                "opt_state": state.opt_state, "rng": state.rng}
    else:
        tree = {"step": step,
                "params": jax.device_get(state.params),
                "extra": jax.device_get(state.extra),
                "opt_state": jax.device_get(state.opt_state),
                "rng": jax.device_get(state.rng)}
    ckptr.save(path, tree, force=True)
    return str(path)


def latest_step(root) -> Optional[int]:
    root = Path(root)
    if not root.exists():
        return None
    steps = [int(p.name) for p in root.iterdir()
             if p.is_dir() and re.fullmatch(r"\d+", p.name)]
    return max(steps) if steps else None


def restore_checkpoint(path, template_state):
    """Restore into the structure of ``template_state`` (shapes/dtypes)."""
    ckptr = ocp.PyTreeCheckpointer()
    template = {"step": int(template_state.step),
                "params": jax.device_get(template_state.params),
                "extra": jax.device_get(template_state.extra),
                "opt_state": jax.device_get(template_state.opt_state),
                "rng": jax.device_get(template_state.rng)}
    # force numpy restore: checkpoints written by multi-process runs store
    # sharded jax.Arrays, which orbax refuses to deserialize without a
    # concrete sharding unless told to materialize host numpy instead
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template)
    tree = ckptr.restore(Path(path).resolve(), item=template,
                         restore_args=restore_args)
    return template_state.replace(
        step=np.asarray(tree["step"], np.int32),
        params=tree["params"], extra=tree["extra"],
        opt_state=tree["opt_state"], rng=tree["rng"])
