"""Mesh-aware engine context for kernel/engine gates.

Mosaic (Pallas) custom calls carry no SPMD partitioning rule, so they
must never appear inside a >1-device GSPMD-partitioned jit program —
either the surrounding code routes them per shard through an explicit
``shard_map`` (models/fast_path_spatial.py) or the gate falls back to
the XLA path, which partitions fine.  Backend checks alone
(``jax.default_backend() == "tpu"``) can't see the mesh, so sharded
step/serve builders wrap their traced bodies in :func:`gspmd_trace` and
the gates consult :func:`mosaic_ok` instead (round-4 VERDICT item 2;
the reference has no distributed execution at all — SURVEY §2.4).

Tracing under ``jit`` is synchronous, so a context manager active
during the trace is seen by every gate the traced function reaches.
"""

from __future__ import annotations

import contextlib

import jax

_GSPMD_DEVICES = 1


@contextlib.contextmanager
def gspmd_trace(n_devices: int):
    """Mark code traced inside this context as targeting an
    ``n_devices``-device GSPMD program (1 = unpartitioned)."""
    global _GSPMD_DEVICES
    prev = _GSPMD_DEVICES
    _GSPMD_DEVICES = max(1, int(n_devices))
    try:
        yield
    finally:
        _GSPMD_DEVICES = prev


def gspmd_devices() -> int:
    """Device count of the GSPMD program currently being traced."""
    return _GSPMD_DEVICES


def mosaic_ok() -> bool:
    """May the code being traced emit Mosaic (Pallas) custom calls?

    True only on a real TPU backend AND outside any >1-device GSPMD
    trace.  Code running per shard inside an explicit shard_map does not
    consult this — it calls its kernels directly by construction."""
    return jax.default_backend() == "tpu" and _GSPMD_DEVICES <= 1
