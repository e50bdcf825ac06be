"""ctypes bindings for the native chain-MRF solvers (``rpst/cpp``).

The C++ library mirrors the role PyMaxflow's C++ ``aexpansion_grid`` plays
in the reference (utils/mst.py:3,157): host-side combinatorial labeling.
The on-device ``ops.graphcut.chain_map_labeling`` is the default inside
jitted code; these bindings provide
  * ``chain_viterbi_cpp``    — exact DP (cross-checks the JAX kernel),
  * ``aexpansion_chain_cpp`` — the reference's α-expansion semantics,
  * ``chain_labeling_callback`` — a ``jax.pure_callback`` wrapper so jitted
    programs can route labeling through the native solver when desired.

The shared library is built lazily with ``make`` on first use.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_CPP_DIR = Path(__file__).resolve().parent.parent / "cpp"
_LIB_PATH = _CPP_DIR / "libgraphcut.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_CPP_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.chain_viterbi.argtypes = [dp, dp, ctypes.c_int64, ctypes.c_int64, ip]
    lib.chain_viterbi.restype = None
    lib.aexpansion_chain.argtypes = [dp, dp, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int32, ip]
    lib.aexpansion_chain.restype = None
    lib.chain_energy_of.argtypes = [dp, dp, ctypes.c_int64, ctypes.c_int64, ip]
    lib.chain_energy_of.restype = ctypes.c_double
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _as_c(D, V):
    D = np.ascontiguousarray(D, np.float64)
    V = np.ascontiguousarray(V, np.float64)
    C, k = D.shape
    assert V.shape == (k, k)
    return D, V, C, k


def chain_viterbi_cpp(D, V) -> np.ndarray:
    lib = _load()
    D, V, C, k = _as_c(D, V)
    out = np.zeros(C, np.int32)
    lib.chain_viterbi(D.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      V.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      C, k, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def aexpansion_chain_cpp(D, V, max_cycles: int = 0) -> np.ndarray:
    lib = _load()
    D, V, C, k = _as_c(D, V)
    out = np.zeros(C, np.int32)
    lib.aexpansion_chain(
        D.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        V.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        C, k, max_cycles,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def chain_energy_cpp(D, V, labels) -> float:
    lib = _load()
    D, V, C, k = _as_c(D, V)
    labels = np.ascontiguousarray(labels, np.int32)
    return float(lib.chain_energy_of(
        D.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        V.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        C, k, labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))))


def chain_labeling_callback(D, V):
    """Route chain labeling through the C++ solver from jitted code.

    Matches the reference's own host round-trip (utils/mst.py:153-158 moves
    tensors to CPU for aexpansion_grid), so callback latency is parity, not
    regression."""
    import jax

    def host_fn(D_np, V_np):
        return chain_viterbi_cpp(D_np, V_np).astype(np.int32)

    import jax.numpy as jnp
    out_shape = jax.ShapeDtypeStruct((D.shape[0],), jnp.int32)
    return jax.pure_callback(host_fn, out_shape, D.astype(jnp.float64),
                             V.astype(jnp.float64), vmap_method="sequential")
