"""ctypes bindings for the native image decode/resize path (``rpst/cpp``).

The reference's data path is torch ``DataLoader`` worker *processes* doing
PIL decode (reference ``train.py:160-170``) because CPython threads can't
parallelize Python-level decode.  Here the decode+resize is a C++ library
(libjpeg/libpng + a bit-exact port of PIL's fixed-point BILINEAR
resample), so the framework's threaded loader gets real OS-thread
parallelism through a plain ctypes call (which releases the GIL) — no
fork, no pickling, no worker-process lifecycle.

``load_image_native`` returns exactly what ``transforms.load_image``
returns (byte-identical before the /255 scale; see
``tests/test_native_io.py``), or ``None`` when the file needs PIL
(CMYK/16-bit/interlaced/exotic formats) so callers can fall back.

The shared library is built lazily with ``make`` on first use; set
``RPST_NATIVE_IO=0`` to disable the native path entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_CPP_DIR = Path(__file__).resolve().parent.parent / "cpp"
_LIB_PATH = _CPP_DIR / "libimageio.so"
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if os.environ.get("RPST_NATIVE_IO", "1") == "0":
        _lib_failed = True
        return None
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_CPP_DIR), "libimageio.so"],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        lib.rpst_load_image_rgb.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                            ctypes.c_int, fp]
        lib.rpst_load_image_rgb.restype = ctypes.c_int
        lib.rpst_image_size.argtypes = [ctypes.c_char_p, ip, ip]
        lib.rpst_image_size.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def load_image_native(path, img_size: int) -> Optional[np.ndarray]:
    """Decode+resize via the C++ library: f32 HWC in [0,1], or None.

    ``img_size == 0`` keeps the native resolution (probes dimensions
    first, like ``transforms.load_image`` skipping the resize)."""
    lib = _load()
    if lib is None:
        return None
    p = str(path).encode()
    if img_size:
        w = h = int(img_size)
    else:
        cw, ch = ctypes.c_int32(0), ctypes.c_int32(0)
        if lib.rpst_image_size(p, ctypes.byref(cw), ctypes.byref(ch)) != 0:
            return None
        w, h = cw.value, ch.value
    out = np.empty((h, w, 3), np.float32)
    rc = lib.rpst_load_image_rgb(
        p, w, h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None  # unsupported/corrupt → caller falls back to PIL
    return out
