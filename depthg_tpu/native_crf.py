"""ctypes binding for the native permutohedral dense CRF (``native/crf``).

Host-side equivalent of the reference's pydensecrf path
(``src/crf.py:22-45``): lattice-approximated Gaussian + bilateral mean field.
Used to cross-validate the on-device ``ops.crf`` implementation and as a CPU
fallback. Builds the shared library on demand via make (g++ is in the image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "native", "crf")
_LIB_PATH = os.path.join(_SRC_DIR, "libpermutocrf.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _SRC_DIR], check=True, capture_output=True)
    _lib = ctypes.CDLL(_LIB_PATH)
    _lib.dense_crf_inference.restype = ctypes.c_int
    _lib.dense_crf_inference.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float,
    ]
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def dense_crf_native(image: np.ndarray, probs: np.ndarray, n_iters: int = 10,
                     pos_w: float = 3.0, pos_xy_std: float = 1.0,
                     bi_w: float = 4.0, bi_xy_std: float = 67.0,
                     bi_rgb_std: float = 3.0) -> np.ndarray:
    """image: [3, H, W] raw 0..255; probs: [C, H, W] softmax unary.
    Returns refined Q [C, H, W]."""
    lib = _load()
    c, h, w = probs.shape
    q = np.ascontiguousarray(probs.transpose(1, 2, 0).reshape(-1, c),
                             dtype=np.float32)
    img = np.ascontiguousarray(image.transpose(1, 2, 0).reshape(-1, 3),
                               dtype=np.float32)
    ret = lib.dense_crf_inference(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, c, n_iters, pos_w, pos_xy_std, bi_w, bi_xy_std, bi_rgb_std)
    if ret != 0:
        raise RuntimeError(f"dense_crf_inference failed: {ret}")
    return q.reshape(h, w, c).transpose(2, 0, 1)
