"""Native (C++) host-pipeline kernels with transparent numpy fallback.

Compiled on first import with g++ into ``libdcvgan_host.so`` next to this
file (no external build deps; ~1s). The TPU compute path is JAX/XLA; this
library accelerates the *host* batch-assembly inner loops the way the
reference leans on torch's C++ DataLoader machinery.

Public API (all return float32 numpy arrays):
- ``normalize_u8(x, scale, shift)``  — x·scale + shift
- ``one_hot(labels, n_classes)``     — uint8 labels -> one-hot float32
- ``scale_f32(x, scale)``            — x·scale
- ``available()``                    — whether the native path is active
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "host_pipeline.cc"
_LIB = _HERE / "libdcvgan_host.so"

_lib: Optional[ctypes.CDLL] = None
_lock = threading.Lock()
_DEFAULT_THREADS = max(1, min(8, (os.cpu_count() or 4) // 2))


def _build() -> Optional[ctypes.CDLL]:
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-std=c++17", "-pthread", str(_SRC), "-o", str(_LIB),
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.normalize_u8_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ]
        lib.one_hot_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.scale_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int,
        ]
        return lib
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        with _lock:
            if _lib is None:
                _lib = _build() or False  # type: ignore[assignment]
    return _lib or None


def available() -> bool:
    return _get_lib() is not None


def normalize_u8(x: np.ndarray, divisor: float, shift: float) -> np.ndarray:
    """float32(x) / divisor + shift (e.g. divisor=127.5, shift=-1) —
    bit-identical to the numpy expression (division, not reciprocal)."""
    lib = _get_lib()
    x = np.ascontiguousarray(x, dtype=np.uint8)
    if lib is None:
        return x.astype(np.float32) / np.float32(divisor) + np.float32(shift)
    out = np.empty(x.shape, np.float32)
    lib.normalize_u8_to_f32(
        x.ctypes.data, out.ctypes.data, x.size,
        ctypes.c_float(divisor), ctypes.c_float(shift), _DEFAULT_THREADS,
    )
    return out


def one_hot(labels: np.ndarray, n_classes: int) -> np.ndarray:
    """uint8 labels (…,) -> float32 one-hot (…, n_classes).

    Out-of-range labels yield an all-zero row on BOTH paths (the C++
    kernel's semantics, matched by jax.nn.one_hot on device) — behavior
    must not depend on whether the native build succeeded.
    """
    lib = _get_lib()
    labels = np.ascontiguousarray(labels, dtype=np.uint8)
    if lib is None:
        eye = np.concatenate(
            [np.eye(n_classes, dtype=np.float32),
             np.zeros((max(0, 256 - n_classes), n_classes), np.float32)]
        )
        return eye[labels]
    out = np.zeros(labels.shape + (n_classes,), np.float32)
    lib.one_hot_f32(
        labels.ctypes.data, out.ctypes.data, labels.size,
        n_classes, _DEFAULT_THREADS,
    )
    return out


def scale_f32(x: np.ndarray, scale: float) -> np.ndarray:
    lib = _get_lib()
    x = np.ascontiguousarray(x, dtype=np.float32)
    if lib is None:
        return x * np.float32(scale)
    out = np.empty(x.shape, np.float32)
    lib.scale_f32(
        x.ctypes.data, out.ctypes.data, x.size,
        ctypes.c_float(scale), _DEFAULT_THREADS,
    )
    return out
