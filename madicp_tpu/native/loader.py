"""ctypes binding for the native ``.bin`` scan loader.

The shared library is compiled from ``loader.cpp`` on first use with the
system ``g++`` (pybind11 is not part of this toolchain; ctypes over a C ABI
needs no build-time Python headers) and cached next to this file. When the
compiler or the cache directory is unavailable the loader reports
``available() == False`` and the readers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "loader.cpp"
_SO = _HERE / "_loader.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    try:
        with tempfile.NamedTemporaryFile(suffix=".so", dir=_HERE, delete=False) as tmp:
            tmp_path = Path(tmp.name)
        res = subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(tmp_path)],
            capture_output=True,
            timeout=120,
        )
        if res.returncode != 0:
            tmp_path.unlink(missing_ok=True)
            return False
        tmp_path.replace(_SO)  # atomic: concurrent imports see old or new
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists() and not _compile():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.madicp_read_bin.restype = ctypes.c_long
        lib.madicp_read_bin.argtypes = [
            ctypes.c_char_p, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ]
        lib.madicp_bin_records.restype = ctypes.c_long
        lib.madicp_bin_records.argtypes = [ctypes.c_char_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def read_bin(
    path,
    min_range: float,
    max_range: float,
    apply_correction: bool = False,
) -> np.ndarray:
    """Read, range-filter and (optionally) correct one ``.bin`` scan.

    Returns an (N, 3) float64 array, bitwise-matching the numpy fallback.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    p = str(path).encode()
    cap = lib.madicp_bin_records(p)
    if cap < 0:
        raise FileNotFoundError(path)
    out = np.empty((max(cap, 1), 3), np.float64)
    n = lib.madicp_read_bin(
        p,
        float(min_range),
        float(max_range),
        1 if apply_correction else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cap,
    )
    if n < 0:
        raise IOError(f"failed to read {path}")
    return out[:n]
