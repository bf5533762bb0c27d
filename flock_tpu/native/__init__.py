"""Build/load the native generator library (C++ → libflockgen.so via g++).

The shared library is compiled on demand into the package directory (or a
cache dir if that is read-only) and loaded with ctypes.  No external deps.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "flockgen.cpp")
_LIB_NAME = "libflockgen.so"

_lib = None


def _build(out_path: str) -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", out_path, _SRC, "-lm",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    """Compile (if stale/missing) and load libflockgen.so."""
    global _lib
    if _lib is not None:
        return _lib

    candidates = [
        os.path.join(_HERE, _LIB_NAME),
        os.path.join(tempfile.gettempdir(), "flock_tpu", _LIB_NAME),
    ]
    for path in candidates:
        try:
            stale = (not os.path.exists(path)
                     or os.path.getmtime(path) < os.path.getmtime(_SRC))
            if stale:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                _build(path)
            _lib = ctypes.CDLL(path)
            return _lib
        except (OSError, subprocess.CalledProcessError):
            continue
    raise RuntimeError("could not build or load libflockgen.so")
