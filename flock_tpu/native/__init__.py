"""Build/load the native libraries (C++ → .so via g++, loaded with ctypes).

Two libraries, compiled on demand into the package directory (or a cache dir
if that is read-only).  No external deps.

* ``libflockgen.so``  — the NEXMark event generator fast path (flockgen.cpp)
* ``libflockcodec.so`` — the LZ4 payload codec (codec.cpp), used by
  runtime/payload.py when ``codec="lz4"``
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))

_libs: dict[str, ctypes.CDLL] = {}


def _build(src: str, out_path: str) -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
        "-o", out_path, src, "-lm",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load(src_name: str, lib_name: str) -> ctypes.CDLL:
    if lib_name in _libs:
        return _libs[lib_name]
    src = os.path.join(_HERE, src_name)
    candidates = [
        os.path.join(_HERE, lib_name),
        os.path.join(tempfile.gettempdir(), "flock_tpu", lib_name),
    ]
    for path in candidates:
        try:
            stale = (not os.path.exists(path)
                     or os.path.getmtime(path) < os.path.getmtime(src))
            if stale:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                _build(src, path)
            _libs[lib_name] = ctypes.CDLL(path)
            return _libs[lib_name]
        except (OSError, subprocess.CalledProcessError):
            continue
    raise RuntimeError(f"could not build or load {lib_name}")


def get_lib() -> ctypes.CDLL:
    """Compile (if stale/missing) and load libflockgen.so."""
    return _load("flockgen.cpp", "libflockgen.so")


def get_codec_lib() -> ctypes.CDLL:
    """Compile (if stale/missing) and load libflockcodec.so, with argtypes."""
    lib = _load("codec.cpp", "libflockcodec.so")
    if not getattr(lib, "_flock_typed", False):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.flock_lz4_max_compressed.restype = ctypes.c_int64
        lib.flock_lz4_max_compressed.argtypes = [ctypes.c_int64]
        for fn in (lib.flock_lz4_compress, lib.flock_lz4_decompress):
            fn.restype = ctypes.c_int64
            fn.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
        lib._flock_typed = True
    return lib


def get_snappy_lib() -> ctypes.CDLL:
    """Compile (if stale/missing) and load libflocksnappy.so, with argtypes
    (from-scratch Snappy block codec, snappy.cpp)."""
    lib = _load("snappy.cpp", "libflocksnappy.so")
    if not getattr(lib, "_flock_typed", False):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.flock_snappy_max_compressed.restype = ctypes.c_int64
        lib.flock_snappy_max_compressed.argtypes = [ctypes.c_int64]
        for fn in (lib.flock_snappy_compress, lib.flock_snappy_decompress):
            fn.restype = ctypes.c_int64
            fn.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
        lib._flock_typed = True
    return lib


def snappy_compress(data: bytes) -> bytes:
    lib = get_snappy_lib()
    cap = lib.flock_snappy_max_compressed(len(data))
    dst = ctypes.create_string_buffer(cap)
    src = (ctypes.c_uint8 * max(len(data), 1)).from_buffer_copy(data or b"\0")
    n = lib.flock_snappy_compress(
        ctypes.cast(src, ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise ValueError("snappy compression failed")
    return dst.raw[:n]


def snappy_decompress(data: bytes, out_size: int) -> bytes:
    lib = get_snappy_lib()
    dst = ctypes.create_string_buffer(max(out_size, 1))
    src = (ctypes.c_uint8 * max(len(data), 1)).from_buffer_copy(data or b"\0")
    n = lib.flock_snappy_decompress(
        ctypes.cast(src, ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)), out_size)
    if n != out_size:
        raise ValueError(f"snappy decompression failed ({n} != {out_size})")
    return dst.raw[:n]


def get_jsonl_lib() -> ctypes.CDLL:
    """Compile (if stale/missing) and load libflockjsonl.so, with argtypes."""
    lib = _load("jsonl.cpp", "libflockjsonl.so")
    if not getattr(lib, "_flock_typed", False):
        lib.flock_jsonl_parse_ints.restype = ctypes.c_int64
        lib.flock_jsonl_parse_ints.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib._flock_typed = True
    return lib


def jsonl_parse_int_columns(data: bytes, keys: list[str], max_rows: int):
    """Parse newline-delimited JSON objects into int64 columns for ``keys``
    (C-speed decode of the ingestion hot loop — transmute.rs:255-266
    analogue).  Returns {key: np.int64 array} or None when the rows are not
    flat integer objects (caller falls back to the Python parser)."""
    import numpy as np

    lib = get_jsonl_lib()
    out = np.empty((len(keys), max_rows), np.int64)
    n = lib.flock_jsonl_parse_ints(
        data, len(data), "\n".join(keys).encode(), len(keys),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_rows)
    if n < 0:
        return None
    return {k: out[i, :n].copy() for i, k in enumerate(keys)}


def lz4_compress(data: bytes) -> bytes:
    lib = get_codec_lib()
    cap = lib.flock_lz4_max_compressed(len(data))
    dst = ctypes.create_string_buffer(cap)
    src = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    n = lib.flock_lz4_compress(
        ctypes.cast(src, ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise ValueError("lz4 compression failed")
    return dst.raw[:n]


def lz4_decompress(data: bytes, out_size: int) -> bytes:
    lib = get_codec_lib()
    dst = ctypes.create_string_buffer(max(out_size, 1))
    src = (ctypes.c_uint8 * max(len(data), 1)).from_buffer_copy(data or b"\0")
    n = lib.flock_lz4_decompress(
        ctypes.cast(src, ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)), out_size)
    if n != out_size:
        raise ValueError(f"lz4 decompression failed ({n} != {out_size})")
    return dst.raw[:n]


def get_session_lib() -> ctypes.CDLL:
    """Compile (if stale/missing) and load libflocksession.so (per-epoch
    session key statistics, session.cpp)."""
    lib = _load("session.cpp", "libflocksession.so")
    if not getattr(lib, "_flock_argtypes", False):
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.flock_session_stats.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p,
        ]
        lib.flock_session_stats.restype = ctypes.c_int64
        lib._flock_argtypes = True
    return lib


def session_stats(keys, times, kmin: int, span: int):
    """(first_sec, last_sec) dense int64[span] tables for one epoch's rows
    (-1 where the key is absent).  Returns None when the native toolchain is
    unavailable (callers fall back to the numpy path)."""
    import numpy as np

    try:
        lib = get_session_lib()
    except RuntimeError:
        return None
    keys = np.ascontiguousarray(keys, np.int64)
    times = np.ascontiguousarray(times, np.int64)
    first = np.full(span, -1, np.int64)
    last = np.full(span, -1, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.flock_session_stats(
        keys.ctypes.data_as(i64p), times.ctypes.data_as(i64p),
        len(keys), kmin, span,
        first.ctypes.data_as(i64p), last.ctypes.data_as(i64p))
    if rc != 0:
        return None
    return first, last


def get_stage_lib() -> ctypes.CDLL:
    """Compile (if stale/missing) and load libflockstage.so (window staging:
    pad/rebase/convert in one streaming pass, stage.cpp)."""
    lib = _load("stage.cpp", "libflockstage.so")
    if not getattr(lib, "_flock_argtypes", False):
        vp = ctypes.c_void_p
        i64 = ctypes.c_int64
        lib.flock_min_i64.argtypes = [vp, i64]
        lib.flock_min_i64.restype = i64
        lib.flock_stage_sub_i64_i32.argtypes = [vp, vp, i64, i64, i64]
        lib.flock_stage_sub_i64_i32.restype = None
        lib.flock_stage_copy.argtypes = [vp, vp, i64, i64]
        lib.flock_stage_copy.restype = None
        lib._flock_argtypes = True
    return lib


def stage_column(arr, capacity: int, rebase_base: int | None):
    """One staged transfer buffer for a host column: int64 sources narrow to
    int32 (minus ``rebase_base`` when given — the timestamp rebase) and every
    dtype zero-pads to ``capacity`` rows, all in one native pass.  Returns
    None when the native toolchain is unavailable (numpy fallback)."""
    import numpy as np

    try:
        lib = get_stage_lib()
    except RuntimeError:
        return None
    arr = np.ascontiguousarray(arr)
    n = len(arr)
    if arr.dtype == np.int64:
        dst = np.empty(capacity, np.int32)
        lib.flock_stage_sub_i64_i32(
            arr.ctypes.data_as(ctypes.c_void_p),
            dst.ctypes.data_as(ctypes.c_void_p),
            n, capacity, rebase_base or 0)
        return dst
    dst = np.empty(capacity, arr.dtype)
    lib.flock_stage_copy(
        arr.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        n * arr.itemsize, capacity * arr.itemsize)
    return dst


def min_i64(arr) -> int | None:
    import numpy as np

    try:
        lib = get_stage_lib()
    except RuntimeError:
        return None
    arr = np.ascontiguousarray(arr, np.int64)
    return int(lib.flock_min_i64(
        arr.ctypes.data_as(ctypes.c_void_p), len(arr)))
