"""Native (C++) host runtime components, loaded via ctypes.

fastio: FASTA/FASTQ(.gz) parsing + 2-bit packing -- the host-side hot loop of
read ingestion (the TPU analogue of the reference's reader/dispatcher stack,
src/io/ReadsDispatcher.java + itmo:io/readers/). Compiled on demand with the
system toolchain and cached next to the source; every result is
oracle-checked against the pure-Python readers in tests. BINQ and .bz2 stay
on the Python path.

Set MC_NATIVE_IO=0 to disable (Python fallback is always available).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastio.cpp")
_LIB = os.path.join(_HERE, "_libfastio.so")

_lock = threading.Lock()
_lib = None
_tried = False


class NativeIOError(RuntimeError):
    pass


def _build() -> str | None:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_mtime:
            return _LIB
        tmp = _LIB + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp,
             "-lz"],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return _LIB
    except Exception:
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("MC_NATIVE_IO") == "0":
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.fastio_parse.restype = ctypes.c_int
        lib.fastio_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_int]
        lib.fastio_free.restype = None
        lib.fastio_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def supports(fmt: str) -> bool:
    """Formats the native parser handles (others use the Python readers)."""
    return fmt in ("fasta", "fastq", "fasta.gz", "fastq.gz")


def parse_fragments(path: str, fmt: str, qoffset: int = 33
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Parse a whole file natively.

    Returns (codes int8 (total,), offsets int64 (n_frags+1,)); fragment i is
    codes[offsets[i]:offsets[i+1]]. Raises NativeIOError on parse failure.
    """
    lib = _load()
    if lib is None:
        raise NativeIOError("native fastio unavailable")
    base = fmt.split(".")[0]
    format_id = 0 if base == "fasta" else 1
    codes_p = ctypes.POINTER(ctypes.c_int8)()
    offs_p = ctypes.POINTER(ctypes.c_int64)()
    n_frags = ctypes.c_int64()
    total = ctypes.c_int64()
    errbuf = ctypes.create_string_buffer(512)
    rc = lib.fastio_parse(str(path).encode(), format_id, qoffset,
                          ctypes.byref(codes_p), ctypes.byref(offs_p),
                          ctypes.byref(n_frags), ctypes.byref(total),
                          errbuf, len(errbuf))
    if rc != 0:
        raise NativeIOError(errbuf.value.decode(errors="replace"))
    try:
        codes = np.ctypeslib.as_array(codes_p, shape=(max(total.value, 1),))
        codes = codes[: total.value].copy()
        offs = np.ctypeslib.as_array(offs_p, shape=(n_frags.value + 1,)).copy()
    finally:
        lib.fastio_free(codes_p)
        lib.fastio_free(offs_p)
    return codes, offs
