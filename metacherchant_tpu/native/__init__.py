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


def _build_lib(src: str, lib: str, extra: tuple[str, ...] = ()) -> str | None:
    try:
        src_mtime = os.path.getmtime(src)
        if os.path.exists(lib) and os.path.getmtime(lib) >= src_mtime:
            return lib
        tmp = lib + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp,
             *extra],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, lib)
        return lib
    except Exception:
        return None


def _build() -> str | None:
    return _build_lib(_SRC, _LIB, ("-lz",))


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
        lib.fastio_parse_reads.restype = ctypes.c_int
        lib.fastio_parse_reads.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
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


# ---------------------------------------------------------------------------
# Native FIFO environment-BFS engine (bfs.cpp)
# ---------------------------------------------------------------------------

_BFS_SRC = os.path.join(_HERE, "bfs.cpp")
_BFS_LIB = os.path.join(_HERE, "_libbfs.so")
_bfs_lib = None
_bfs_tried = False


def _load_bfs():
    global _bfs_lib, _bfs_tried
    with _lock:
        if _bfs_tried:
            return _bfs_lib
        _bfs_tried = True
        if os.environ.get("MC_NATIVE_BFS") == "0":
            return None
        path = _build_lib(_BFS_SRC, _BFS_LIB)
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.mc_bfs_exact.restype = ctypes.c_int
        lib.mc_bfs_exact.argtypes = [
            i64p, i32p, ctypes.c_int64, i64p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(i64p), i64p, ctypes.POINTER(i64p), i64p]
        lib.mc_bfs_hashed.restype = ctypes.c_int
        lib.mc_bfs_hashed.argtypes = [
            i64p, i32p, ctypes.c_int64, u8p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(u8p), i64p, ctypes.POINTER(u8p), i64p]
        lib.mc_bfs_free.restype = None
        lib.mc_bfs_free.argtypes = [ctypes.c_void_p]
        _bfs_lib = lib
        return _bfs_lib


def bfs_available() -> bool:
    return _load_bfs() is not None


def _as_i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def bfs_exact(map_keys: np.ndarray, map_counts: np.ndarray,
              seeds: np.ndarray, k: int, min_occ: int, direction: int,
              max_radius: int | None, max_kmers: int | None,
              collect_last: bool) -> tuple[np.ndarray, np.ndarray]:
    """Native FIFO BFS, exact regime. Returns (visited, last) sorted codes."""
    lib = _load_bfs()
    map_keys = np.ascontiguousarray(map_keys, np.int64)
    map_counts = np.ascontiguousarray(map_counts, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    vis_p, last_p = i64p(), i64p()
    nvis, nlast = ctypes.c_int64(), ctypes.c_int64()
    rc = lib.mc_bfs_exact(
        _as_i64p(map_keys),
        map_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        map_keys.size, _as_i64p(seeds), seeds.size,
        k, min_occ, direction,
        -1 if max_radius is None else int(max_radius),
        -1 if max_kmers is None else int(max_kmers),
        1 if collect_last else 0,
        ctypes.byref(vis_p), ctypes.byref(nvis),
        ctypes.byref(last_p), ctypes.byref(nlast))
    if rc != 0:
        raise NativeIOError(f"mc_bfs_exact rc={rc}")
    try:
        vis = np.ctypeslib.as_array(vis_p, shape=(max(nvis.value, 1),))
        vis = vis[: nvis.value].copy()
        last = np.ctypeslib.as_array(last_p, shape=(max(nlast.value, 1),))
        last = last[: nlast.value].copy()
    finally:
        lib.mc_bfs_free(vis_p)
        lib.mc_bfs_free(last_p)
    return vis, last


def bfs_hashed(map_keys: np.ndarray, map_counts: np.ndarray,
               seeds: np.ndarray, k: int, min_occ: int, direction: int,
               max_radius: int | None, max_kmers: int | None, hasher: str,
               collect_last: bool) -> tuple[np.ndarray, np.ndarray]:
    """Native FIFO BFS, hashed regime. seeds: (N, k) uint8 oriented rows.
    Returns ((nvis, k), (nlast, k)) uint8 state rows (unordered)."""
    lib = _load_bfs()
    map_keys = np.ascontiguousarray(map_keys, np.int64)
    map_counts = np.ascontiguousarray(map_counts, np.int32)
    seeds = np.ascontiguousarray(seeds, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    vis_p, last_p = u8p(), u8p()
    nvis, nlast = ctypes.c_int64(), ctypes.c_int64()
    rc = lib.mc_bfs_hashed(
        _as_i64p(map_keys),
        map_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        map_keys.size, seeds.ctypes.data_as(u8p), seeds.shape[0],
        k, min_occ, direction,
        -1 if max_radius is None else int(max_radius),
        -1 if max_kmers is None else int(max_kmers),
        {"poly": 0, "fnv1a": 1}[hasher],
        1 if collect_last else 0,
        ctypes.byref(vis_p), ctypes.byref(nvis),
        ctypes.byref(last_p), ctypes.byref(nlast))
    if rc != 0:
        raise NativeIOError(f"mc_bfs_hashed rc={rc}")
    try:
        vis = np.ctypeslib.as_array(vis_p, shape=(max(nvis.value * k, 1),))
        vis = vis[: nvis.value * k].copy().reshape(nvis.value, k)
        last = np.ctypeslib.as_array(last_p, shape=(max(nlast.value * k, 1),))
        last = last[: nlast.value * k].copy().reshape(nlast.value, k)
    finally:
        lib.mc_bfs_free(vis_p)
        lib.mc_bfs_free(last_p)
    return vis, last


def parse_reads(path: str, qoffset: int = 33
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whole-read FASTQ parse, NO N-splitting (classifier-family semantics,
    io/readers.py::iter_dnaq): returns (codes int8 (total,),
    phred int16 (total,), offsets int64 (n_reads+1,)); read i is
    codes[offsets[i]:offsets[i+1]]. Raises NativeIOError on failure."""
    lib = _load()
    if lib is None:
        raise NativeIOError("native fastio unavailable")
    codes_p = ctypes.POINTER(ctypes.c_int8)()
    phred_p = ctypes.POINTER(ctypes.c_int16)()
    offs_p = ctypes.POINTER(ctypes.c_int64)()
    n_reads = ctypes.c_int64()
    total = ctypes.c_int64()
    errbuf = ctypes.create_string_buffer(512)
    rc = lib.fastio_parse_reads(str(path).encode(), qoffset,
                                ctypes.byref(codes_p), ctypes.byref(phred_p),
                                ctypes.byref(offs_p), ctypes.byref(n_reads),
                                ctypes.byref(total), errbuf, len(errbuf))
    if rc != 0:
        raise NativeIOError(errbuf.value.decode(errors="replace"))
    try:
        codes = np.ctypeslib.as_array(
            codes_p, shape=(max(total.value, 1),))[: total.value].copy()
        phred = np.ctypeslib.as_array(
            phred_p, shape=(max(total.value, 1),))[: total.value].copy()
        offs = np.ctypeslib.as_array(offs_p, shape=(n_reads.value + 1,)).copy()
    finally:
        lib.fastio_free(codes_p)
        lib.fastio_free(phred_p)
        lib.fastio_free(offs_p)
    return codes, phred, offs
