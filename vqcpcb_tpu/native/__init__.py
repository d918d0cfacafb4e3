"""ctypes bindings for the native host-pipeline kernels (tokenizer.cpp).

`lib()` returns the loaded shared library or None; callers fall back to the
NumPy implementations. The library is BUILT ON DEMAND into a
content-addressed cache (~/.cache/vqcpcb_tpu/libvqcpcb_native-<src-hash>.so,
override dir with VQCPCB_NATIVE_CACHE) — no binary ships in the tree, and a
source edit can never silently run against a stale build because the hash
changes the path. VQCPCB_NATIVE=0 disables the native path entirely;
scripts/build_native.sh pre-builds the same cache path without Python.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_SRC_PATH = os.path.join(os.path.dirname(__file__), "tokenizer.cpp")
_lib = None
_tried = False


def _cache_dir() -> str:
    return os.environ.get(
        "VQCPCB_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "vqcpcb_tpu"))


def lib_path() -> str:
    """Content-addressed build product path for the current source."""
    with open(_SRC_PATH, "rb") as f:
        src_hash = hashlib.sha1(f.read()).hexdigest()[:12]
    return os.path.join(_cache_dir(), f"libvqcpcb_native-{src_hash}.so")


def build() -> Optional[str]:
    """Compile tokenizer.cpp into the cache (no-op when already built for
    this exact source). Returns the library path, or None when no compiler
    is available / the build fails."""
    path = lib_path()
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC_PATH],
            check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return None
    os.replace(tmp, path)          # atomic under concurrent builders
    return path


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _tried:
        _tried = True
        if os.environ.get("VQCPCB_NATIVE", "1") == "0":
            return None
        path = os.environ.get("VQCPCB_NATIVE_LIB") or build()
        if path and os.path.exists(path):
            try:
                _lib = ctypes.CDLL(path)
                _declare(_lib)
            except OSError:
                _lib = None     # wrong arch etc. — NumPy fallback
    return _lib


def _declare(l: ctypes.CDLL) -> None:
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    l.part_to_ticks.argtypes = [
        f64p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_int32, i32p]
    l.extract_windows.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.c_int64, i32p, i32p, i32p, i32p]
    l.build_negatives_same_seq.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, i32p]


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def part_to_ticks_native(offsets: np.ndarray, token_index: np.ndarray,
                         length: int, subdivision: int, offset_start: float,
                         slur_index: int) -> Optional[np.ndarray]:
    l = lib()
    if l is None:
        return None
    offsets = np.ascontiguousarray(offsets, dtype=np.float64)
    token_index = np.ascontiguousarray(token_index, dtype=np.int32)
    out = np.empty((length,), dtype=np.int32)
    l.part_to_ticks(_ptr(offsets, ctypes.c_double),
                    _ptr(token_index, ctypes.c_int32),
                    len(offsets), length, subdivision,
                    float(offset_start), int(slur_index),
                    _ptr(out, ctypes.c_int32))
    return out


def extract_windows_native(grid: np.ndarray, start_ticks: np.ndarray,
                           window_len: int, start_symbols, end_symbols,
                           pad_symbols) -> Optional[np.ndarray]:
    l = lib()
    if l is None:
        return None
    grid = np.ascontiguousarray(grid, dtype=np.int32)
    start_ticks = np.ascontiguousarray(start_ticks, dtype=np.int64)
    num_voices, length = grid.shape
    num_windows = len(start_ticks)
    out = np.empty((num_windows, num_voices, window_len), dtype=np.int32)
    sym = [np.ascontiguousarray(s, dtype=np.int32)
           for s in (start_symbols, end_symbols, pad_symbols)]
    l.extract_windows(_ptr(grid, ctypes.c_int32), num_voices, length,
                      _ptr(start_ticks, ctypes.c_int64), num_windows,
                      window_len,
                      _ptr(sym[0], ctypes.c_int32),
                      _ptr(sym[1], ctypes.c_int32),
                      _ptr(sym[2], ctypes.c_int32),
                      _ptr(out, ctypes.c_int32))
    return out


def build_negatives_same_seq_native(x_left: np.ndarray, x_right: np.ndarray,
                                    blocks_left: int, blocks_right: int,
                                    ticks_block: int) -> Optional[np.ndarray]:
    l = lib()
    if l is None:
        return None
    x_left = np.ascontiguousarray(x_left, dtype=np.int32)
    x_right = np.ascontiguousarray(x_right, dtype=np.int32)
    batch, _, voices = x_left.shape
    # the C++ kernel indexes raw pointers — validate the claimed geometry
    # against the actual array shapes before handing them over (a mismatch
    # would be a silent out-of-bounds read)
    assert x_left.shape[1] == blocks_left * ticks_block, (
        x_left.shape, blocks_left, ticks_block)
    assert x_right.shape[1] == blocks_right * ticks_block, (
        x_right.shape, blocks_right, ticks_block)
    num_neg = blocks_left + blocks_right - 1
    out = np.empty((batch, num_neg, blocks_right, ticks_block, voices),
                   dtype=np.int32)
    l.build_negatives_same_seq(
        _ptr(x_left, ctypes.c_int32), _ptr(x_right, ctypes.c_int32),
        batch, blocks_left, blocks_right, ticks_block, voices,
        _ptr(out, ctypes.c_int32))
    return out
