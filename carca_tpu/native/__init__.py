"""Native (C++) data-plane: build + ctypes bindings for the batch assembler.

The shared library is compiled on first use with the system ``g++`` (no
pybind11 in this image; plain C ABI + ctypes keeps the binding dependency-
free) and cached under ``~/.cache/carca_tpu`` keyed by source hash. Use
:func:`get_assembler` — returns ``None`` when no compiler is available, and
callers fall back to the numpy path (``DataConfig.use_native``).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assembler.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False

_i64 = ctypes.c_int64
_u64 = ctypes.c_uint64
_p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> Optional[str]:
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    cache = os.environ.get(
        "CARCA_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "carca_tpu"))
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"assembler_{digest}.so")
    if os.path.exists(so):
        return so
    # per-process tmp name: concurrent builders (pytest-xdist, multi-
    # process launches sharing the cache) must not interleave writes into
    # one file; os.replace publishes whichever finishes first, atomically
    tmp = f"{so}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as e:
        sys.stderr.write(f"carca_tpu.native: build failed ({e}); "
                         "using numpy assembler\n")
        return None
    os.replace(tmp, so)
    return so


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        so = _build()
        if so is None:
            _FAILED = True
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:  # corrupt/incompatible cached .so
            sys.stderr.write(f"carca_tpu.native: load failed ({e}); "
                             "using numpy assembler\n")
            _FAILED = True
            return None
        common = [_p_i32, _p_i64, _p_f32, _i64, _p_i64, _p_i64, _p_i64,
                  _i64, _i64]
        lib.carca_train_batch.restype = _i64
        lib.carca_train_batch.argtypes = common + [
            _i64, _u64, _i64, _p_i32, _p_f32, _p_i32, _p_f32, _p_f32]
        lib.carca_eval_batch.restype = _i64
        lib.carca_eval_batch.argtypes = common + [
            _i64, _i64, _u64, _i64, _p_i32, _p_f32, _p_i32, _p_f32, _p_f32]
        _LIB = lib
        return _LIB


class NativeAssembler:
    """Drop-in for ``BatchBuilder``'s ``native`` slot (same Batch contract
    as the numpy path; negatives use the library's own splitmix64 stream,
    seeded per call from the caller's numpy Generator for reproducibility)."""

    def __init__(self, lib: ctypes.CDLL, n_threads: Optional[int] = None):
        self._lib = lib
        self.n_threads = int(n_threads or min(8, os.cpu_count() or 1))

    def _common(self, builder, user_rows, mode):
        cat = builder.cat
        start, end = builder._windows[mode]
        rows = np.ascontiguousarray(np.asarray(user_rows, dtype=np.int64))
        return cat, np.ascontiguousarray(start.astype(np.int64)), \
            np.ascontiguousarray(end.astype(np.int64)), rows

    def train_batch(self, builder, user_rows, rng) -> Dict[str, np.ndarray]:
        cat, start, end, rows = self._common(builder, user_rows, "train")
        B, L, C = len(rows), builder.L, cat.n_ctx
        p_x = np.zeros((B, L), np.int32)
        p_c = np.zeros((B, L, C), np.float32)
        o_x = np.zeros((B, 2 * L), np.int32)
        o_c = np.zeros((B, 2 * L, C), np.float32)
        y = np.zeros((B, 2 * L), np.float32)
        alive = self._lib.carca_train_batch(
            cat.items, cat.offsets, cat.ctx_vals, C, start, end, rows, B, L,
            cat.n_items, np.uint64(rng.integers(0, 2**63)), self.n_threads,
            p_x, p_c, o_x, o_c, y)
        return {"p_x": p_x, "p_c": p_c, "o_x": o_x, "o_c": o_c,
                "y_true": y, "n_valid": np.int32(alive)}

    def eval_batch(self, builder, user_rows, rng, mode) -> Dict[str, np.ndarray]:
        cat, start, end, rows = self._common(builder, user_rows, mode)
        B, L, T, C = len(rows), builder.L, builder.T, cat.n_ctx
        p_x = np.zeros((B, L), np.int32)
        p_c = np.zeros((B, L, C), np.float32)
        o_x = np.zeros((B, T + 1), np.int32)
        o_c = np.zeros((B, T + 1, C), np.float32)
        y = np.zeros((B, T + 1), np.float32)
        alive = self._lib.carca_eval_batch(
            cat.items, cat.offsets, cat.ctx_vals, C, start, end, rows, B, L,
            T, cat.n_items, np.uint64(rng.integers(0, 2**63)), self.n_threads,
            p_x, p_c, o_x, o_c, y)
        return {"p_x": p_x, "p_c": p_c, "o_x": o_x, "o_c": o_c,
                "y_true": y, "n_valid": np.int32(alive)}


def get_assembler(n_threads: Optional[int] = None) -> Optional[NativeAssembler]:
    lib = _load()
    if lib is None:
        return None
    return NativeAssembler(lib, n_threads)
