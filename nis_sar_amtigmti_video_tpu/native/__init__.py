"""Native (C++) runtime tier: build-on-demand ctypes bindings.

``sar_runtime.cpp`` holds the host-side hot paths (async .npy frame spiller,
constellation coverage statistics). The library is compiled on first use with
g++ into a per-user cache directory, keyed by a hash of the source so a
stale binary can never be dlopen'd against newer ctypes signatures; every
entry point has a pure-Python fallback so the framework works on hosts
without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sar_runtime.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build(out_path: str) -> bool:
    # build to a temp name then rename: atomic vs concurrent processes
    tmp = out_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out_path)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _lib_path() -> str:
    """Cache path embedding the source hash (never inside the package dir,
    which would dirty the worktree; never reused across source changes)."""
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    d = os.path.join(cache, "nis_sar_amtigmti_video_tpu")
    try:
        os.makedirs(d, exist_ok=True)
        if not os.access(d, os.W_OK):
            raise OSError
    except OSError:
        d = tempfile.gettempdir()
    return os.path.join(d, f"libsar_runtime-{h}.so")


def load() -> Optional[ctypes.CDLL]:
    """The compiled library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _lib_path()
        if os.path.exists(path) or _build(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                return None
            lib.rle_stats.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
            lib.per_sat_access.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double)]
            lib.spiller_create.restype = ctypes.c_void_p
            lib.spiller_create.argtypes = [ctypes.c_int]
            lib.spiller_submit.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
            lib.spiller_pending.restype = ctypes.c_int64
            lib.spiller_pending.argtypes = [ctypes.c_void_p]
            lib.spiller_errors.restype = ctypes.c_int64
            lib.spiller_errors.argtypes = [ctypes.c_void_p]
            lib.spiller_wait.argtypes = [ctypes.c_void_p]
            lib.spiller_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
            return _lib
        return None


def available() -> bool:
    return load() is not None


def rle_stats(covered: np.ndarray, dt_s: float):
    """(coverage_fraction, mean_gap, max_gap, mean_access, n_access, n_gaps)
    from a boolean covered[T] series. Native when available."""
    c = np.ascontiguousarray(np.asarray(covered, np.uint8))
    lib = load()
    if lib is not None:
        out = (ctypes.c_double * 6)()
        lib.rle_stats(c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      c.size, dt_s, out)
        return tuple(out)
    # fallback
    covered_b = c.astype(bool)
    frac = float(covered_b.mean()) if c.size else 0.0
    gaps, accs = [], []
    run, state = 0, covered_b[0] if c.size else False
    for v in covered_b:
        if v == state:
            run += 1
        else:
            (accs if state else gaps).append(run * dt_s)
            run, state = 1, v
    if c.size:
        (accs if state else gaps).append(run * dt_s)
    return (frac,
            float(np.mean(gaps)) if gaps else 0.0,
            float(np.max(gaps)) if gaps else 0.0,
            float(np.mean(accs)) if accs else 0.0,
            float(len(accs)), float(len(gaps)))


def per_sat_access(valid: np.ndarray, dt_s: float):
    """(seconds_of_access[N], first_access_time[N] or -1) per satellite from
    a (T, N) validity matrix."""
    v = np.ascontiguousarray(np.asarray(valid, np.uint8))
    t_steps, n_sats = v.shape
    lib = load()
    if lib is not None:
        counts = np.zeros(n_sats)
        first = np.zeros(n_sats)
        lib.per_sat_access(v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           t_steps, n_sats, dt_s,
                           counts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                           first.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return counts, first
    counts = v.astype(bool).sum(axis=0) * dt_s
    first = np.full(n_sats, -1.0)
    any_t, any_s = np.nonzero(v)
    for t, s in zip(any_t, any_s):
        if first[s] < 0:
            first[s] = t * dt_s
    return counts.astype(float), first


class FrameSpiller:
    """Asynchronous frame writer: submit() returns immediately; worker
    threads serialize .npy files off the device loop. Falls back to inline
    numpy.save when the native library is unavailable."""

    def __init__(self, num_threads: int = 4):
        self._lib = load()
        self._h = (self._lib.spiller_create(num_threads)
                   if self._lib is not None else None)

    def submit(self, path: str, array: np.ndarray):
        # Both backends must produce the same file: normalize the name to
        # end in .npy and store float32/complex64 regardless of which
        # backend runs (the stack a resume reads must not depend on whether
        # g++ was available on the writing host).
        if not path.endswith(".npy"):
            path += ".npy"
        is_c = np.iscomplexobj(array)
        a = np.ascontiguousarray(
            np.asarray(array, np.complex64 if is_c else np.float32))
        if self._h is None:
            np.save(path, a)
            return
        flat = a.view(np.float32) if is_c else a
        shape = (ctypes.c_int64 * a.ndim)(*a.shape)
        self._lib.spiller_submit(
            self._h, path.encode(),
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            flat.size, a.ndim, shape, 1 if is_c else 0)

    @property
    def pending(self) -> int:
        return int(self._lib.spiller_pending(self._h)) if self._h else 0

    @property
    def errors(self) -> int:
        return int(self._lib.spiller_errors(self._h)) if self._h else 0

    def wait(self):
        if self._h is not None:
            self._lib.spiller_wait(self._h)

    def close(self):
        if self._h is not None:
            self._lib.spiller_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.wait()
        self.close()
