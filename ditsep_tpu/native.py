"""ctypes bindings for the native IO library (native/ditsep_io.cpp).

Auto-builds libditsep_io.so with g++ on first use (the JIT-build pattern of
the reference's torch.utils.cpp_extension.load, reference:
src/models/diffsep/ncsnpp_utils/op/__init__.py) and degrades gracefully to
the numpy/scipy paths when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libditsep_io.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _LIB_PATH.exists() and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.ditsep_load_wav_f32.restype = ctypes.c_long
        lib.ditsep_load_wav_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.ditsep_write_wav_pcm16.restype = ctypes.c_int
        lib.ditsep_write_wav_pcm16.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.c_int, ctypes.c_int]
        lib.ditsep_collate_center.restype = None
        lib.ditsep_collate_center.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_long), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_wav(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Native WAV load -> ((C, T) float32, fs); None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    try:
        # every supported sample format is >= 2 bytes/sample, so
        # filesize/2 always bounds the decoded sample count -- an exact
        # cheap cap instead of a fixed multi-hundred-MB buffer per call
        max_samples = os.path.getsize(path) // 2 + 64
    except OSError:
        return None
    buf = np.empty((max_samples,), np.float32)
    ch = ctypes.c_int(0)
    fs = ctypes.c_int(0)
    frames = lib.ditsep_load_wav_f32(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(ch), ctypes.byref(fs))
    if frames < 0:
        return None
    c = ch.value
    data = buf[: frames * c].reshape(frames, c).T.copy()
    return data, fs.value


def write_wav(path: str, data: np.ndarray, fs: int) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    d = np.ascontiguousarray(np.atleast_2d(data), np.float32)
    c, t = d.shape
    inter = np.ascontiguousarray(d.T)  # interleaved frames
    r = lib.ditsep_write_wav_pcm16(
        path.encode(), inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t, c, fs)
    return r == 0


def collate_center(signals: Sequence[np.ndarray], out_len: int
                   ) -> Optional[np.ndarray]:
    """Native centered collation of 1-D float32 signals -> (n, out_len)."""
    lib = get_lib()
    if lib is None:
        return None
    sigs = [np.ascontiguousarray(s.reshape(-1), np.float32)
            for s in signals]
    n = len(sigs)
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for s in sigs])
    lens = (ctypes.c_long * n)(*[s.shape[0] for s in sigs])
    out = np.empty((n, out_len), np.float32)
    lib.ditsep_collate_center(
        ptrs, lens, n, out_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
