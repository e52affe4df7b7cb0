"""ctypes bindings for the native C++ training data loader.

The hot training input path (TFRecord framing, Example proto parsing, FACT
windowing, shuffle buffer) runs in a C++ reader thread
(``native/mint_loader.cc``) so Python never touches per-record bytes; each
``next()`` fills three preallocated NumPy batch buffers via memcpy.

The library builds on first use with ``make`` (g++ is a baseline tool in
the image); :func:`available` reports whether the fast path can be used,
and the Python pipeline (:mod:`mint_tpu.data.pipeline`) is the fallback.
Evaluation (single pass, variable-length audio) always uses the Python
path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmintloader.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        src = os.path.join(_NATIVE_DIR, "mint_loader.cc")

        def _stale():
            return (not os.path.exists(_LIB_PATH)
                    or (os.path.exists(src)
                        and os.path.getmtime(src)
                        > os.path.getmtime(_LIB_PATH)))

        def _build_locked(force: bool) -> bool:
            # Inter-PROCESS build lock (the module _lock only covers
            # threads): concurrent first-use builds (multi-process
            # training, pytest next to a train job) otherwise race on
            # the same .so.  The Makefile writes to a temp file and
            # renames atomically, so a reader that skips the lock (its
            # _stale() probe saw a fresh mtime) can never dlopen a torn
            # file — the rename either happened or the old complete
            # library is still in place.
            global _build_error
            import fcntl
            lock_path = os.path.join(_NATIVE_DIR, ".build.lock")
            try:
                with open(lock_path, "w") as lock_f:
                    fcntl.flock(lock_f, fcntl.LOCK_EX)
                    try:
                        if force or _stale():  # another proc may have built
                            subprocess.run(["make", "-C", _NATIVE_DIR]
                                           + (["-B"] if force else []),
                                           check=True, capture_output=True,
                                           text=True)
                    finally:
                        fcntl.flock(lock_f, fcntl.LOCK_UN)
                return True
            except (subprocess.CalledProcessError, OSError) as e:
                _build_error = getattr(e, "stderr", str(e)) or str(e)
                return False

        if _stale() and not _build_locked(force=False):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            # A torn .so can only predate the atomic-rename Makefile
            # (an interrupted in-place build from an older checkout).
            # Rebuild once under the lock before latching the error.
            if not _build_locked(force=True):
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError as e2:
                _build_error = str(e2)
                return None
        lib.mint_loader_open.restype = ctypes.c_void_p
        lib.mint_loader_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_uint64]
        lib.mint_loader_next.restype = ctypes.c_int
        lib.mint_loader_next.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_float)] * 3
        lib.mint_loader_close.argtypes = [ctypes.c_void_p]
        lib.mint_masked_crc32c.restype = ctypes.c_uint32
        lib.mint_masked_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def masked_crc32c(data: bytes) -> int:
    """Native masked CRC32C (for parity tests vs the Python tfrecord)."""
    lib = _load()
    assert lib is not None
    return int(lib.mint_masked_crc32c(data, len(data)))


class NativeTrainLoader:
    """Endless shuffled training batches from tfrecord shards.

    Yields dict batches matching the Python pipeline's training contract:
    ``motion_input`` [B, motion_len, 225], ``target`` [B, target_len, 225],
    ``audio_input`` [B, audio_len, 35].
    """

    def __init__(self, files: Sequence[str], batch_size: int,
                 motion_input_len: int, target_len: int, target_shift: int,
                 audio_input_len: int, motion_dim_raw: int = 219,
                 audio_dim: int = 35, shuffle_buffer: int = 100,
                 seed: int = 0, cache_bytes: Optional[int] = None):
        if batch_size < 1 or shuffle_buffer < 1:
            # shuffle_buffer=0 deadlocks the C++ reader (Enqueue's
            # buffer-has-room predicate is never true) and batch_size=0
            # yields an immediate spurious end-of-data — fail loudly.
            raise ValueError(
                f"batch_size ({batch_size}) and shuffle_buffer "
                f"({shuffle_buffer}) must both be >= 1")
        lib = _load()
        if lib is None:
            raise RuntimeError(
                f"native loader unavailable: {_build_error}")
        self._lib = lib
        if cache_bytes is None:
            # A full-record read+CRC+parse per window is the training
            # bottleneck on small hosts; decoded corpora are small
            # (AIST++ train ~2 GB), so cache them by default.
            cache_bytes = int(os.environ.get(
                "MINT_TPU_LOADER_CACHE_MB", "4096")) << 20
        self._shapes = dict(
            motion=(batch_size, motion_input_len, motion_dim_raw + 6),
            target=(batch_size, target_len, motion_dim_raw + 6),
            audio=(batch_size, audio_input_len, audio_dim))
        arr = (ctypes.c_char_p * len(files))(
            *[f.encode("utf-8") for f in files])
        self._handle = lib.mint_loader_open(
            arr, len(files), batch_size, motion_input_len, target_len,
            target_shift, audio_input_len, motion_dim_raw, audio_dim,
            shuffle_buffer, seed, cache_bytes)
        self._closed = False

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        motion = np.empty(self._shapes["motion"], np.float32)
        target = np.empty(self._shapes["target"], np.float32)
        audio = np.empty(self._shapes["audio"], np.float32)
        n = self._lib.mint_loader_next(
            self._handle,
            motion.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            target.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if n == 0:
            raise StopIteration
        return {"motion_input": motion, "target": target,
                "audio_input": audio}

    def close(self) -> None:
        if not self._closed:
            self._lib.mint_loader_close(self._handle)
            self._closed = True

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
