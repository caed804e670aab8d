"""Native (C++) data-path runtime, loaded via ctypes.

Auto-builds libraystream.so with the in-repo Makefile on first use (g++ is
part of the baked toolchain); every consumer falls back to the numpy
implementation when the toolchain is unavailable.
"""

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent
_LIB_PATH = _NATIVE_DIR / "libraystream.so"
_lib = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        try:
            # always invoke make: a no-op when up to date, a rebuild when
            # the .cpp changed (an existing stale .so must not be loaded)
            subprocess.run(
                ["make", "-C", _NATIVE_DIR.as_posix(), "-s"],
                check=True,
                capture_output=True,
            )
        except Exception:
            if not _LIB_PATH.exists():
                raise
        lib = ctypes.CDLL(_LIB_PATH.as_posix())
        lib.raystream_create.restype = ctypes.c_void_p
        lib.raystream_create.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64,
        ]
        lib.raystream_destroy.argtypes = [ctypes.c_void_p]
        lib.raystream_size.restype = ctypes.c_int64
        lib.raystream_size.argtypes = [ctypes.c_void_p]
        lib.raystream_reset.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.raystream_next_block.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


class NativeRayStream:
    """Epoch-shuffled index stream backed by the C++ runtime.

    Same semantics as the preprocessor's Python stream: sequential slices of
    a permutation, reshuffle at epoch end, short tails wrap into the fresh
    permutation.
    """

    def __init__(self, count: int, seed: int, candidates: Optional[np.ndarray] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native raystream unavailable")
        self._lib = lib
        if candidates is not None:
            candidates = np.ascontiguousarray(candidates, dtype=np.int32)
            count = len(candidates)
            ptr = candidates.ctypes.data_as(ctypes.c_void_p)
        else:
            ptr = None
        if count <= 0:
            raise ValueError("raystream needs at least one candidate index")
        self._handle = lib.raystream_create(ptr, count, seed & (2**64 - 1))
        self._count = count

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.raystream_destroy(handle)
            self._handle = None

    @property
    def size(self) -> int:
        return int(self._lib.raystream_size(self._handle))

    def reset(self, candidates: Optional[np.ndarray] = None, count: Optional[int] = None):
        if candidates is not None:
            candidates = np.ascontiguousarray(candidates, dtype=np.int32)
            count = len(candidates)
            ptr = candidates.ctypes.data_as(ctypes.c_void_p)
        else:
            assert count is not None
            ptr = None
        self._lib.raystream_reset(self._handle, ptr, count)
        self._count = count

    def next_block(self, k: int, batch: int) -> np.ndarray:
        out = np.empty((k, batch), dtype=np.int32)
        self._lib.raystream_next_block(
            self._handle, k, batch, out.ctypes.data_as(ctypes.c_void_p)
        )
        return out
