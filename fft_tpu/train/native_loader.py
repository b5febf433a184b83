"""ctypes binding for the native (C++) data loader (csrc/dataloader.cc).

Build once with ``make -C csrc`` (or let ``NativeCharLoader.build()`` invoke
it).  Falls back cleanly: callers should catch ``NativeLoaderUnavailable``
and use ``fft_tpu.train.data.CharDataset`` (same batch contract).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Iterator

import numpy as np

_CSRC = pathlib.Path(__file__).resolve().parents[2] / "csrc"
_LIB = _CSRC / "libfftdata.so"


class NativeLoaderUnavailable(RuntimeError):
    pass


def build(force: bool = False) -> pathlib.Path:
    """Compile the shared library if needed."""
    if _LIB.exists() and not force:
        return _LIB
    try:
        subprocess.run(["make", "-C", str(_CSRC)], check=True,
                       capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
        raise NativeLoaderUnavailable(f"build failed: {e}") from e
    return _LIB


def _load_lib():
    if not _LIB.exists():
        build()
    lib = ctypes.CDLL(str(_LIB))
    if not hasattr(lib, "fft_loader_open2"):   # stale pre-BPE binary
        build(force=True)
        lib = ctypes.CDLL(str(_LIB))
    lib.fft_loader_open2.restype = ctypes.c_void_p
    lib.fft_loader_open2.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_uint64,
                                     ctypes.c_int]
    lib.fft_loader_next.restype = ctypes.c_int
    lib.fft_loader_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_int32)]
    lib.fft_loader_close.argtypes = [ctypes.c_void_p]
    return lib


class NativeCharLoader:
    """Threaded, double-buffered batch sampler over an mmap'd corpus file.
    ``elem_size=1`` samples raw bytes (char LM), ``elem_size=2`` samples a
    little-endian uint16 token stream (BPE corpora, train/bpe.py).
    Yields (B, seq_len+1) int32 like CharDataset.batches."""

    def __init__(self, path: str, batch: int, seq_len: int, seed: int = 0,
                 elem_size: int = 1):
        self._lib = _load_lib()
        self._handle = self._lib.fft_loader_open2(
            str(path).encode(), batch, seq_len, seed, elem_size)
        if not self._handle:
            raise NativeLoaderUnavailable(f"could not open corpus {path}")
        self.batch = batch
        self.seq_len = seq_len

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty((self.batch, self.seq_len + 1), np.int32)
        rc = self._lib.fft_loader_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            raise RuntimeError("native loader failed")
        return out

    def close(self):
        if self._handle:
            self._lib.fft_loader_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
