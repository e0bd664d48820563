"""ctypes bindings for the native C++ data engine (native/seqrec_data.cc).

The native loader owns shuffled epoch iteration, truncation, bucketed padding
and a background prefetch thread — the host-side hot path that feeds the
device queue. Falls back to the pure-Python BucketBatcher pipeline
(data/batching.py) when the shared library has not been built; both
implementations share the exact batch semantics (tests/unit/test_native_loader.py
pins them against each other).

Build once with: ``make -C native`` (g++, no deps). `available()` reports
whether the .so loaded.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

from seqrec_tpu.data.dataset import SequenceDataset

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libseqrec_data.so"),
    os.path.join(os.path.dirname(__file__), "libseqrec_data.so"),
)

_lib = None
_lib_lock = threading.Lock()


def _try_build() -> None:
    """Best-effort one-shot build of the native engine (g++ is baked into the
    image; the build is ~2s). Failures fall through to the Python pipeline."""
    src_dir = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "native")
    )
    if not os.path.exists(os.path.join(src_dir, "seqrec_data.cc")):
        return
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", src_dir],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not any(os.path.exists(os.path.abspath(p)) for p in _LIB_PATHS):
            _try_build()
        for p in _LIB_PATHS:
            p = os.path.abspath(p)
            if os.path.exists(p):
                lib = ctypes.CDLL(p)
                lib.srd_create.restype = ctypes.c_void_p
                lib.srd_create.argtypes = [
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                    ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int64,
                ]
                lib.srd_next_batch.restype = ctypes.c_int
                lib.srd_next_batch.argtypes = [
                    ctypes.c_void_p,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_int32),
                ]
                lib.srd_destroy.restype = None
                lib.srd_destroy.argtypes = [ctypes.c_void_p]
                _lib = lib
                return _lib
    return None


def available() -> bool:
    return _load() is not None


class NativeTrainLoader:
    """Infinite stream of bucketed train batches from the C++ engine."""

    def __init__(
        self,
        ds: SequenceDataset,
        *,
        batch_size: int,
        max_len: int,
        buckets: Sequence[int] = (),
        seed: int = 0,
        host_shard: Tuple[int, int] = (0, 1),
        hold_out: int = 2,  # leave-last-out: last 2 items held for val/test
        prefetch: int = 4,
        skip_batches: int = 0,  # checkpoint-resume fast-forward (no emit)
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native data engine not built; run `make -C native`"
            )
        self._lib = lib
        self.batch_size = batch_size
        self.max_len = max_len
        items = np.ascontiguousarray(ds.items, dtype=np.int32)
        offsets = np.ascontiguousarray(ds.offsets, dtype=np.int64)
        bucket_arr = np.ascontiguousarray(
            sorted(set(min(b, max_len) for b in buckets)) or [max_len],
            dtype=np.int32,
        )
        self._handle = lib.srd_create(
            items.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(items),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(offsets),
            batch_size, max_len,
            bucket_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(bucket_arr),
            seed + 1_000_003 * host_shard[0],
            host_shard[0], host_shard[1], hold_out, prefetch,
            skip_batches,
        )
        if not self._handle:
            raise RuntimeError("srd_create failed")
        # Reused output buffers at max size; sliced per bucket on yield.
        self._inputs = np.empty((batch_size, max_len), np.int32)
        self._targets = np.empty((batch_size, max_len), np.int32)
        self._mask = np.empty((batch_size, max_len), np.float32)
        self._users = np.empty((batch_size,), np.int32)

    def __iter__(self) -> Iterator[Tuple[int, Dict[str, np.ndarray]]]:
        return self

    def __next__(self) -> Tuple[int, Dict[str, np.ndarray]]:
        if self._handle is None:
            raise StopIteration
        bucket = self._lib.srd_next_batch(
            self._handle,
            self._inputs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._targets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._users.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if bucket < 0:
            raise StopIteration
        B, T = self.batch_size, bucket
        n = B * T
        # The engine writes row-major [B, T]; copy out so the caller owns it.
        return bucket, {
            "inputs": self._inputs.ravel()[:n].reshape(B, T).copy(),
            "targets": self._targets.ravel()[:n].reshape(B, T).copy(),
            "mask": self._mask.ravel()[:n].reshape(B, T).copy(),
            "users": self._users.copy(),
        }

    def close(self) -> None:
        if self._handle is not None:
            self._lib.srd_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
