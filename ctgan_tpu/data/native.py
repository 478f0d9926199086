"""ctypes bindings for the native host-IO runtime (native/ctgan_io.cpp).

Builds the shared library on first use (g++ is in the image); every entry
point degrades to the pure-Python path if the toolchain is unavailable, so
the framework never hard-depends on the native build.

* :func:`decode_idx` / :func:`decode_cifar_bin` — native dataset decoders.
* :class:`NativePipeline` — multi-threaded shuffled [K,B,D] batcher with
  in-worker flip + normalize, deterministic (seed, cursor) state for
  checkpoint/resume.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["load_library", "decode_idx", "decode_cifar_bin", "NativePipeline", "native_available"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None
_TRIED = False


def load_library():
    """Build (if needed) and load libctgan_io.so; returns None on failure."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libctgan_io.so"))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "ctgan_io.cpp"))
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-shared",
                 "-o", so, src, "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
    except Exception as e:  # toolchain or load failure -> python fallback
        print(f"ctgan_io native library unavailable ({e}); using python path")
        return None

    lib.ctgan_decode_idx.restype = ctypes.c_int
    lib.ctgan_decode_idx.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_void_p,
    ]
    lib.ctgan_decode_cifar_bin.restype = ctypes.c_int
    lib.ctgan_decode_cifar_bin.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.ctgan_pipeline_create.restype = ctypes.c_void_p
    lib.ctgan_pipeline_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.ctgan_pipeline_next.restype = ctypes.c_int
    lib.ctgan_pipeline_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.ctgan_pipeline_cursor.restype = ctypes.c_int64
    lib.ctgan_pipeline_cursor.argtypes = [ctypes.c_void_p]
    lib.ctgan_pipeline_seek.restype = None
    lib.ctgan_pipeline_seek.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.ctgan_pipeline_destroy.restype = None
    lib.ctgan_pipeline_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_library() is not None


def decode_idx(raw: bytes) -> np.ndarray:
    """Decode an MNIST IDX blob into a uint8 array."""
    lib = load_library()
    if lib is None:  # python fallback
        ndim = raw[3]
        dims = [int.from_bytes(raw[4 + 4 * i : 8 + 4 * i], "big") for i in range(ndim)]
        return np.frombuffer(raw, np.uint8, offset=4 + 4 * ndim).reshape(dims).copy()
    dims = (ctypes.c_int64 * 3)()
    rc = lib.ctgan_decode_idx(raw, len(raw), dims, None)
    if rc != 0:
        raise ValueError(f"bad IDX data (rc={rc})")
    shape = [d for d in dims if d > 1] or [1]
    ndim = raw[3]
    shape = list(dims)[:ndim]
    out = np.empty(int(np.prod(shape)), np.uint8)
    lib.ctgan_decode_idx(raw, len(raw), dims, out.ctypes.data_as(ctypes.c_void_p))
    return out.reshape(shape)


def decode_cifar_bin(raw: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode CIFAR-10 binary records -> (images uint8 [N,3072], labels)."""
    n = len(raw) // 3073
    lib = load_library()
    if lib is None:
        arr = np.frombuffer(raw, np.uint8).reshape(n, 3073)
        return arr[:, 1:].copy(), arr[:, 0].astype("int64")
    images = np.empty((n, 3072), np.uint8)
    labels = np.empty(n, np.int64)
    n_out = ctypes.c_int64()
    rc = lib.ctgan_decode_cifar_bin(
        raw, len(raw), images.ctypes.data_as(ctypes.c_void_p),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(n_out),
    )
    if rc != 0:
        raise ValueError("bad CIFAR binary data")
    return images, labels


class NativePipeline:
    """Threaded shuffled epoch batcher producing float32 [K, B, D] stacks.

    ``state()``/``set_state()`` expose the deterministic cursor for
    checkpoint/resume (same contract as data.iterator.EpochIterator).
    Falls back to a Python implementation when the native lib is missing.
    """

    def __init__(
        self,
        images: np.ndarray,          # [N, D] uint8
        labels: np.ndarray | None,
        batch_size: int,
        critic_iters: int = 1,
        *,
        chw: tuple | None = None,    # (C, H, W) enables native flip
        flip: bool = False,
        scale: float = 2.0 / 255.0,
        shift: float = -1.0,
        seed: int = 0,
        n_threads: int = 2,
        depth: int = 4,
    ):
        self.images = np.ascontiguousarray(images, np.uint8)
        self.labels = (
            np.ascontiguousarray(labels, np.int64) if labels is not None else None
        )
        self.batch = batch_size
        self.k = critic_iters
        self.item = self.images.shape[1]
        self.seed = seed
        self.flip = flip
        self.scale, self.shift = scale, shift
        c, h, w = chw if chw else (1, 0, 0)
        self._lib = load_library()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.ctgan_pipeline_create(
                self.images.ctypes.data_as(ctypes.c_void_p),
                self.labels.ctypes.data_as(ctypes.c_void_p) if self.labels is not None else None,
                self.images.shape[0], self.item, batch_size, critic_iters,
                c, h, w, int(flip), scale, shift, seed, n_threads, depth,
            )
        else:
            self._cursor = 0
            self._rng_cache = {}
        self._chw = (c, h, w)

    def next(self) -> tuple[np.ndarray, np.ndarray | None]:
        per = self.k * self.batch
        if self._handle is not None:
            images = np.empty((per, self.item), np.float32)
            labels = np.empty(per, np.int64) if self.labels is not None else None
            rc = self._lib.ctgan_pipeline_next(
                self._handle, images.ctypes.data_as(ctypes.c_void_p),
                labels.ctypes.data_as(ctypes.c_void_p) if labels is not None else None,
            )
            if rc != 0:
                raise RuntimeError("pipeline stopped")
        else:
            n = len(self.images)
            per_epoch = max((n // per) * per, per)
            e, off = divmod(self._cursor, per_epoch)
            if e not in self._rng_cache:
                self._rng_cache = {e: np.random.default_rng((self.seed, e)).permutation(n)}
            perm = self._rng_cache[e]
            idx = perm[(off + np.arange(per)) % n]
            images = self.images[idx].astype("float32") * self.scale + self.shift
            c, h, w = self._chw
            if self.flip and w > 0 and c * h * w == self.item:
                # Same (seed, cursor)-derived aug seed as the native path
                # (ctgan_io.cpp::claim); the decision *stream* differs
                # (mt19937_64 vs PCG64) but both are deterministic in
                # (seed, cursor), which is the resume contract.
                aug_seed = (
                    self.seed ^ (self._cursor * 0xD1B54A32D192ED03)
                ) & 0xFFFFFFFFFFFFFFFF
                mask = np.random.default_rng(aug_seed).integers(0, 2, per) == 1
                planes = images.reshape(per, c, h, w)
                planes[mask] = planes[mask][..., ::-1]
                images = planes.reshape(per, self.item)
            labels = self.labels[idx] if self.labels is not None else None
            self._cursor += per
        out_i = images.reshape(self.k, self.batch, self.item)
        out_l = labels.reshape(self.k, self.batch) if labels is not None else None
        return out_i, out_l

    # -- resumable state --------------------------------------------------
    def state(self) -> dict:
        cursor = (
            int(self._lib.ctgan_pipeline_cursor(self._handle))
            if self._handle is not None
            else self._cursor
        )
        return {"seed": self.seed, "cursor": cursor}

    def set_state(self, state: dict) -> None:
        if self._handle is not None:
            self._lib.ctgan_pipeline_seek(self._handle, int(state["cursor"]))
        else:
            self._cursor = int(state["cursor"])

    def close(self) -> None:
        if self._handle is not None:
            self._lib.ctgan_pipeline_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
