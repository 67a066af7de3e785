"""Compressed feature file IO backed by a native (C++) codec.

File format (".fz"):
  magic b"FZ01" | int32 n_frames | int32 dim |
  float32 scales[n_frames] | int16 q[n_frames, dim]

The codec (zipvoice_tpu/native/featio.cpp) quantizes each frame to int16
with a per-frame scale — the role lilcom plays in the reference's feature
store, at ~2x compression over fp32 with ~1e-4 relative error.  The shared
library is compiled on first use with g++ (ctypes binding; no pybind11 in
this image); a numpy fallback keeps everything working without a compiler.
"""

import ctypes
import logging
import os
import struct
import subprocess
import threading

import numpy as np

_MAGIC = b"FZ01"
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build_dir() -> str:
    d = os.path.join(
        os.path.expanduser("~"), ".cache", "zipvoice_tpu_native"
    )
    os.makedirs(d, exist_ok=True)
    return d


def _load_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        src = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), os.pardir,
            "native", "featio.cpp",
        )
        so = os.path.join(_build_dir(), "libfeatio.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.cdll.LoadLibrary(so)
            i64, f32p, i16p = (
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int16),
            )
            lib.featio_encode_i16.argtypes = [f32p, i64, i64, i16p, f32p]
            lib.featio_decode_i16.argtypes = [i16p, f32p, i64, i64, f32p]
            _lib = lib
        except Exception as e:  # noqa: BLE001
            logging.warning(f"featio native build failed ({e}); numpy fallback")
            _lib_failed = True
    return _lib


def encode(x: np.ndarray):
    """(n_frames, dim) float32 -> (q int16, scales float32)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    n, d = x.shape
    q = np.empty((n, d), np.int16)
    scales = np.empty((n,), np.float32)
    lib = _load_lib()
    if lib is not None:
        lib.featio_encode_i16(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, d,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return q, scales
    maxabs = np.abs(x).max(axis=1)
    scales[:] = np.where(maxabs > 0, maxabs / 32767.0, 1.0)
    q[:] = np.clip(
        np.round(x / scales[:, None]), -32768, 32767
    ).astype(np.int16)
    return q, scales


def decode(q: np.ndarray, scales: np.ndarray) -> np.ndarray:
    q = np.ascontiguousarray(q, dtype=np.int16)
    scales = np.ascontiguousarray(scales, dtype=np.float32)
    n, d = q.shape
    out = np.empty((n, d), np.float32)
    lib = _load_lib()
    if lib is not None:
        lib.featio_decode_i16(
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, d,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    return q.astype(np.float32) * scales[:, None]


def save_feats(path: str, x: np.ndarray) -> None:
    q, scales = encode(x)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<ii", q.shape[0], q.shape[1]))
        f.write(scales.tobytes())
        f.write(q.tobytes())


def load_feats(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        magic = f.read(4)
        assert magic == _MAGIC, f"bad feature file {path}"
        n, d = struct.unpack("<ii", f.read(8))
        scales = np.frombuffer(f.read(4 * n), np.float32)
        q = np.frombuffer(f.read(2 * n * d), np.int16).reshape(n, d)
    return decode(q, scales)
