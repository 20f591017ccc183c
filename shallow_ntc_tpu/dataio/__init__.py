"""Native data loader bindings: multi-threaded C++ JPEG/PNG decode + crop.

The TPU-native replacement for the reference's tf.data input pipeline (whose
decode/crop ran in TF's C++ runtime). Falls back gracefully when the shared
library can't be built (data.py then uses PIL).
"""

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cc")
_CACHE_DIR = os.environ.get("SHALLOW_NTC_CODEC_CACHE", _HERE)

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build_lib() -> str:
  with open(_SRC, "rb") as f:
    digest = hashlib.sha256(f.read()).hexdigest()[:12]
  so_path = os.path.join(_CACHE_DIR, f"libloader_{digest}.so")
  if not os.path.exists(so_path):
    tmp = so_path + f".tmp{os.getpid()}"
    subprocess.check_call([
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp,
        "-ljpeg", "-lpng",
    ])
    os.replace(tmp, so_path)
  return so_path


def get_lib() -> Optional[ctypes.CDLL]:
  """The loader library, or None if unavailable (no compiler / headers)."""
  global _lib, _lib_failed
  if _lib is None and not _lib_failed:
    with _lock:
      if _lib is None and not _lib_failed:
        try:
          lib = ctypes.CDLL(_build_lib())
          lib.decode_image.restype = ctypes.c_int
          lib.decode_image.argtypes = [
              ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
              ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
              ctypes.POINTER(ctypes.c_int),
          ]
          lib.decode_crop_batch.restype = ctypes.c_int
          lib.decode_crop_batch.argtypes = [
              ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
              ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
              ctypes.c_int,
          ]
          _lib = lib
        except Exception:
          _lib_failed = True
  return _lib


def available() -> bool:
  return get_lib() is not None


def decode_image(path: str, max_hw: int = 8192) -> Optional[np.ndarray]:
  """Decode one JPEG/PNG to a uint8 HWC array; None on failure."""
  lib = get_lib()
  if lib is None:
    return None
  buf = np.empty(max_hw * max_hw * 3, np.uint8)
  h = ctypes.c_int()
  w = ctypes.c_int()
  rc = lib.decode_image(
      path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      ctypes.c_int64(buf.size), ctypes.byref(h), ctypes.byref(w),
  )
  if rc != 0:
    return None
  return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def decode_crop_batch(
    paths: Sequence[str],
    patch: int,
    seeds: Sequence[int],
    threads: int = 8,
) -> np.ndarray:
  """Decode + crop a batch to uint8 [N, patch, patch, 3] via C++ threads.

  seeds[i] < 0 requests a center crop. Raises on any per-image failure
  (missing file, too-small image).
  """
  lib = get_lib()
  if lib is None:
    raise RuntimeError("native loader unavailable")
  n = len(paths)
  out = np.empty((n, patch, patch, 3), np.uint8)
  c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
  c_seeds = np.ascontiguousarray(list(seeds), np.int64)
  nfail = lib.decode_crop_batch(
      c_paths, ctypes.c_int(n), ctypes.c_int(patch),
      c_seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      ctypes.c_int(threads),
  )
  if nfail:
    raise RuntimeError(f"native loader: {nfail}/{n} images failed to decode/crop")
  return out
