"""ctypes bindings for the C++ rANS coder, built on demand with g++.

The shared library is compiled once into the package directory (or
$SHALLOW_NTC_CODEC_CACHE) and reused; rebuilds happen when rans.cc changes.
"""

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rans.cc")
_CACHE_DIR = os.environ.get("SHALLOW_NTC_CODEC_CACHE", _HERE)

_lock = threading.Lock()
_lib = None


def _build_lib() -> str:
  with open(_SRC, "rb") as f:
    digest = hashlib.sha256(f.read()).hexdigest()[:12]
  so_path = os.path.join(_CACHE_DIR, f"librans_{digest}.so")
  if not os.path.exists(so_path):
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    subprocess.check_call(cmd)
    os.replace(tmp, so_path)
  return so_path


def _get_lib():
  global _lib
  if _lib is None:
    with _lock:
      if _lib is None:
        lib = ctypes.CDLL(_build_lib())
        lib.rans_encode.restype = ctypes.c_int64
        lib.rans_encode.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # symbols
            ctypes.POINTER(ctypes.c_int32),  # indexes
            ctypes.c_int64,                  # n
            ctypes.POINTER(ctypes.c_uint32),  # cdfs
            ctypes.POINTER(ctypes.c_int64),  # cdf_offsets
            ctypes.POINTER(ctypes.c_int32),  # cdf_sizes
            ctypes.c_int32,                  # num_tables
            ctypes.POINTER(ctypes.c_uint8),  # out
            ctypes.c_int64,                  # out_capacity
        ]
        lib.rans_decode.restype = ctypes.c_int32
        lib.rans_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
  return _lib


def _ptr(arr, ctype):
  return arr.ctypes.data_as(ctypes.POINTER(ctype))


class CdfTables:
  """Concatenated quantized CDF tables (each: cdf[0]=0 .. cdf[size]=65536).

  The last slot of every table is the escape symbol (out-of-range values are
  raw-coded with ~34 bits).
  """

  def __init__(self, cdfs_list):
    self.sizes = np.asarray([len(c) - 1 for c in cdfs_list], np.int32)
    self.offsets = np.zeros(len(cdfs_list), np.int64)
    np.cumsum([len(c) for c in cdfs_list[:-1]], out=self.offsets[1:])
    self.cdfs = np.concatenate(cdfs_list).astype(np.uint32)
    assert all(c[0] == 0 and c[-1] == 65536 for c in cdfs_list)

  @property
  def num_tables(self):
    return len(self.sizes)


def rans_encode(symbols, indexes, tables: CdfTables) -> bytes:
  """Entropy-code int32 `symbols` (table-local alphabet) under per-element
  `indexes` into a byte string."""
  symbols = np.ascontiguousarray(symbols, np.int32).ravel()
  indexes = np.ascontiguousarray(indexes, np.int32).ravel()
  assert symbols.shape == indexes.shape
  n = symbols.size
  capacity = max(1024, n * 8 + 64)  # escape worst case ~ 34 bits/symbol
  out = np.empty(capacity, np.uint8)
  lib = _get_lib()
  nbytes = lib.rans_encode(
      _ptr(symbols, ctypes.c_int32), _ptr(indexes, ctypes.c_int32),
      ctypes.c_int64(n),
      _ptr(tables.cdfs, ctypes.c_uint32), _ptr(tables.offsets, ctypes.c_int64),
      _ptr(tables.sizes, ctypes.c_int32), ctypes.c_int32(tables.num_tables),
      _ptr(out, ctypes.c_uint8), ctypes.c_int64(capacity),
  )
  if nbytes < 0:
    raise RuntimeError(f"rans_encode failed with code {nbytes}")
  return out[:nbytes].tobytes()


def rans_decode(data: bytes, indexes, tables: CdfTables) -> np.ndarray:
  """Inverse of rans_encode; returns int32 symbols shaped like `indexes`."""
  indexes = np.ascontiguousarray(indexes, np.int32)
  flat = indexes.ravel()
  n = flat.size
  out = np.empty(n, np.int32)
  buf = np.frombuffer(data, np.uint8)
  lib = _get_lib()
  rc = lib.rans_decode(
      _ptr(buf, ctypes.c_uint8), ctypes.c_int64(buf.size),
      _ptr(flat, ctypes.c_int32), ctypes.c_int64(n),
      _ptr(tables.cdfs, ctypes.c_uint32), _ptr(tables.offsets, ctypes.c_int64),
      _ptr(tables.sizes, ctypes.c_int32), ctypes.c_int32(tables.num_tables),
      _ptr(out, ctypes.c_int32),
  )
  if rc != 0:
    raise RuntimeError(f"rans_decode failed with code {rc}")
  return out.reshape(indexes.shape)
