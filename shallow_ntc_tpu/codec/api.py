"""Model-level compress/decompress: real bitstreams for both model families.

Encode flow (mshyper):
  device: x -> analysis -> y; y -> hyper_analysis -> z; z_hat = round(z-o)+o;
          z_hat -> hyper_synthesis -> (mu, sigma-index)
  host:   rANS-encode round(z-o) under the factorized tables and
          round(y-mu) under the scale-indexed Gaussian tables.
Decode flow:
  host:   rANS-decode z symbols -> z_hat
  device: z_hat -> hyper_synthesis -> (mu, sigma-index)
  host:   rANS-decode y symbols -> y_hat = k + mu
  device: y_hat -> synthesis -> image

The decoder recomputes mu/sigma from the decoded z_hat with the same
deterministic XLA program the encoder used, so y's coding grid matches
bit-for-bit and decompress(compress(x)) reproduces the eval-path
reconstruction exactly. This is the capability the reference lacks (its
entropy models never compress; SURVEY.md section 2.9).
"""

import struct
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shallow_ntc_tpu.codec import bindings, tables as tables_lib
from shallow_ntc_tpu.models import base as models_base
from shallow_ntc_tpu.ops import entropy, metrics_ops

MAGIC = b"SNTC"
VERSION = 2  # v2: each tensor is N interleaved rANS stripes (parallel decode)

# Fixed (rate-independent) bytes in a bitstream: the container framing plus
# the rANS final-state flush per stream. Everything else is entropy-coded
# payload, whose overhead vs the likelihood bound is budgeted at <= 0.5%
# (SURVEY section 4); a trained flagship measures ~0.23% end-to-end
# *including* these fixed bytes (results/codec_overhead_15k.json). The
# striped encoder (bindings.rans_encode_striped) self-limits its stream
# count so the per-stream fixed bytes stay <= 0.15% of each payload.
HEADER_BYTES = 10  # MAGIC + <BBHH>(version, family, h, w)
STREAMS_COUNT_BYTES = 1  # <B> stream count per tensor
CHUNK_LEN_BYTES = 4  # <I> length prefix per stream
RANS_FLUSH_BYTES = 4  # 32-bit final state per stream (rans.cc flush())


def fixed_overhead_bytes(stream_counts) -> int:
  """Exact rate-independent byte count of a bitstream whose tensors carry
  `stream_counts` (one entry per tensor) rANS stripes."""
  return HEADER_BYTES + sum(
      STREAMS_COUNT_BYTES + int(s) * (CHUNK_LEN_BYTES + RANS_FLUSH_BYTES)
      for s in stream_counts)


def stream_counts(blob: bytes):
  """Per-tensor stripe counts parsed back out of a bitstream (for exact
  overhead accounting in tests/benchmarks)."""
  _, _, _, _, rest = _unpack_header(blob)
  counts = []
  off = 0
  while off < len(rest):
    (s,) = struct.unpack_from("<B", rest, off)
    off += 1
    counts.append(s)
    for _ in range(s):
      (ln,) = struct.unpack_from("<I", rest, off)
      off += 4 + ln
  return counts


def _pack_header(version, family_id, h, w, extra=b""):
  # fixed_overhead_bytes() assumes a 10-byte header; a family that starts
  # using `extra` must extend that accounting (test_codec.py bounds rely
  # on it being exact).
  assert extra == b"", "extra header bytes not accounted in fixed_overhead_bytes"
  return MAGIC + struct.pack("<BBHH", version, family_id, h, w) + extra


def _unpack_header(blob):
  assert blob[:4] == MAGIC, "not a shallow_ntc_tpu bitstream"
  version, family_id, h, w = struct.unpack("<BBHH", blob[4:10])
  return version, family_id, h, w, blob[10:]


def _pack_tensor(chunks) -> bytes:
  """One tensor: <B>(num stripes) then each stripe length-prefixed."""
  out = struct.pack("<B", len(chunks))
  for c in chunks:
    out += struct.pack("<I", len(c)) + c
  return out


def _unpack_tensors(data: bytes, num_tensors: int):
  """Inverse of `num_tensors` consecutive _pack_tensor blocks; returns a
  list of per-tensor stripe lists."""
  tensors = []
  off = 0
  for _ in range(num_tensors):
    (s,) = struct.unpack_from("<B", data, off)
    off += 1
    chunks = []
    for _ in range(s):
      (ln,) = struct.unpack_from("<I", data, off)
      chunks.append(data[off + 4 : off + 4 + ln])
      off += 4 + ln
    tensors.append(chunks)
  return tensors


@dataclass
class CompressionResult:
  bitstring: bytes
  # uint8 [H, W, 3] encoder-side decode; None in compress_batch(...,
  # reconstruct=False), which skips the synthesis round-trip.
  reconstruction: Optional[np.ndarray]
  bpp: float


# Batch codec paths dispatch at most this many device chunks ahead of the
# host consumer: enough to overlap host rANS with device transforms, while
# resident device memory stays O(lookahead * chunk_size), not O(len(images))
# (advisor round 4 -- the unbounded version could OOM the chip on a large
# image list despite the chunking knob).
_LOOKAHEAD_CHUNKS = 2


def _drain_recs(pending, keep, xs, results):
  """Fetch queued (idxs, uint8-synthesis-future) pairs until <= `keep` remain.

  xs[i] gives the unpadded input shape; results[i].reconstruction is filled
  with the [h, w, 3] crop."""
  while len(pending) > keep:
    idxs, fut = pending.pop(0)
    rec = np.asarray(jax.device_get(fut))
    for row, i in enumerate(idxs):
      h, w = xs[i].shape[1], xs[i].shape[2]
      results[i].reconstruction = rec[row, :h, :w]


def _equal_shape_chunks(shapes, chunk_size):
  """Split indexes 0..n-1 into runs of equal (h, w), each <= chunk_size.

  Batch codec stages stack a chunk's tensors into ONE device call, so a
  chunk must be shape-uniform; mixed-size inputs simply produce shorter
  chunks (worst case: per-image calls, the unpipelined behavior)."""
  chunks = []
  i = 0
  while i < len(shapes):
    j = i + 1
    while (j < len(shapes) and j - i < chunk_size
           and shapes[j] == shapes[i]):
      j += 1
    chunks.append(list(range(i, j)))
    i = j
  return chunks


def _spatial_shardings(spatial_devices: int):
  """(replicated_params, spatial_image) NamedShardings for the pixel-space
  transforms of a codec, or (None, None) for the single-device codec.

  Spatial sharding (image height over a 'spatial' mesh axis, XLA inserting
  the conv halo exchanges) applies ONLY to analysis and synthesis: pixels
  carry no coding state, so a sharded transform changing low bits at worst
  rounds an encoder-side symbol differently (a different valid encoding) or
  flips a reconstruction uint8 by +-1 (the same caveat as the batched
  synthesis path). The rANS coding tables (mu, scale indexes) keep coming
  from the canonical single-device batch-1 hyper-synthesis program on BOTH
  sides -- see MSHyperCodec.hyper_dec's determinism contract -- so
  bitstreams interoperate across spatial_devices settings.
  """
  if spatial_devices <= 1:
    return None, None
  from shallow_ntc_tpu.parallel import mesh as mesh_lib

  mesh = mesh_lib.make_mesh(
      spatial_devices, axis_names=("data", "spatial"),
      axis_sizes=(1, spatial_devices))
  return mesh_lib.replicated(mesh), mesh_lib.spatial_sharding(mesh)


class MSHyperCodec:
  """Compress/decompress with a trained mean-scale hyperprior model."""

  def __init__(self, model, params, spatial_devices: int = 1):
    self.model = model
    self.params = params
    cls = type(model)
    repl, spatial = _spatial_shardings(spatial_devices)

    def analyze(params, x):
      latents = model.apply({"params": params}, x, method=cls.infer_latent_rvs)
      return latents.uq[0].loc, latents.uq[1].loc  # z, y

    def hyper_dec(params, z_hat):
      # DETERMINISM CONTRACT: (mu, indexes) select the rANS coding tables,
      # so the encoder and decoder must compute them BIT-IDENTICALLY -- one
      # flipped scale index derails the stream from that symbol on. XLA
      # compiles a different conv tiling per (program, batch) shape, and
      # different tilings round differently at low bits, so every codec
      # path runs THIS jitted program at canonical batch-1 geometry on the
      # host-canonical z_hat. (Found the hard way: an encoder that took
      # mu/indexes from a fused analysis program decoded to 18 dB instead
      # of 30 dB through the standalone-program decoder.) Only synthesis
      # may batch: pixels carry no coding state.
      mu, indexes = model.apply(
          {"params": params}, z_hat, method=cls.hyper_synthesize
      )
      return mu, entropy.normalize_indexes(indexes)

    def synth(params, y_hat):
      return model.apply({"params": params}, y_hat, method=cls.synthesize)

    def synth_u8(params, y_hat):
      # Batch path: quantize to the uint8 grid ON DEVICE so the tunnel
      # ships 1 byte/px instead of a 4-byte float (the D2H transfer is a
      # first-order cost of end-to-end decode; PERF_NOTES "Codec e2e").
      rec = synth(params, y_hat)
      return models_base.floats_to_pixels(rec, training=False).astype(jnp.uint8)

    if spatial is None:
      self._analyze = jax.jit(analyze)
      self._synth = jax.jit(synth)
      self._synth_u8 = jax.jit(synth_u8)
    else:
      # Height-sharded pixel transforms for high-resolution images; the
      # latents come back fully addressable via device_get as usual.
      self._analyze = jax.jit(analyze, in_shardings=(repl, spatial))
      self._synth = jax.jit(synth, in_shardings=(repl, spatial))
      self._synth_u8 = jax.jit(synth_u8, in_shardings=(repl, spatial))
    # The coding-table program NEVER shards (determinism contract above).
    self._hyper_dec = jax.jit(hyper_dec)

    prior = entropy.DeepFactorizedPrior(channels=self._prior_channels())
    prior_params = {"params": params["_prior"]}
    self.z_tables = tables_lib.build_factorized_tables(
        prior, prior_params, offset_heuristic=model.offset_heuristic
    )
    self.y_tables = tables_lib.build_gaussian_tables()

  def _prior_channels(self):
    p = self.params["_prior"]["matrix_0"]
    return p.shape[0]

  def _encode_z_host(self, z):
    """Host z encode for ONE image: returns (z_chunks, z_hat) with z_hat the
    decoder-exact coding-grid latent (the exact array _decode_z_host will
    reproduce, and therefore the only valid hyper-synthesis input)."""
    z_syms = self.z_tables.symbols_from_latent(z)
    z_idx = self.z_tables.channel_indexes(z.shape)
    z_chunks = bindings.rans_encode_striped(z_syms, z_idx, self.z_tables.tables)
    return z_chunks, self.z_tables.latent_from_symbols(z_syms)

  def _encode_y_host(self, z_chunks, y, mu, indexes, h, w):
    """Host y encode for ONE image; returns (blob, y_hat)."""
    y_idx = self.y_tables.snap_indexes(indexes)
    y_syms = self.y_tables.symbols_from_latent(y, mu, y_idx)
    y_chunks = bindings.rans_encode_striped(y_syms, y_idx, self.y_tables.tables)

    # z's spatial extent follows from the padded image size; only H, W travel.
    blob = (_pack_header(VERSION, 1, h, w)
            + _pack_tensor(z_chunks) + _pack_tensor(y_chunks))
    y_hat = self.y_tables.latent_from_symbols(y_syms, mu, y_idx)
    return blob, y_hat

  def compress(self, image: np.ndarray) -> CompressionResult:
    """image: [H, W, 3] or [1, H, W, 3], normalized floats (x/255 - 0.5)."""
    x = np.asarray(image, np.float32)
    if x.ndim == 3:
      x = x[None]
    assert x.shape[0] == 1, "codec compresses one image at a time"
    h, w = x.shape[1], x.shape[2]

    z, y = jax.device_get(self._analyze(self.params, jnp.asarray(x)))
    z_chunks, z_hat = self._encode_z_host(z)
    mu, indexes = jax.device_get(
        self._hyper_dec(self.params, jnp.asarray(z_hat, jnp.float32)))
    blob, y_hat = self._encode_y_host(z_chunks, y, mu, indexes, h, w)
    rec = self._reconstruct(y_hat, (1, h, w, 3))
    bpp = len(blob) * 8.0 / (h * w)
    return CompressionResult(blob, rec, bpp)

  def compress_batch(self, images, reconstruct: bool = False,
                     chunk_size: int = 8):
    """Pipelined multi-image compress; returns [CompressionResult].

    Equal-shaped runs of images are stacked into ONE analysis call per
    chunk (one tunnel round-trip instead of per-image rounds), dispatched
    asynchronously up front so the device transforms chunk g+1 while the
    host rANS-encodes chunk g. The coding-table inputs (mu, indexes) are
    computed per image by the SAME canonical batch-1 hyper-synthesis
    program the decoder runs (see hyper_dec's determinism contract);
    those calls are also dispatched async, so they hide behind the host
    z-encode of later images. reconstruct=False (default) skips the
    encoder-side synthesis entirely -- batch callers that only need
    bitstreams save a second device pass.
    """
    xs = []
    for im in images:
      x = np.asarray(im, np.float32)
      xs.append(x[None] if x.ndim == 3 else x)
    chunks = _equal_shape_chunks([x.shape for x in xs], chunk_size)

    # Bounded lookahead (advisor round 4): dispatch at most LOOKAHEAD chunks
    # of analysis ahead of the host consumer, so resident device memory
    # scales with chunk_size, not len(images), while the host/device overlap
    # is preserved (the device transforms chunk g+1..g+2 while the host
    # rANS-encodes chunk g).
    analysis_futs = {}

    def dispatch_analysis(g):
      idxs = chunks[g]
      xb = jnp.asarray(np.concatenate([xs[i] for i in idxs], 0))
      analysis_futs[g] = self._analyze(self.params, xb)

    for g in range(min(_LOOKAHEAD_CHUNKS, len(chunks))):
      dispatch_analysis(g)

    results = [None] * len(xs)
    y_hats = {}
    pending = []  # (i, z_chunks, hyper_future, y_row), <= ~2 chunks deep

    def finish(item):
      i, z_chunks, hyper_fut, y_row = item
      mu, indexes = jax.device_get(hyper_fut)
      h, w = xs[i].shape[1], xs[i].shape[2]
      blob, y_hat = self._encode_y_host(z_chunks, y_row, mu, indexes, h, w)
      results[i] = CompressionResult(blob, None, len(blob) * 8.0 / (h * w))
      y_hats[i] = y_hat

    for g, idxs in enumerate(chunks):
      z, y = jax.device_get(analysis_futs.pop(g))
      if g + _LOOKAHEAD_CHUNKS < len(chunks):
        dispatch_analysis(g + _LOOKAHEAD_CHUNKS)
      for row, i in enumerate(idxs):
        z_chunks, z_hat = self._encode_z_host(z[row : row + 1])
        hyper_fut = self._hyper_dec(
            self.params, jnp.asarray(z_hat, jnp.float32))
        pending.append((i, z_chunks, hyper_fut, y[row : row + 1]))
      while len(pending) > chunk_size:  # keep <= ~1 chunk of hypers in flight
        finish(pending.pop(0))
    for item in pending:
      finish(item)

    if reconstruct:
      rec_pending = []
      for g, idxs in enumerate(chunks):
        yb = jnp.asarray(
            np.concatenate([y_hats[i] for i in idxs], 0), jnp.float32)
        rec_pending.append((idxs, self._synth_u8(self.params, yb)))
        _drain_recs(rec_pending, _LOOKAHEAD_CHUNKS - 1, xs, results)
      _drain_recs(rec_pending, 0, xs, results)
    return results

  def _latent_shapes(self, h, w):
    d = self.model.downsample_factor
    ph, pw = -(-h // d) * d, -(-w // d) * d
    tc = models_base.to_plain_dict(self.model.transform_config)
    from shallow_ntc_tpu.models.transforms import config_scale_factor

    fa = config_scale_factor(tc["analysis"])
    fh = config_scale_factor(tc.get("hyper_analysis", dict(cls="HyperAnalysis")))
    yh, yw = ph // fa, pw // fa
    zh, zw = yh // fh, yw // fh
    return (1, zh, zw, self._prior_channels()), (1, yh, yw, None)

  def _reconstruct(self, y_hat: np.ndarray, out_shape) -> np.ndarray:
    rec = self._synth(self.params, jnp.asarray(y_hat, jnp.float32))
    rec = metrics_ops.unpad_images(rec, out_shape)
    rec255 = models_base.floats_to_pixels(rec, training=False)
    return np.asarray(jax.device_get(rec255)).astype(np.uint8)[0]

  def decompress(self, blob: bytes) -> np.ndarray:
    """Returns the uint8 [H, W, 3] reconstruction."""
    h, w, z_hat, y_chunks = self._decode_z_host(blob)
    mu, indexes = jax.device_get(
        self._hyper_dec(self.params, jnp.asarray(z_hat, jnp.float32))
    )
    y_hat = self._decode_y_host(y_chunks, mu, indexes)
    return self._reconstruct(y_hat, (1, h, w, 3))

  def _decode_z_host(self, blob):
    """Host half of stage 1: header + z rANS decode -> (h, w, z_hat, y_chunks)."""
    version, family_id, h, w, rest = _unpack_header(blob)
    assert version == VERSION and family_id == 1
    z_chunks, y_chunks = _unpack_tensors(rest, 2)
    z_shape, _ = self._latent_shapes(h, w)
    z_idx = self.z_tables.channel_indexes(z_shape)
    z_syms = bindings.rans_decode_striped(z_chunks, z_idx, self.z_tables.tables)
    return h, w, self.z_tables.latent_from_symbols(z_syms), y_chunks

  def _decode_y_host(self, y_chunks, mu, indexes):
    """Host half of stage 2: y rANS decode under (mu, sigma-index) -> y_hat."""
    y_idx = self.y_tables.snap_indexes(indexes)
    y_syms = bindings.rans_decode_striped(y_chunks, y_idx, self.y_tables.tables)
    return self.y_tables.latent_from_symbols(y_syms, mu, y_idx)

  def decompress_batch(self, blobs, chunk_size: int = 8,
                       strict: bool = False):
    """Pipelined multi-image decompress; returns [uint8 [H, W, 3]].

    The per-image path is a strict host->device->host->device chain whose
    two device legs each pay a full tunnel round-trip. Here the
    hyper-synthesis calls -- which MUST run the canonical batch-1 program
    the encoder used (see hyper_dec's determinism contract) -- are
    dispatched asynchronously with a bounded lookahead, equal-shaped runs
    of decoded latents stack into ONE synthesis call per chunk, and
    reconstructions come back pre-quantized uint8 -- so while the device
    runs image i's hyper-synthesis the host rANS-decodes other images, and
    the D2H image transfer is a quarter of the float fetch. y_hat is
    bit-identical to per-image decompress(); reconstructions can differ by
    the odd +-1 uint8 rounding flip where the batched synthesis tiling
    rounds differently.

    strict=True runs the synthesis per image through the SAME program
    per-image decompress() uses, so reconstructions are bit-identical
    across paths (parity-critical evals; advisor round 4) at the cost of
    the batched-synthesis stacking and the uint8 fetch.
    """
    stage1 = [self._decode_z_host(b) for b in blobs]
    chunks = _equal_shape_chunks([(s[0], s[1]) for s in stage1], chunk_size)

    hyper_futs = {}

    def dispatch_hypers(g):
      for i in chunks[g]:
        hyper_futs[i] = self._hyper_dec(
            self.params, jnp.asarray(stage1[i][2], jnp.float32))

    for g in range(min(_LOOKAHEAD_CHUNKS, len(chunks))):
      dispatch_hypers(g)

    out = [None] * len(blobs)
    rec_pending = []  # (idxs, future), drained with a one-chunk lag

    def drain(keep):
      while len(rec_pending) > keep:
        idxs, fut = rec_pending.pop(0)
        rec = np.asarray(jax.device_get(fut))
        for row, i in enumerate(idxs):
          h, w = stage1[i][0], stage1[i][1]
          out[i] = rec[row, :h, :w]

    for g, idxs in enumerate(chunks):
      if g + _LOOKAHEAD_CHUNKS < len(chunks):
        dispatch_hypers(g + _LOOKAHEAD_CHUNKS)
      y_hats = []
      for i in idxs:
        mu, indexes = jax.device_get(hyper_futs.pop(i))
        y_hats.append(self._decode_y_host(stage1[i][3], mu, indexes))
      if strict:
        for i, y_hat in zip(idxs, y_hats):
          h, w = stage1[i][0], stage1[i][1]
          out[i] = self._reconstruct(y_hat, (1, h, w, 3))
      else:
        yb = jnp.asarray(np.concatenate(y_hats, 0), jnp.float32)
        rec_pending.append((idxs, self._synth_u8(self.params, yb)))
        drain(1)
    drain(0)
    return out


class FactorizedCodec:
  """Compress/decompress with a trained factorized-prior model."""

  def __init__(self, model, params, spatial_devices: int = 1):
    self.model = model
    self.params = params
    cls = type(model)
    repl, spatial = _spatial_shardings(spatial_devices)

    def analyze(params, x):
      latents = model.apply({"params": params}, x, method=cls.infer_latent_rvs)
      return latents.uq[0].loc

    def synth(params, y_hat):
      return model.apply({"params": params}, y_hat, method=cls.synthesize)

    def synth_u8(params, y_hat):
      rec = synth(params, y_hat)
      return models_base.floats_to_pixels(rec, training=False).astype(jnp.uint8)

    if spatial is None:
      self._analyze = jax.jit(analyze)
      self._synth = jax.jit(synth)
      self._synth_u8 = jax.jit(synth_u8)
    else:
      # Factorized coding tables are per-channel constants (no per-image
      # table program), so ALL pixel transforms may shard.
      self._analyze = jax.jit(analyze, in_shardings=(repl, spatial))
      self._synth = jax.jit(synth, in_shardings=(repl, spatial))
      self._synth_u8 = jax.jit(synth_u8, in_shardings=(repl, spatial))

    prior = entropy.DeepFactorizedPrior(
        channels=self.params["_prior"]["matrix_0"].shape[0]
    )
    self.tables = tables_lib.build_factorized_tables(
        prior, {"params": params["_prior"]},
        offset_heuristic=model.offset_heuristic,
    )

  def compress(self, image: np.ndarray) -> CompressionResult:
    x = np.asarray(image, np.float32)
    if x.ndim == 3:
      x = x[None]
    assert x.shape[0] == 1
    h, w = x.shape[1], x.shape[2]
    y = np.asarray(jax.device_get(self._analyze(self.params, jnp.asarray(x))))
    syms = self.tables.symbols_from_latent(y)
    idx = self.tables.channel_indexes(y.shape)
    y_chunks = bindings.rans_encode_striped(syms, idx, self.tables.tables)
    blob = _pack_header(VERSION, 0, h, w) + _pack_tensor(y_chunks)
    y_hat = self.tables.latent_from_symbols(syms)
    rec = self._reconstruct(y_hat, (1, h, w, 3))
    return CompressionResult(blob, rec, len(blob) * 8.0 / (h * w))

  def _reconstruct(self, y_hat, out_shape):
    rec = self._synth(self.params, jnp.asarray(y_hat, jnp.float32))
    rec = metrics_ops.unpad_images(rec, out_shape)
    rec255 = models_base.floats_to_pixels(rec, training=False)
    return np.asarray(jax.device_get(rec255)).astype(np.uint8)[0]

  def _decode_host(self, blob):
    version, family_id, h, w, rest = _unpack_header(blob)
    assert version == VERSION and family_id == 0
    (y_chunks,) = _unpack_tensors(rest, 1)
    d = self.model.downsample_factor
    ph, pw = -(-h // d) * d, -(-w // d) * d
    c = self.tables.channels
    y_shape = (1, ph // d, pw // d, c)
    idx = self.tables.channel_indexes(y_shape)
    syms = bindings.rans_decode_striped(y_chunks, idx, self.tables.tables)
    return h, w, self.tables.latent_from_symbols(syms)

  def decompress(self, blob: bytes) -> np.ndarray:
    h, w, y_hat = self._decode_host(blob)
    return self._reconstruct(y_hat, (1, h, w, 3))

  def compress_batch(self, images, reconstruct: bool = False,
                     chunk_size: int = 8):
    """Pipelined multi-image compress (see MSHyperCodec.compress_batch)."""
    xs = []
    for im in images:
      x = np.asarray(im, np.float32)
      xs.append(x[None] if x.ndim == 3 else x)
    chunks = _equal_shape_chunks([x.shape for x in xs], chunk_size)

    # Bounded lookahead: see MSHyperCodec.compress_batch.
    analysis_futs = {}

    def dispatch_analysis(g):
      idxs = chunks[g]
      xb = jnp.asarray(np.concatenate([xs[i] for i in idxs], 0))
      analysis_futs[g] = self._analyze(self.params, xb)

    for g in range(min(_LOOKAHEAD_CHUNKS, len(chunks))):
      dispatch_analysis(g)

    results = [None] * len(xs)
    rec_pending = []
    for g, idxs in enumerate(chunks):
      y = jax.device_get(analysis_futs.pop(g))
      if g + _LOOKAHEAD_CHUNKS < len(chunks):
        dispatch_analysis(g + _LOOKAHEAD_CHUNKS)
      y_hats = []
      for row, i in enumerate(idxs):
        h, w = xs[i].shape[1], xs[i].shape[2]
        yi = y[row : row + 1]
        syms = self.tables.symbols_from_latent(yi)
        idx = self.tables.channel_indexes(yi.shape)
        y_chunks = bindings.rans_encode_striped(syms, idx, self.tables.tables)
        blob = _pack_header(VERSION, 0, h, w) + _pack_tensor(y_chunks)
        results[i] = CompressionResult(blob, None, len(blob) * 8.0 / (h * w))
        y_hats.append(self.tables.latent_from_symbols(syms))
      if reconstruct:
        yb = jnp.asarray(np.concatenate(y_hats, 0), jnp.float32)
        rec_pending.append((idxs, self._synth_u8(self.params, yb)))
        _drain_recs(rec_pending, _LOOKAHEAD_CHUNKS - 1, xs, results)
    _drain_recs(rec_pending, 0, xs, results)
    return results

  def decompress_batch(self, blobs, chunk_size: int = 8,
                       strict: bool = False):
    """Pipelined multi-image decompress (see MSHyperCodec.decompress_batch)."""
    stage1 = [self._decode_host(b) for b in blobs]
    chunks = _equal_shape_chunks([(s[0], s[1]) for s in stage1], chunk_size)

    out = [None] * len(blobs)
    rec_pending = []

    def drain(keep):
      while len(rec_pending) > keep:
        idxs, fut = rec_pending.pop(0)
        rec = np.asarray(jax.device_get(fut))
        for row, i in enumerate(idxs):
          h, w = stage1[i][0], stage1[i][1]
          out[i] = rec[row, :h, :w]

    for idxs in chunks:
      if strict:
        for i in idxs:
          h, w = stage1[i][0], stage1[i][1]
          out[i] = self._reconstruct(stage1[i][2], (1, h, w, 3))
      else:
        yb = jnp.asarray(
            np.concatenate([stage1[i][2] for i in idxs], 0), jnp.float32)
        rec_pending.append((idxs, self._synth_u8(self.params, yb)))
        drain(_LOOKAHEAD_CHUNKS - 1)
    drain(0)
    return out


def make_codec(model, params, spatial_devices: int = 1):
  """Codec factory keyed on the model family.

  spatial_devices > 1 runs the pixel-space transforms (analysis, synthesis)
  height-sharded over a (1, N) device mesh -- the high-resolution inference
  path (compress.py --spatial_devices). Coding tables stay canonical
  single-device, so bitstreams interoperate across settings.
  """
  from shallow_ntc_tpu.models import factorized as factorized_models
  from shallow_ntc_tpu.models import mshyper as mshyper_models

  if isinstance(model, mshyper_models.Model):
    return MSHyperCodec(model, params, spatial_devices=spatial_devices)
  if isinstance(model, factorized_models.Model):
    return FactorizedCodec(model, params, spatial_devices=spatial_devices)
  raise TypeError(type(model))
