"""Codec tests: rANS round trips, CDF tables, model-level bitstreams.

SURVEY.md section 4 "codec round-trip" coverage -- a new capability vs the
reference (whose entropy models never compress).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shallow_ntc_tpu.codec import api as codec_api
from shallow_ntc_tpu.codec import bindings, tables as tables_lib
from shallow_ntc_tpu.ops import entropy


def _uniform_table(num_symbols):
  f = np.full(num_symbols, 65536 // num_symbols, np.int64)
  f[0] += 65536 - f.sum()
  return np.concatenate([[0], np.cumsum(f)]).astype(np.uint32)


class TestRans:
  def test_roundtrip_with_escapes(self):
    rng = np.random.default_rng(0)
    t = bindings.CdfTables([_uniform_table(5), _uniform_table(17)])
    n = 100_000
    idx = rng.integers(0, 2, n).astype(np.int32)
    sym = np.where(idx == 0, rng.integers(0, 4, n), rng.integers(0, 16, n)).astype(np.int32)
    pos = rng.integers(0, n, 200)
    sym[pos] = rng.integers(-(2**30), 2**30, 200)
    data = bindings.rans_encode(sym, idx, t)
    out = bindings.rans_decode(data, idx, t)
    np.testing.assert_array_equal(out, sym)

  def test_rate_close_to_entropy(self):
    rng = np.random.default_rng(1)
    probs = np.asarray([0.5, 0.25, 0.125, 0.0625, 0.0625])
    f = np.round(probs * 65530).astype(np.int64)
    f = np.append(f, 65536 - f.sum())  # escape slot
    cdf = np.concatenate([[0], np.cumsum(f)]).astype(np.uint32)
    t = bindings.CdfTables([cdf])
    n = 200_000
    sym = rng.choice(5, n, p=probs).astype(np.int32)
    idx = np.zeros(n, np.int32)
    data = bindings.rans_encode(sym, idx, t)
    bits_per_sym = len(data) * 8 / n
    entropy_bits = -(probs * np.log2(probs)).sum()
    assert bits_per_sym < entropy_bits * 1.005 + 0.01

  def test_empty_and_single(self):
    t = bindings.CdfTables([_uniform_table(4)])
    for n in (0, 1):
      sym = np.zeros(n, np.int32)
      idx = np.zeros(n, np.int32)
      out = bindings.rans_decode(bindings.rans_encode(sym, idx, t), idx, t)
      np.testing.assert_array_equal(out, sym)


class TestTables:
  def test_quantize_pmf(self):
    pmf = np.asarray([0.7, 0.2, 0.1])
    cdf = tables_lib.quantize_pmf(pmf, escape_mass=1e-8)
    assert cdf[0] == 0 and cdf[-1] == 65536
    freqs = np.diff(cdf.astype(np.int64))
    assert (freqs >= 1).all()
    np.testing.assert_allclose(freqs[:3] / 65536, pmf, atol=2e-3)

  def test_factorized_tables_mass(self):
    prior = entropy.DeepFactorizedPrior(channels=6)
    params = prior.init(jax.random.PRNGKey(0), jnp.zeros((1, 6)))
    ft = tables_lib.build_factorized_tables(prior, params)
    assert ft.tables.num_tables == 6
    # coded pmf should match the continuous pmf closely on the grid
    mod = prior.bind(params)
    for c in [0, 3]:
      size = ft.tables.sizes[c] - 1  # minus escape
      grid = (np.arange(size) + ft.kmin[c]).astype(np.float32) + ft.offset[c]
      x = np.zeros((size, 6), np.float32)
      x[:, c] = grid
      pmf_cont = np.exp(np.asarray(mod.log_prob_noisy(jnp.asarray(x))))[:, c]
      off = ft.tables.offsets[c]
      freqs = np.diff(ft.tables.cdfs[off : off + ft.tables.sizes[c] + 1].astype(np.int64))
      np.testing.assert_allclose(freqs[:-1] / 65536, pmf_cont, atol=3e-3)

  def test_gaussian_tables(self):
    gt = tables_lib.build_gaussian_tables()
    assert gt.tables.num_tables == entropy.NUM_SCALES
    # small scale -> narrow table, large scale -> wide table
    assert gt.tables.sizes[0] < gt.tables.sizes[-1]
    idx = gt.snap_indexes(np.asarray([-3.0, 0.2, 63.9, 400.0]))
    np.testing.assert_array_equal(idx, [0, 0, 63, 63])


def _train_tiny(model_cls, model_kwargs, steps=12):
  from shallow_ntc_tpu import train_lib

  model = model_cls(**model_kwargs)
  state, tx, lr_fn = train_lib.create_train_state(
      model, dict(learning_rate=1e-3, warmup_until=0.0), jax.random.PRNGKey(0),
      (64, 64, 3),
  )
  step_fn = jax.jit(train_lib.make_train_step(model, tx, lr_fn))
  x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), minval=-0.5, maxval=0.5)
  for _ in range(steps):
    state, _ = step_fn(state, x)
  return model, jax.device_get(state.params)


class TestModelCodecs:
  @pytest.fixture(scope="class")
  def mshyper_setup(self):
    from shallow_ntc_tpu.models import mshyper as mshyper_models

    return _train_tiny(
        mshyper_models.Model,
        dict(
            scheduled_num_steps=20,
            rd_lambda=0.01,
            transform_config=dict(
                analysis=dict(cls="CNNAnalysis", channels_base=8, output_channels=12),
                synthesis=dict(cls="TwoLayerSynthesis", channels=(6, 3),
                               strides=(8, 2), kernel_sizes=(13, 5)),
                hyper_analysis=dict(cls="HyperAnalysisSmall", bottleneck_size=12),
                hyper_synthesis=dict(cls="HyperSynthesisSmall", bottleneck_size=12),
            ),
        ),
    )

  def test_mshyper_roundtrip_bit_exact(self, mshyper_setup):
    model, params = mshyper_setup
    codec = codec_api.make_codec(model, params)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (96, 80, 3)).astype(np.float32) / 255.0 - 0.5
    result = codec.compress(img)
    rec = codec.decompress(result.bitstring)
    # decoder output must equal the encoder-side reconstruction bit-for-bit
    np.testing.assert_array_equal(rec, result.reconstruction)
    assert rec.shape == (96, 80, 3) and rec.dtype == np.uint8
    assert result.bpp > 0

  def test_mshyper_spatial_codec_interop(self, mshyper_setup):
    """Spatially-sharded codec (compress.py --spatial_devices): the pixel
    transforms run height-sharded over a (1, 2) mesh while the coding
    tables stay canonical single-device, so bitstreams interoperate across
    spatial_devices settings (the high-resolution composition VERDICT r4
    item 8 asks for: pad + halo exchange + codec together)."""
    model, params = mshyper_setup
    plain = codec_api.make_codec(model, params)
    spatial = codec_api.make_codec(model, params, spatial_devices=2)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (160, 96, 3)).astype(np.float32) / 255.0 - 0.5

    r_sp = spatial.compress(img)
    r_pl = plain.compress(img)
    # Cross-setting decode: each decoder accepts the other's bitstream.
    rec_pl_of_sp = plain.decompress(r_sp.bitstring)
    rec_sp_of_pl = spatial.decompress(r_pl.bitstring)
    rec_sp_of_sp = spatial.decompress(r_sp.bitstring)
    # Self-roundtrip stays bit-exact (same sharded synthesis program on
    # both sides).
    np.testing.assert_array_equal(rec_sp_of_sp, r_sp.reconstruction)
    # Across settings the synthesis tiling may flip the odd uint8 by +-1
    # (same caveat as the batched synthesis path).
    for a, b in [(rec_pl_of_sp, r_sp.reconstruction),
                 (rec_sp_of_pl, r_pl.reconstruction)]:
      d = np.abs(a.astype(np.int32) - b.astype(np.int32))
      assert d.max() <= 1 and (d != 0).mean() < 0.05
    # Rates agree closely (low-bit analysis differences at most).
    assert abs(r_sp.bpp - r_pl.bpp) / r_pl.bpp < 0.02

  def test_mshyper_bpp_close_to_likelihood(self, mshyper_setup):
    """Real-bitstream bpp should be close to the eval likelihood bpp.

    SURVEY section 4 budgets the entropy-coded payload at <= 0.5% over the
    likelihood bound (a trained flagship measures ~0.23% end-to-end incl.
    header: results/codec_overhead_15k.json). This toy model's rate is near
    zero (~126 payload bytes at 128x128), so the rate-independent bytes
    (header + chunk framing + rANS flush) are accounted exactly via
    codec_api.fixed_overhead_bytes rather than hidden in a loose margin.
    """
    model, params = mshyper_setup
    codec = codec_api.make_codec(model, params)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (128, 128, 3)).astype(np.float32) / 255.0 - 0.5
    result = codec.compress(img)

    _, metrics, _ = model.apply(
        {"params": params}, jnp.asarray(img[None]), training=False, rng=None,
        step=20, method=type(model).end_to_end_frame_loss,
    )
    likelihood_bpp = float(metrics["bpp"])
    assert result.bpp >= likelihood_bpp * 0.98  # can't beat the model's entropy
    fixed_bpp = codec_api.fixed_overhead_bytes(
        codec_api.stream_counts(result.bitstring)) * 8 / (128 * 128)
    assert result.bpp <= likelihood_bpp * 1.005 + fixed_bpp

  def test_mshyper_batch_matches_single(self, mshyper_setup):
    """compress_batch/decompress_batch must equal the per-image path exactly
    (byte-identical bitstreams, pixel-identical reconstructions) across
    mixed image shapes and chunk boundaries -- the batch path only
    restructures WHEN device calls happen, never what they compute."""
    model, params = mshyper_setup
    codec = codec_api.make_codec(model, params)
    rng = np.random.default_rng(3)
    shapes = [(96, 80), (96, 80), (96, 80), (64, 96), (96, 80)]
    imgs = [rng.integers(0, 256, s + (3,)).astype(np.float32) / 255.0 - 0.5
            for s in shapes]

    # Byte-identity between per-image and batched ENCODE holds on CPU, where
    # XLA's conv results are geometry-independent. On TPU the batched
    # _analyze is a different program whose conv tiling can flip a rounded
    # z/y symbol in the low bits (the exact effect hyper_dec's determinism
    # contract documents), so there the guaranteed-by-construction contract
    # is DECODABILITY, not byte-identity (advisor round 4) -- asserted by
    # the cross-path decode checks below, which run on every backend.
    exact_encode = jax.default_backend() == "cpu"

    singles = [codec.compress(im) for im in imgs]
    batch = codec.compress_batch(imgs, reconstruct=True, chunk_size=2)
    for s, b in zip(singles, batch):
      if exact_encode:
        assert s.bitstring == b.bitstring
        assert s.bpp == b.bpp
        np.testing.assert_array_equal(s.reconstruction, b.reconstruction)

    no_rec = codec.compress_batch(imgs, chunk_size=3)
    assert all(r.reconstruction is None for r in no_rec)
    if exact_encode:
      assert [r.bitstring for r in no_rec] == [s.bitstring for s in singles]

    def assert_recon_match(a, b):
      if exact_encode:
        np.testing.assert_array_equal(a, b)
      else:  # TPU: batched synthesis tiling may flip the odd uint8 by +-1
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert d.max() <= 1 and (d != 0).mean() < 0.05, (d.max(), (d != 0).mean())

    recs = codec.decompress_batch([s.bitstring for s in singles], chunk_size=2)
    for s, rec in zip(singles, recs):
      assert_recon_match(rec, s.reconstruction)
      assert rec.dtype == np.uint8

    # strict=True must reproduce per-image decompress() bit-identically on
    # EVERY backend (it runs the same per-image synthesis program).
    recs_strict = codec.decompress_batch(
        [s.bitstring for s in singles], chunk_size=2, strict=True)
    for s, rec in zip(singles, recs_strict):
      np.testing.assert_array_equal(rec, s.reconstruction)

    # Cross-path/cross-chunking interop: a bitstream must decode correctly
    # regardless of how it was batched at encode time and how the decoder
    # batches. The coding tables (mu, indexes) are therefore ALWAYS
    # computed by the same canonical batch-1 hyper-synthesis program on
    # both sides (codec/api.py hyper_dec determinism contract) -- on TPU,
    # program/geometry-dependent conv tilings otherwise flip scale indexes
    # and derail the rANS stream (18.6 dB instead of 30.5 dB).
    assert_recon_match(
        codec.decompress(batch[0].bitstring), batch[0].reconstruction)
    recs4 = codec.decompress_batch([r.bitstring for r in batch], chunk_size=4)
    for s, rec in zip(singles, recs4):
      assert_recon_match(rec, s.reconstruction)

  def test_factorized_roundtrip(self):
    from shallow_ntc_tpu.models import factorized as factorized_models

    model, params = _train_tiny(
        factorized_models.Model,
        dict(
            scheduled_num_steps=20,
            rd_lambda=0.01,
            transform_config=dict(
                analysis=dict(cls="BLS2017Analysis", num_filters=8),
                synthesis=dict(cls="BLS2017Synthesis", num_filters=8),
            ),
        ),
    )
    codec = codec_api.make_codec(model, params)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (80, 96, 3)).astype(np.float32) / 255.0 - 0.5
    result = codec.compress(img)
    rec = codec.decompress(result.bitstring)
    np.testing.assert_array_equal(rec, result.reconstruction)
    _, metrics, _ = model.apply(
        {"params": params}, jnp.asarray(img[None]), training=False, rng=None,
        step=20, method=type(model).end_to_end_frame_loss,
    )
    fixed_bpp = codec_api.fixed_overhead_bytes(
        codec_api.stream_counts(result.bitstring)) * 8 / (80 * 96)
    assert result.bpp <= float(metrics["bpp"]) * 1.005 + fixed_bpp

    # Batch paths must match the per-image path exactly (mixed shapes).
    rng = np.random.default_rng(4)
    imgs = [img,
            rng.integers(0, 256, (80, 96, 3)).astype(np.float32) / 255.0 - 0.5,
            rng.integers(0, 256, (96, 64, 3)).astype(np.float32) / 255.0 - 0.5]
    singles = [codec.compress(im) for im in imgs]
    batch = codec.compress_batch(imgs, reconstruct=True, chunk_size=2)
    for s, b in zip(singles, batch):
      assert s.bitstring == b.bitstring
      np.testing.assert_array_equal(s.reconstruction, b.reconstruction)
    recs = codec.decompress_batch([s.bitstring for s in singles], chunk_size=2)
    for s, rec in zip(singles, recs):
      np.testing.assert_array_equal(rec, s.reconstruction)


class TestStripedStreams:
  """Parallel (striped) rANS streams: VERDICT r2 item 4."""

  def _tables(self):
    pmf = np.array([0.15, 0.2, 0.3, 0.2, 0.1, 0.05])
    cdf = np.round(np.concatenate([[0.0], np.cumsum(pmf)]) * 65536).astype(np.uint32)
    cdf[-1] = 65536
    return bindings.CdfTables([cdf])

  def test_striped_roundtrip_multistream(self):
    tables = self._tables()
    rng = np.random.default_rng(0)
    n = 9 * bindings.STRIPE_MIN_SYMBOLS
    syms = rng.integers(0, 5, n).astype(np.int32)
    idx = np.zeros(n, np.int32)
    chunks = bindings.rans_encode_striped(syms, idx, tables)
    assert len(chunks) > 1, "large tensor should stripe"
    out = bindings.rans_decode_striped(chunks, idx, tables)
    np.testing.assert_array_equal(out, syms)

  def test_striped_matches_sequential_content(self):
    """Stripes must decode identically regardless of stream count."""
    tables = self._tables()
    rng = np.random.default_rng(1)
    n = 100_000
    syms = rng.integers(0, 6, n).astype(np.int32)  # includes escape symbol 5
    idx = np.zeros(n, np.int32)
    for forced in (1, 3, 8):
      bounds = bindings.stripe_bounds(n, forced)
      chunks = [
          bindings.rans_encode(syms[bounds[i]:bounds[i + 1]],
                               idx[bounds[i]:bounds[i + 1]], tables)
          for i in range(forced)
      ]
      out = bindings.rans_decode_striped(chunks, idx, tables)
      np.testing.assert_array_equal(out, syms)

  def test_stream_count_respects_overhead_budget(self):
    """The encoder must not spend more than ~0.15% of the payload on
    per-stream fixed bytes, even for large-but-highly-compressible input."""
    pmf = np.array([0.9995, 0.0004, 0.0001])
    cdf = np.round(np.concatenate([[0.0], np.cumsum(pmf)]) * 65536).astype(np.uint32)
    cdf[-1] = 65536
    cdf = np.maximum.accumulate(np.maximum(cdf, np.arange(len(cdf))))
    tables = bindings.CdfTables([cdf.astype(np.uint32)])
    n = 12 * bindings.STRIPE_MIN_SYMBOLS
    syms = np.zeros(n, np.int32)  # ~0.0007 bits/symbol: tiny payload
    idx = np.zeros(n, np.int32)
    chunks = bindings.rans_encode_striped(syms, idx, tables)
    payload = sum(len(c) for c in chunks)
    fixed = len(chunks) * bindings.STREAM_FIXED_BYTES
    assert len(chunks) == 1 or fixed <= 0.0015 * payload + bindings.STREAM_FIXED_BYTES
    np.testing.assert_array_equal(
        bindings.rans_decode_striped(chunks, idx, tables), syms)


class TestDecodeLut:
  """The 12-bit bucket LUT decode path (rans.cc find_symbol_lut) against
  adversarial CDF geometry: slot edges exactly on bucket boundaries, many
  symbols per bucket, and probability mass concentrated in one bucket."""

  def test_boundary_aligned_slots(self):
    # Every slot edge is a multiple of 16 = exactly a LUT bucket boundary
    # (LUT_BITS=12 over 16-bit codepoints -> bucket width 16).
    rng = np.random.default_rng(2)
    t = bindings.CdfTables([_uniform_table(4096)])  # slot width exactly 16
    sym = rng.integers(0, 4095, 50_000).astype(np.int32)
    idx = np.zeros_like(sym)
    out = bindings.rans_decode(bindings.rans_encode(sym, idx, t), idx, t)
    np.testing.assert_array_equal(out, sym)

  def test_many_symbols_per_bucket(self):
    # 8192 slots of width 8: two symbols per bucket, forcing the refine loop.
    rng = np.random.default_rng(3)
    t = bindings.CdfTables([_uniform_table(8192)])
    sym = rng.integers(0, 8191, 50_000).astype(np.int32)
    idx = np.zeros_like(sym)
    out = bindings.rans_decode(bindings.rans_encode(sym, idx, t), idx, t)
    np.testing.assert_array_equal(out, sym)

  def test_skewed_mass_single_bucket(self):
    # One dominant symbol plus a tail of 1-codepoint slots packed into the
    # first buckets; exercises lut entries pointing far behind the target.
    f = np.ones(64, np.int64)
    f[0] = 65536 - 63
    cdf = np.concatenate([[0], np.cumsum(f)]).astype(np.uint32)
    t = bindings.CdfTables([cdf])
    rng = np.random.default_rng(4)
    sym = np.where(rng.random(100_000) < 0.99, 0,
                   rng.integers(1, 63, 100_000)).astype(np.int32)
    idx = np.zeros_like(sym)
    out = bindings.rans_decode(bindings.rans_encode(sym, idx, t), idx, t)
    np.testing.assert_array_equal(out, sym)

  def test_lut_matches_reference_search(self):
    # The LUT is definitionally lut[b] = max{s: cdf[s] <= b<<4}; check it
    # against a direct numpy searchsorted for random tables.
    rng = np.random.default_rng(5)
    for size in (2, 3, 7, 65, 300):
      f = rng.integers(1, 1000, size).astype(np.int64)
      f = np.maximum((f * 65536 / f.sum()).astype(np.int64), 1)
      f[-1] += 65536 - f.sum()
      if f[-1] <= 0:  # renormalize pathological draw
        f = np.full(size, 65536 // size, np.int64)
        f[0] += 65536 - f.sum()
      cdf = np.concatenate([[0], np.cumsum(f)]).astype(np.uint32)
      t = bindings.CdfTables([cdf])
      lut = t.lut
      bucket_lo = np.arange(1 << t.LUT_BITS, dtype=np.uint32) << 4
      want = np.searchsorted(cdf, bucket_lo, side="right") - 1
      np.testing.assert_array_equal(lut, np.minimum(want, size - 1))
