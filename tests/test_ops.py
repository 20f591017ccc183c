"""Unit tests for core numerics (SURVEY.md section 4 recommended coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shallow_ntc_tpu.ops import math as ops_math
from shallow_ntc_tpu.ops import rounding
from shallow_ntc_tpu.ops import entropy
from shallow_ntc_tpu import schedule


class TestBounds:
  def test_forward(self):
    x = jnp.array([-1.0, 0.5, 2.0])
    np.testing.assert_allclose(ops_math.lower_bound(x, 0.0), [0.0, 0.5, 2.0])
    np.testing.assert_allclose(ops_math.upper_bound(x, 1.0), [-1.0, 0.5, 1.0])

  def test_identity_if_towards_grad(self):
    # Clipped value: gradient passes only if it pushes x back into bounds.
    g_neg = jax.grad(lambda x: ops_math.lower_bound(x, 0.0) * -1.0)(-1.0)
    g_pos = jax.grad(lambda x: ops_math.lower_bound(x, 0.0) * 1.0)(-1.0)
    assert g_neg == -1.0  # g<0 increases x under descent: passes
    assert g_pos == 0.0
    g_pos2 = jax.grad(lambda x: ops_math.upper_bound(x, 0.0) * 1.0)(1.0)
    g_neg2 = jax.grad(lambda x: ops_math.upper_bound(x, 0.0) * -1.0)(1.0)
    assert g_pos2 == 1.0
    assert g_neg2 == 0.0


class TestRounding:
  def test_round_st_forward_and_grad(self):
    x = jnp.array([0.4, 1.6, -0.7])
    np.testing.assert_allclose(rounding.round_st(x), [0.0, 2.0, -1.0])
    g = jax.grad(lambda v: jnp.sum(rounding.round_st(v)))(x)
    np.testing.assert_allclose(g, jnp.ones_like(x))

  def test_round_st_offset(self):
    x = jnp.array([0.4])
    off = jnp.array([0.3])
    np.testing.assert_allclose(rounding.round_st(x, off), [0.3], atol=1e-6)

  def test_soft_round_limits(self):
    x = jnp.linspace(-2.2, 2.2, 23)
    # alpha -> 0: identity
    np.testing.assert_allclose(rounding.soft_round(x, 1e-6), x, atol=1e-4)
    # large alpha: approx round
    np.testing.assert_allclose(
        rounding.soft_round(x, 200.0), jnp.round(x), atol=1e-2
    )

  def test_sga_tau_limit_equals_round(self):
    rng = jax.random.PRNGKey(0)
    mu = jax.random.normal(jax.random.PRNGKey(1), (1000,)) * 3
    out = rounding.sga_round(rng, mu, tau=1e-3)
    np.testing.assert_allclose(out, jnp.round(mu), atol=1e-2)

  def test_sga_large_tau_stays_in_cell(self):
    rng = jax.random.PRNGKey(0)
    mu = jax.random.normal(jax.random.PRNGKey(1), (1000,))
    out = rounding.sga_round(rng, mu, tau=0.5)
    assert jnp.all(out >= jnp.floor(mu) - 1e-5)
    assert jnp.all(out <= jnp.ceil(mu) + 1e-5)

  def test_sga_offset_grid(self):
    rng = jax.random.PRNGKey(0)
    mu = jnp.array([1.4, -0.3, 2.9])
    off = jnp.array([0.25, 0.25, 0.25])
    out = rounding.sga_round(rng, mu, tau=1e-3, offset=off)
    frac = out - off
    np.testing.assert_allclose(frac, jnp.round(frac), atol=1e-2)

  def test_sga_schedule(self):
    # Warm period: tau == ub for t <= t0.
    assert float(rounding.sga_schedule_at_step(0, r=1e-3, ub=0.5, t0=200)) == 0.5
    assert float(rounding.sga_schedule_at_step(200, r=1e-3, ub=0.5, t0=200)) == 0.5
    v = float(rounding.sga_schedule_at_step(1200, r=1e-3, ub=0.5, t0=200))
    np.testing.assert_allclose(v, 0.5 * np.exp(-1.0), rtol=1e-5)

  def test_sga_schedule_linear(self):
    # Linear cooling variant (reference latent_rvs_utils.py:72-79): warm at
    # ub through t0, then ub - r*(t-t0), floored at lb.
    kw = dict(r=1e-3, ub=0.5, lb=1e-8, t0=200, scheme="linear")
    assert float(rounding.sga_schedule_at_step(0, **kw)) == 0.5
    np.testing.assert_allclose(
        float(rounding.sga_schedule_at_step(500, **kw)), 0.2, rtol=1e-5)
    # Far past the zero crossing the lb clip holds.
    assert float(rounding.sga_schedule_at_step(10**6, **kw)) == np.float32(1e-8)


class TestNoisyNormal:
  def test_matches_numerical_integration(self):
    # bits-from-likelihood vs numerically integrated density (SURVEY section 4).
    scale = jnp.float32(1.7)
    ys = jnp.linspace(-4.0, 4.0, 9)
    from scipy.stats import norm

    expected = norm.cdf((np.asarray(ys) + 0.5) / 1.7) - norm.cdf(
        (np.asarray(ys) - 0.5) / 1.7
    )
    got = jnp.exp(entropy.noisy_normal_log_prob(ys, scale))
    np.testing.assert_allclose(got, expected, rtol=5e-4, atol=1e-6)

  def test_tail_is_finite(self):
    # Deep tail: clamped at the tfc likelihood bound (1e-9), never -inf --
    # and the clamp must survive TPU subnormal flush-to-zero semantics.
    lp = entropy.noisy_normal_log_prob(jnp.float32(300.0), jnp.float32(0.11))
    assert np.isfinite(float(lp))
    np.testing.assert_allclose(float(lp), np.log(1e-9), rtol=1e-5)
    # Through the loss direction (minimize -log_prob = bits), the
    # identity-if-towards bound passes the corrective gradient even from
    # inside the clamped region: the loss still pulls y back toward mass.
    g = jax.grad(
        lambda y: -entropy.noisy_normal_log_prob(y, jnp.float32(0.2))
    )(jnp.float32(30.0))
    assert np.isfinite(float(g)) and float(g) > 0
    # Near-tail (p ~ 1e-7, above the bound): plain negative slope.
    g2 = jax.grad(lambda y: entropy.noisy_normal_log_prob(y, jnp.float32(1.0)))(
        jnp.float32(5.0)
    )
    assert np.isfinite(float(g2)) and float(g2) < 0

  def test_scale_table(self):
    np.testing.assert_allclose(float(entropy.scale_fn(0)), 0.11, rtol=1e-5)
    np.testing.assert_allclose(
        float(entropy.scale_fn(entropy.NUM_SCALES - 1)), 256.0, rtol=1e-5
    )


class TestDeepFactorized:
  @pytest.fixture(scope="class")
  def prior(self):
    mod = entropy.DeepFactorizedPrior(channels=4)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)))
    return mod, params

  def test_cdf_monotone_and_bounded(self, prior):
    mod, params = prior
    # init_scale=10 gives logistic (heavy) tails: probe a wide range.
    xs = jnp.tile(jnp.linspace(-120, 120, 241)[:, None], (1, 4))
    logits = mod.apply(params, xs, method=mod.logits_cdf)
    cdf = jax.nn.sigmoid(logits)
    assert np.all(np.diff(np.asarray(cdf), axis=0) >= -1e-6)
    assert float(cdf[0].max()) < 0.05 and float(cdf[-1].min()) > 0.95

  def test_density_integrates_to_one(self, prior):
    mod, params = prior
    # Noisy pmf over the integer grid sums to ~1 (it telescopes the CDF).
    # The init-scale-10 prior has logistic tails, so a wide grid is needed.
    grid = jnp.arange(-200, 201, dtype=jnp.float32)
    ys = jnp.tile(grid[:, None], (1, 4))
    pmf = jnp.exp(mod.apply(params, ys, method=mod.log_prob_noisy))
    np.testing.assert_allclose(np.asarray(pmf).sum(0), 1.0, atol=1e-3)

  def test_median_bisection(self, prior):
    mod, params = prior
    med = mod.apply(params, method=mod.median)
    logits = mod.apply(params, med[None, :], method=mod.logits_cdf)
    np.testing.assert_allclose(np.asarray(logits), 0.0, atol=1e-4)

  def test_quantization_offset_centered(self, prior):
    mod, params = prior
    off = mod.apply(params, method=mod.quantization_offset)
    assert np.all(np.abs(np.asarray(off)) <= 0.5)


class TestEntropyModelCalls:
  def setup_method(self):
    self.mod = entropy.DeepFactorizedPrior(channels=8)
    self.params = self.mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))

  def test_batched_em_train_vs_eval(self):
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8)) * 2

    def run(training):
      def fn(params):
        return entropy.batched_em_call(
            self.mod.bind(params), y, training, jax.random.PRNGKey(2), None
        )

      return fn(self.params)

    sample_t, bits_t = run(True)
    sample_e, bits_e = run(False)
    assert sample_t.shape == y.shape and bits_t.shape == (2,)
    # train sample within +-0.5 of y; eval sample is integers
    assert float(jnp.max(jnp.abs(sample_t - y))) <= 0.5
    np.testing.assert_allclose(sample_e, jnp.round(y), atol=1e-6)
    assert np.all(np.asarray(bits_t) > 0) and np.all(np.asarray(bits_e) >= 0)

  def test_indexed_em(self):
    key = jax.random.PRNGKey(3)
    y = jax.random.normal(key, (2, 4, 4, 8)) * 3
    loc = jnp.ones_like(y) * 0.3
    indexes = jnp.full_like(y, 30.0)
    sample, bits = entropy.indexed_em_call(
        y, indexes, loc, False, None, coding_rank=3
    )
    np.testing.assert_allclose(sample, jnp.round(y - loc) + loc, atol=1e-6)
    # bits must match explicit centered log-prob evaluation (SGA branch parity)
    lp = entropy.indexed_em_log_prob_centered(sample, indexes, loc)
    np.testing.assert_allclose(
        bits, entropy.bits_from_log_prob(lp, 3), rtol=1e-5
    )

  def test_index_clipping_gradients(self):
    # identity-if-towards: a gradient that (under descent) pushes a saturated
    # index back into [0, 63] passes; one pushing it further out is blocked.
    def f(idx):
      return jnp.sum(entropy.scale_fn(entropy.normalize_indexes(idx)))

    g_low_out = jax.grad(f)(jnp.array([-5.0]))  # descent would push down: blocked
    assert float(g_low_out[0]) == 0.0
    g_low_in = jax.grad(lambda i: -f(i))(jnp.array([-5.0]))  # pushes up: passes
    assert float(g_low_in[0]) != 0.0
    g_interior = jax.grad(f)(jnp.array([30.0]))
    assert float(g_interior[0]) != 0.0


class TestSchedules:
  def test_compression_schedule(self):
    lr_fn = schedule.compression_schedule(
        1e-4, total_num_steps=100, warmup_steps=10, drop_after=0.8, drop_factor=0.1
    )
    np.testing.assert_allclose(float(lr_fn(0)), 1e-5, rtol=1e-5)  # (0+1)/10 warmup
    np.testing.assert_allclose(float(lr_fn(9)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(lr_fn(50)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(lr_fn(85)), 1e-5, rtol=1e-5)

  def test_lambda_warmup(self):
    v0 = float(schedule.scheduled_rd_lambda(0.005, 0, 1000))
    v1 = float(schedule.scheduled_rd_lambda(0.005, 500, 1000))
    np.testing.assert_allclose(v0, 0.05, rtol=1e-6)
    np.testing.assert_allclose(v1, 0.005, rtol=1e-6)
    # no warmup for large lambda or itinf
    assert float(schedule.scheduled_rd_lambda(0.08, 0, 1000)) == pytest.approx(0.08)
    assert float(schedule.scheduled_rd_lambda(0.005, 0, 1000, itinf=True)) == pytest.approx(0.005)

  def test_piecewise_sine(self):
    v = schedule.piecewise_sine_schedule(5, [0, 10], [0.0, 1.0])
    np.testing.assert_allclose(float(v), np.sin(0.25 * np.pi), rtol=1e-5)
    assert float(schedule.piecewise_sine_schedule(-1, [0, 10], [0.0, 1.0])) == 0.0
    assert float(schedule.piecewise_sine_schedule(11, [0, 10], [0.0, 1.0])) == 1.0


class TestImageOps:
  def test_pad_unpad_roundtrip(self):
    from shallow_ntc_tpu.ops import metrics_ops

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 37, 53, 3))
    padded = metrics_ops.pad_images(x, 16)
    assert padded.shape == (2, 48, 64, 3)
    back = metrics_ops.unpad_images(padded, x.shape)
    np.testing.assert_allclose(back, x)

  def test_psnr(self):
    from shallow_ntc_tpu.ops import metrics_ops

    x = jnp.zeros((1, 8, 8, 3))
    y = jnp.ones((1, 8, 8, 3)) * 255.0
    _, psnr = metrics_ops.mse_psnr(x, y)
    np.testing.assert_allclose(np.asarray(psnr), 0.0, atol=1e-4)

  def test_ssim_identity(self):
    from shallow_ntc_tpu.ops import metrics_ops

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3)) * 255
    np.testing.assert_allclose(np.asarray(metrics_ops.ssim(x, x)), 1.0, atol=1e-5)

  def test_msssim_reasonable(self):
    from shallow_ntc_tpu.ops import metrics_ops

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 200, 200, 3)) * 255
    noisy = x + jax.random.normal(jax.random.PRNGKey(1), x.shape) * 5
    v_same = float(metrics_ops.msssim(x, x)[0])
    v_noisy = float(metrics_ops.msssim(x, noisy)[0])
    assert v_same > 0.9999
    assert 0.5 < v_noisy < v_same

  def test_msssim_filters_pin_highest_precision(self):
    """The SSIM moment convs must request HIGHEST precision explicitly.

    Under jax_default_matmul_precision=default (bf16 passes on TPU -- the
    itinf CLI's setting) the E[x^2]-E[x]^2 cancellation otherwise produces
    cs terms > 1 / < 0: observed as MS-SSIM trajectories above 1.0 and
    relu-collapsed per-image values in SGA runs (batch mean 0.8733 at
    35.4 dB PSNR). Guard by jaxpr inspection, since CPU tests cannot
    reproduce the TPU bf16 conv lowering."""
    from shallow_ntc_tpu.ops import metrics_ops

    x = jnp.zeros((1, 200, 200, 3))
    jaxpr = jax.make_jaxpr(metrics_ops.msssim)(x, x)
    convs = [
        eqn for eqn in jaxpr.jaxpr.eqns
        if eqn.primitive.name == "conv_general_dilated"
    ]
    assert convs, "expected conv eqns in msssim"
    for eqn in convs:
      prec = eqn.params.get("precision")
      assert prec is not None and all(
          p == jax.lax.Precision.HIGHEST
          for p in (prec if isinstance(prec, tuple) else (prec,))
      ), f"conv without pinned HIGHEST precision: {eqn.params}"

  def test_visualize_grid(self):
    from shallow_ntc_tpu.ops import metrics_ops

    imgs = np.zeros((6, 8, 8, 3))
    grid = metrics_ops.visualize_image_batch(imgs)
    assert grid.shape[0] * grid.shape[1] == 6 * 8 * 8
