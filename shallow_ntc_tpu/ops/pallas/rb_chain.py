"""Fused ELIC ResidualBlock *chain* Pallas kernel (encode-side hot path).

The ELIC analysis stages run `num_residual_blocks` (3 in the flagship)
consecutive residual blocks, each x + c3(relu(c2(relu(c1(x))))) with
c1: 1x1 C->C/2, c2: 3x3 C/2->C/2 SAME, c3: 1x1 C/2->C (reference
common/elic.py:41-68, 147-161). Under XLA every conv is its own fusion, so
one block round-trips ~5 tensors through HBM and a 3-block chain moves
~4.2 GB at stage-1 resolution -- measured ~40% MXU (PERF_NOTES.md).

This kernel runs the WHOLE chain per grid cell: it reads R+2N input rows
once, keeps every intermediate in VMEM, and writes R output rows once
(HBM traffic = read x + write out, independent of chain depth N).

Why this succeeds where round 2's single-block kernel (resblock.py, 12.1 ms
vs XLA's 2.5 ms) failed -- the three measured sinks there are designed out:

  * no lane-concat of rolled operands (the 3-height-tap K-stacking forced
    Mosaic relayouts): height taps are STATIC SLICES of the row-major dim,
    which are free, giving 9 small matmuls instead of 3 concat-fed ones;
  * width taps roll only the f32 PARTIAL PRODUCTS (96 lanes), the proven
    pattern from ops/pallas/twolayer_final.py, never the inputs;
  * per-cell fixed costs amortize over R=32 rows x the full chain, and the
    valid-row window shrinks naturally (R+2N -> R) so no compute is wasted
    and no per-block edge masking is needed beyond the image-pad mask.

Geometry: x is zero-padded by N on all four sides in XLA ([B, H+2N, W+2N, C]).
Cell (b, j) reads padded rows [jR, jR + R + 2N) and emits final-chain rows
[jR, jR + R) at padded width (the caller either slices cols [N, N+W) or
feeds the padded tensor to the next strided conv with negative low/high
padding, which costs nothing). SAME semantics: c2 of every block must see
zero h1 outside the true image, but pad pixels produce h1 = relu(b1) != 0,
so h1 is masked to zero at globally-padded rows/cols each block.

Differentiable via custom_vjp through the dense XLA formulation (exact same
math), like ops/pallas/twolayer_final.py.
"""

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dense_rb_chain(x, params: Sequence[Tuple], act):
  """Exact XLA formulation (CPU fallback + the backward pass).

  params: per block (w1 [C,Ch], b1, w2 [3,3,Ch,Ch], b2, w3 [Ch,C], b3).
  """
  dn = lambda a, k: jax.lax.conv_dimension_numbers(
      a.shape, k.shape, ("NHWC", "HWIO", "NHWC")
  )
  for w1, b1, w2, b2, w3, b3 in params:
    h = act(
        jax.lax.conv_general_dilated(
            x, w1[None, None], (1, 1), "SAME",
            dimension_numbers=dn(x, w1[None, None])
        )
        + b1
    )
    h = act(
        jax.lax.conv_general_dilated(
            h, w2, (1, 1), "SAME", dimension_numbers=dn(h, w2)
        )
        + b2
    )
    h = (
        jax.lax.conv_general_dilated(
            h, w3[None, None], (1, 1), "SAME",
            dimension_numbers=dn(h, w3[None, None])
        )
        + b3
    )
    x = x + h
  return x


def _pick_rows(h: int) -> int:
  import os

  force = os.environ.get("SNTC_RB_ROWS")
  if force:
    r = int(force)
    return r if h % r == 0 else 0
  for r in (16, 32, 8, 4):
    if h % r == 0:
      return r
  return 0


def _make_kernel(n_blocks, r_rows, w_img, wp, c, ch, dtype, act_name,
                 interpret):
  """rows_in = R + 2N; block k consumes rows [k, rows_in - k)."""
  act = getattr(jax.nn, act_name)
  rows_in = r_rows + 2 * n_blocks

  def roll_w(x, shift):
    if shift == 0:
      return x
    if interpret:
      return jnp.roll(x, shift, axis=1)
    return pltpu.roll(x, shift=shift % x.shape[1], axis=1)

  def kernel_fn(x_ref, *args):
    # args: per block (w1, b1, w2, b2, w3, b3), then out_ref.
    out_ref = args[-1]
    j = pl.program_id(1)

    cur = x_ref[0]  # [rows_in, wp, C] bf16
    # Global image coords of cur[r, w] at chain depth k:
    #   row = j*R + k + r - N  (valid in [0, H) <=> padded row in [N, H+N))
    #   col = w - N            (static; wp = W + 2N)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    col_keep = jnp.logical_and(
        col_idx >= n_blocks, col_idx < n_blocks + w_img
    )

    for k in range(n_blocks):
      w1r, b1r, w2r, b2r, w3r, b3r = args[6 * k : 6 * k + 6]
      rows_k = rows_in - 2 * k
      m = rows_k * wp

      h1 = jnp.dot(
          cur.reshape(m, c), w1r[:, :], preferred_element_type=jnp.float32
      )
      h1 = act(h1 + b1r[0].astype(jnp.float32)).reshape(rows_k, wp, ch)

      # Zero h1 at globally-padded pixels (SAME zero-pad semantics; pad
      # pixels otherwise carry relu(b1)). Row test uses global coords so
      # only the first/last row blocks actually mask rows.
      row_idx = jax.lax.broadcasted_iota(jnp.int32, (rows_k, 1, 1), 0)
      pad_row = j * r_rows + k + row_idx  # padded-tensor row coordinate
      row_keep = pad_row >= n_blocks  # top image edge
      # bottom image edge: padded row >= H + N <=> beyond the last image row
      n_row_blocks = pl.num_programs(1)
      h_pad_rows = n_row_blocks * r_rows + 2 * n_blocks  # == H + 2N
      row_keep = jnp.logical_and(
          row_keep, pad_row < h_pad_rows - n_blocks
      )
      h1 = jnp.where(jnp.logical_and(row_keep, col_keep), h1, 0.0)
      h1 = h1.astype(dtype)

      # 3x3 conv -> valid out rows [1, rows_k - 1). Height taps are free
      # static slices of the leading dim; width taps roll the f32 partials.
      rows_o = rows_k - 2
      acc = jnp.zeros((rows_o * wp, ch), jnp.float32)
      for dy in range(3):
        src = h1[dy : dy + rows_o].reshape(rows_o * wp, ch)
        for dx in range(3):
          p = jnp.dot(
              src, w2r[dy, dx], preferred_element_type=jnp.float32
          )
          shift = 1 - dx
          if shift == 0:
            acc = acc + p
          else:
            acc = acc + roll_w(
                p.reshape(rows_o, wp, ch), shift
            ).reshape(rows_o * wp, ch)
      h2 = act(acc + b2r[0].astype(jnp.float32)).astype(dtype)

      h3 = jnp.dot(h2, w3r[:, :], preferred_element_type=jnp.float32)
      h3 = (h3 + b3r[0].astype(jnp.float32)).astype(dtype)
      cur = cur[1 : rows_k - 1] + h3.reshape(rows_o, wp, c)

    out_ref[0] = cur.astype(out_ref.dtype)

  return kernel_fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_rb_chain_padded(x, params, act_name="relu", keep_pad=False):
  """Run N fused residual blocks; see module docstring.

  x: [B, H, W, C]. params: tuple of per-block (w1, b1, w2, b2, w3, b3).
  Returns [B, H, W, C], or [B, H, W + 2N, C] when keep_pad=True (the width
  pad columns carry garbage; feed them to a conv with negative padding).
  """
  return _impl(x, tuple(params), act_name, keep_pad)


def _fwd(x, params, act_name, keep_pad):
  return _impl(x, tuple(params), act_name, keep_pad), (x, tuple(params))


def _bwd(act_name, keep_pad, residuals, g):
  x, params = residuals
  act = getattr(jax.nn, act_name)
  if keep_pad:
    n = len(params)
    g = g[:, :, n : g.shape[2] - n, :]
  _, vjp = jax.vjp(lambda xx, pp: dense_rb_chain(xx, pp, act), x, params)
  return vjp(g)


fused_rb_chain_padded.defvjp(_fwd, _bwd)


def fused_rb_chain(x, params, act_name="relu"):
  return fused_rb_chain_padded(x, tuple(params), act_name, False)


def _impl(x, params, act_name, keep_pad):
  b, h, w_img, c = x.shape
  n = len(params)
  ch = params[0][0].shape[1]
  act = getattr(jax.nn, act_name)
  r_rows = _pick_rows(h)
  interpret = jax.default_backend() == "cpu"
  if (
      r_rows == 0
      or n == 0
      or jax.default_backend() not in ("tpu", "cpu")
      or h < r_rows
  ):
    out = dense_rb_chain(x, params, act)
    if keep_pad:
      out = jnp.pad(out, ((0, 0), (0, 0), (n, n), (0, 0)))
    return out

  wp = w_img + 2 * n
  dtype = x.dtype
  xp = jnp.pad(x, ((0, 0), (n, n), (n, n), (0, 0)))

  grid = (b, h // r_rows)
  rows_in = r_rows + 2 * n

  # Overlapping row windows (halo 2N) are built from a main R-row block
  # plus 2N single-row tail blocks at rows jR + R + t: single-row blocks
  # make the index map integral for ANY (R, N), unlike resblock.py's
  # fixed 2-row tail.
  specs = [
      pl.BlockSpec((1, r_rows, wp, c), lambda i, j: (i, j, 0, 0),
                   memory_space=pltpu.VMEM),
  ] + [
      pl.BlockSpec(
          (1, 1, wp, c),
          (lambda t: lambda i, j: (i, j * r_rows + r_rows + t, 0, 0))(t),
          memory_space=pltpu.VMEM,
      )
      for t in range(2 * n)
  ]
  flat_params = []
  for (w1, b1, w2, b2, w3, b3) in params:
    specs += [
        pl.BlockSpec((c, ch), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ch), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, ch, ch), lambda i, j: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ch), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    flat_params += [
        w1.astype(dtype), jnp.asarray(b1, jnp.float32).reshape(1, ch),
        w2.astype(dtype), jnp.asarray(b2, jnp.float32).reshape(1, ch),
        w3.astype(dtype), jnp.asarray(b3, jnp.float32).reshape(1, c),
    ]

  out = pl.pallas_call(
      _make_multi_ref_kernel(n, r_rows, w_img, wp, c, ch, dtype, act_name,
                             interpret),
      grid=grid,
      in_specs=specs,
      out_specs=pl.BlockSpec((1, r_rows, wp, c), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, h, wp, c), dtype),
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024
      ),
  )(*([xp] * (1 + 2 * n)), *flat_params)
  if keep_pad:
    return out
  return out[:, :, n : n + w_img, :]


def _make_multi_ref_kernel(n_blocks, r_rows, w_img, wp, c, ch, dtype,
                           act_name, interpret):
  base = _make_kernel(n_blocks, r_rows, w_img, wp, c, ch, dtype, act_name,
                      interpret)
  n_tail = 2 * n_blocks

  def kernel_fn(*refs_and_args):
    main_ref = refs_and_args[0]
    tail_refs = refs_and_args[1 : 1 + n_tail]
    args = refs_and_args[1 + n_tail :]

    class _Joined:
      def __getitem__(self, idx):
        assert idx == 0
        return jnp.concatenate(
            [main_ref[0]] + [t[0] for t in tail_refs], axis=0
        )

    base(_Joined(), *args)

  return kernel_fn
