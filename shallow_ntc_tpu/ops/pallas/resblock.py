"""Fused ELIC ResidualBlock Pallas kernel (encode-side hot path).

One block is x + c3(relu(c2(relu(c1(x))))) with c1: 1x1 C->C/2,
c2: 3x3 C/2->C/2 SAME, c3: 1x1 C/2->C (reference common/elic.py:41-68).
XLA runs the three convs as separate HBM round trips; at ELIC's stage-1
resolution the chain is bandwidth-bound (~40% MXU, PERF_NOTES.md). This
kernel keeps the two intermediates in VMEM: per grid cell it reads R+2 input
rows once and writes R output rows once.

Geometry per cell (one batch image, R consecutive rows, full width):
  x is zero-padded to [B, H+2, Wp, C] (1px halo, Wp = W+2). Cell (b, j)
  consumes padded rows [jR, jR+R+2) via two refs (an R-row block + the next
  block's first 2 rows, which is expressible with affine block index maps
  when R is even) and emits unpadded rows [jR, jR+R).

  c1/c3 are plain matmuls over the flattened [(R+2)*Wp, C] tile. c2 runs as
  3 matmuls over the width-concatenated tensor [rows, Wp, 3*(C/2)] (built
  with two sublane rolls), one per height tap, combined with rolls along the
  flattened row axis (a multiple of Wp, i.e. whole padded rows).

  SAME semantics: c2 must see ZERO h1 at image-edge positions, but
  h1 = relu(0 @ w1 + b1) = relu(b1) != 0 at padding pixels, so the kernel
  masks h1 at padded columns and at the image's top/bottom padded rows
  (detected via the row-block program id).

Differentiable via custom_vjp through the dense XLA formulation (exact same
math), like ops/pallas/twolayer_final.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dense_resblock(x, w1, b1, w2, b2, w3, b3, act):
  """Exact XLA formulation (used for CPU fallback and the backward pass)."""
  dn = lambda a, k: jax.lax.conv_dimension_numbers(
      a.shape, k.shape, ("NHWC", "HWIO", "NHWC")
  )
  h = act(
      jax.lax.conv_general_dilated(
          x, w1[None, None], (1, 1), "SAME", dimension_numbers=dn(x, w1[None, None])
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
          h, w3[None, None], (1, 1), "SAME", dimension_numbers=dn(h, w3[None, None])
      )
      + b3
  )
  return x + h


def _pick_rows(h: int) -> int:
  for r in (8, 4, 2):
    if h % r == 0:
      return r
  return 0


def _make_kernel(r_rows, wl, wp, c, ch, dtype, act_name, interpret):
  def roll(x, shift, axis=0):
    if interpret:
      return jnp.roll(x, shift, axis=axis)
    return pltpu.roll(x, shift=shift % x.shape[axis], axis=axis)

  act = getattr(jax.nn, act_name)
  m = (r_rows + 2) * wp

  def kernel_fn(main_ref, tail_ref, w1r, b1r, w2r, b2r, w3r, b3r, out_ref):
    j = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    x_tile = jnp.concatenate([main_ref[0], tail_ref[0]], axis=0)  # [R+2, Wp, C]
    x_flat = x_tile.reshape(m, c)

    h1 = jnp.dot(x_flat, w1r[:, :], preferred_element_type=jnp.float32)
    h1 = act(h1 + b1r[0].astype(jnp.float32))

    # Zero h1 wherever c2's SAME padding requires zeros: the two padded
    # columns of every row, and the image's top/bottom padded rows (which
    # appear only in the first/last row blocks).
    flat_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    col = jax.lax.rem(flat_idx, wp)
    keep = jnp.logical_and(col != 0, col != wp - 1)
    row = jax.lax.div(flat_idx, wp)
    keep = jnp.logical_and(keep, jnp.logical_or(j != 0, row != 0))
    keep = jnp.logical_and(
        keep, jnp.logical_or(j != n_blocks - 1, row != r_rows + 1)
    )
    h1 = jnp.where(keep, h1, 0.0)

    # 3x3 conv. Height taps: major-dim rolls of the 3D tile are relayout-free
    # (unlike sublane rolls), so the three height-shifted copies CAN be
    # lane-concatenated -> one K=3*ch matmul per width tap. Mosaic only
    # rotates 32-bit data, so the rolls/concat run in f32 and the matmul
    # operand is cast afterwards. Width taps: the f32 partial products get
    # one +-1 sublane roll each; the roll wraps within each padded row, so
    # wrapped values land on padded columns that the output slice drops.
    # Halo rows likewise absorb the height wrap.
    h13 = h1.reshape(r_rows + 2, wp, ch)
    hcat = jnp.concatenate(
        [roll(h13, 1, axis=0), h13, roll(h13, -1, axis=0)], axis=2
    ).reshape(m, 3 * ch).astype(dtype)  # (dr=-1 | 0 | +1) stacked on lanes
    acc = None
    for dw in (-1, 0, 1):
      p = jnp.dot(
          hcat, w2r[dw + 1], preferred_element_type=jnp.float32
      ).reshape(r_rows + 2, wp, ch)
      p = roll(p, -dw, axis=1)
      acc = p if acc is None else acc + p
    h2 = act(acc.reshape(m, ch) + b2r[0].astype(jnp.float32)).astype(dtype)

    h3 = jnp.dot(h2, w3r[:, :], preferred_element_type=jnp.float32)
    h3 = (h3 + b3r[0].astype(jnp.float32)).astype(dtype)
    out = (x_flat + h3).reshape(r_rows + 2, wp, c)[1 : r_rows + 1]
    out_ref[0] = out.astype(out_ref.dtype)

  return kernel_fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_resblock(x, w1, b1, w2, b2, w3, b3, act_name="relu"):
  """x [B, H, W, C] -> x + c3(act(c2(act(c1(x))))), c2 3x3 SAME.

  w1 [C, C/2], w2 [3, 3, C/2, C/2], w3 [C/2, C]. Falls back to the dense XLA
  formulation off-TPU or for heights without an even row-block divisor.
  """
  return _fused_resblock_impl(x, w1, b1, w2, b2, w3, b3, act_name)


def _fused_resblock_fwd(x, w1, b1, w2, b2, w3, b3, act_name):
  out = _fused_resblock_impl(x, w1, b1, w2, b2, w3, b3, act_name)
  return out, (x, w1, b1, w2, b2, w3, b3)


def _fused_resblock_bwd(act_name, residuals, g):
  x, w1, b1, w2, b2, w3, b3 = residuals
  act = getattr(jax.nn, act_name)
  _, vjp = jax.vjp(
      lambda *a: _dense_resblock(*a, act=act), x, w1, b1, w2, b2, w3, b3
  )
  return vjp(g)


fused_resblock.defvjp(_fused_resblock_fwd, _fused_resblock_bwd)


def _fused_resblock_impl(x, w1, b1, w2, b2, w3, b3, act_name):
  b, h, wl, c = x.shape
  ch = w1.shape[1]
  r_rows = _pick_rows(h)
  interpret = jax.default_backend() == "cpu"
  act = getattr(jax.nn, act_name)
  if (
      r_rows == 0
      or jax.default_backend() not in ("tpu", "cpu")
      or h < 2 * r_rows  # need >= 2 row blocks for the tail-ref scheme
  ):
    return _dense_resblock(x, w1, b1, w2, b2, w3, b3, act=act)

  wp = wl + 2
  dtype = x.dtype
  xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

  # [3, 3ch, ch]: per width tap dw, the height taps stacked on the K axis in
  # the kernel's hcat order (dr = -1, 0, +1).
  w2c = jnp.stack(
      [
          jnp.concatenate([w2[0, dw], w2[1, dw], w2[2, dw]], axis=0)
          for dw in range(3)
      ]
  ).astype(dtype)

  grid = (b, h // r_rows)
  specs = [
      pl.BlockSpec((1, r_rows, wp, c), lambda i, j: (i, j, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec(
          (1, 2, wp, c),
          lambda i, j: (i, (j * r_rows + r_rows) // 2, 0, 0),
          memory_space=pltpu.VMEM,
      ),
      pl.BlockSpec((c, ch), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
      pl.BlockSpec((1, ch), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
      pl.BlockSpec((3, 3 * ch, ch), lambda i, j: (0, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, ch), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
      pl.BlockSpec((ch, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
      pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
  ]
  out = pl.pallas_call(
      _make_kernel(r_rows, wl, wp, c, ch, dtype, act_name, interpret),
      grid=grid,
      in_specs=specs,
      out_specs=pl.BlockSpec((1, r_rows, wp, c), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, h, wp, c), dtype),
      interpret=interpret,
      # The f32 roll/concat intermediates at 8 rows/cell need ~26 MB of
      # scoped VMEM (v5e has 128 MB physical); the default scoped limit is
      # 16 MB. utils/jax_setup adds the matching
      # --xla_tpu_scoped_vmem_limit_kib flag (forwarded per-compile).
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=64 * 1024 * 1024
      ),
  )(
      xp, xp,
      w1.astype(dtype), jnp.asarray(b1, jnp.float32).reshape(1, ch),
      w2c, jnp.asarray(b2, jnp.float32).reshape(1, ch),
      w3.astype(dtype), jnp.asarray(b3, jnp.float32).reshape(1, c),
  )
  return out[:, :, 1 : wl + 1, :]
