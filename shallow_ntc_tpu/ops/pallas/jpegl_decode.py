"""Fused Pallas decode kernel for the JPEG-like synthesis transform.

JPEGLikeSynthesis with kernel_size == strides (= 16) is an affine map from
each latent vector to an independent 16x16x3 patch (reference
transforms.py:265-295): one [C_in, 16*16*3] matmul per latent pixel followed
by depth-to-space. XLA materializes the patch tensor in HBM between the
matmul and the d2s transpose; this kernel writes the matmul result straight
into the NHWC image layout, removing the intermediate HBM round trip.

Layout insight: a row-major [B, H, W, 3] image is byte-identical to
[B, H, W_l, k*3] (W = W_l * k), and output image row h = h_l*k + r of latent
row h_l is exactly  z[h_l] @ W_r + bias_r  with W_r = kernel[k-1-r]
spatially reversed -- a plain [W_l, C] x [C, k*3] matmul. The kernel grids
over (batch, latent row, patch row) with zero in-kernel reshapes/transposes;
the latent row block stays resident in VMEM across the k patch-row steps.

The k=18, s=16 paper variant overlaps patches by 2px (overlap-add); that
case falls back to XLA's conv_transpose.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_weights(kernel: jax.Array, bias: Optional[jax.Array]):
  """flax ConvTranspose kernel [k, k, C, c_out] (k == s) -> per-patch-row
  matmul weights [k, C, k*c_out] and bias rows [k, k*c_out].

  flax/lax conv_transpose correlates with the *unflipped* kernel over the
  dilated input, so output offset r maps to kernel index k-1-r in both
  spatial dims -- hence the double flip.
  """
  k = kernel.shape[0]
  c_in, c_out = kernel.shape[2], kernel.shape[3]
  w = jnp.flip(kernel, axis=(0, 1))  # index by output offset (r, rc)
  # [k(r), k(rc), C, c_out] -> [k(r), C, k(rc)*c_out]
  w = jnp.transpose(w, (0, 2, 1, 3)).reshape(k, c_in, k * c_out)
  if bias is None:
    bias = jnp.zeros((c_out,), kernel.dtype)
  bias_rows = jnp.tile(bias.reshape(1, 1, c_out), (k, k, 1)).reshape(k, k * c_out)
  return w, bias_rows


def _kernel(z_ref, w_ref, b_ref, out_ref):
  # z_ref: [1, 1, W_l, C]; w_ref: [1, C, k*c]; b_ref: [k, k*c] (full)
  # out_ref: [1, 1, W_l, k*c]
  r = pl.program_id(2)
  acc = jnp.dot(z_ref[0, 0], w_ref[0], preferred_element_type=jnp.float32)
  # Select bias row r without a dynamic sublane index (Mosaic needs static
  # or 8-aligned sublane offsets): mask-and-reduce over the tiny bias block.
  row_ids = jax.lax.broadcasted_iota(jnp.int32, b_ref.shape, 0)
  bias_row = jnp.sum(
      jnp.where(row_ids == r, b_ref[:, :].astype(jnp.float32), 0.0), axis=0
  )
  out_ref[0, 0] = (acc + bias_row).astype(out_ref.dtype)


def jpegl_synthesize(z: jax.Array, kernel: jax.Array, bias=None) -> jax.Array:
  """Fused JPEG-like decode: z [B, H_l, W_l, C] -> image [B, H_l*k, W_l*k, c].

  Numerically equivalent to flax ConvTranspose(features=c, kernel_size=(k,k),
  strides=(k,k), padding='SAME')(z) with the same kernel/bias.
  """
  k = kernel.shape[0]
  assert kernel.shape[0] == kernel.shape[1], "square kernels only"
  b, hl, wl, c_in = z.shape
  c_out = kernel.shape[3]
  w_packed, bias_rows = pack_weights(kernel, bias)
  w_packed = w_packed.astype(z.dtype)

  out = pl.pallas_call(
      _kernel,
      grid=(b, hl, k),
      in_specs=[
          pl.BlockSpec((1, 1, wl, c_in), lambda i, j, r: (i, j, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c_in, k * c_out), lambda i, j, r: (r, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((k, k * c_out), lambda i, j, r: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec(
          (1, 1, wl, k * c_out), lambda i, j, r: (i, j * k + r, 0, 0),
          memory_space=pltpu.VMEM,
      ),
      out_shape=jax.ShapeDtypeStruct((b, hl * k, wl, k * c_out), z.dtype),
      interpret=jax.default_backend() == "cpu",  # CPU: run interpreted (tests)
  )(z, w_packed, bias_rows)
  # [B, H, W_l, k*c] is byte-identical to [B, H, W_l*k, c].
  return out.reshape(b, hl * k, wl * k, c_out)


def jpegl_synthesize_xla(z: jax.Array, kernel: jax.Array, bias=None) -> jax.Array:
  """XLA reference path (lax.conv_transpose), for tests and fallback."""
  out = jax.lax.conv_transpose(
      z, kernel.astype(z.dtype), strides=(kernel.shape[0], kernel.shape[1]),
      padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
  )
  if bias is not None:
    out = out + bias.astype(out.dtype)
  return out
