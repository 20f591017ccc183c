"""Pallas kernel for the TwoLayer decoder's final stage (k5 s2 from phase space).

The fused decoder leaves the mid activation in s1=8 phase space
[B, H/16, W/16, 64*C]. The dense XLA formulation of the final k5s2 deconv
(packed_conv_transpose) multiplies against a [3, 3, 64C, 256*c_out] kernel
whose blocks are ~96% zeros (each output phase touches <=3 of the 8 input
phases per axis); it runs at ~80% MXU utilization *on 8x redundant FLOPs*.

This kernel exploits the sparsity: for each output row-phase pair
(q, r in {0,1}) it contracts only the <=3 needed input phase blocks, sliced
in VMEM at 128-aligned channel offsets. Geometry (all static, python-unrolled):

  output row O = 16*x + 2*q + r;   mid row X = 8*x' + q' with
  O = 2*X + r  =>  per (q, r): height taps d in {-1,0,1} with kernel row
  t_h = 3 - r + 2d (valid in [0,5)), input phase (q+d) mod 8 taken from
  mid row x + (q+d)//8. Width is identical and folded into the weight matrix
  (3 shifted copies of each row are prepared with pltpu.roll).

Layout contract:
  input  mid_pad  [B, H+2, W+2, 8*128]  (H/W padded by 1; each of the 8
                  height-phase channel blocks padded 12*8=96 -> 128 lanes)
  output          [B, H, 8, W, 96]      (channels = (r, Rw, c_out)); callers
                  reshape/interleave to [B, 16H, 16W, c_out].
Batch pairs (2 images) share each grid cell so matmuls run at M=96.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S1 = 8        # phase factor of the mid tensor
S2 = 2        # stride of the final deconv
SP = S1 * S2  # 16
CBLK = 128    # padded lanes per height-phase block


def _taps(k: int, r: int):
  """Valid (d, t) pairs for sub-phase r: t = P0 - r + S2*d in [0, k)."""
  p0 = k - 1 - max(k - S2, 0) // 2
  out = []
  for d in (-1, 0, 1):
    t = p0 - r + S2 * d
    if 0 <= t < k:
      out.append((d, t))
  return out


@functools.lru_cache(maxsize=None)
def _selection_tensors(k: int) -> Tuple[np.ndarray, np.ndarray]:
  """Static 0/1 tensors A[i, t_h, r] and B[w_slot, pw, t_w, Rw].

  A marks valid height taps per slot i = d+1 (the (q, d) -> row/phase
  bookkeeping lives in the kernel body, independent of q here).
  B marks width taps: output Rw = 2*qw + rw_sub reads mid width phase pw
  from shift slot w_slot.
  """
  a = np.zeros((3, k, S2), np.float32)
  for r in range(S2):
    for d, t_h in _taps(k, r):
      a[d + 1, t_h, r] = 1.0
  bsel = np.zeros((3, S1, k, SP), np.float32)
  for qw in range(S1):
    for rw_sub in range(S2):
      Rw = S2 * qw + rw_sub
      for dw, t_w in _taps(k, rw_sub):
        bsel[(qw + dw) // S1 + 1, (qw + dw) % S1, t_w, Rw] = 1.0
  return a, bsel


def build_weights(kernel: jax.Array, c_in: int) -> jax.Array:
  """flax deconv kernel [k, k, c_in, c_out] -> W [8, 9*CBLK, 2*16*c_out].

  Traceable (pure einsum/pad/reshape of the kernel parameter).
  K layout: (i = d+1 height-tap slot, w_slot, pw*c_in + ci zero-padded to
  CBLK). N layout: (r, Rw, c_out). Identical for every q (the q-dependent
  row/phase selection happens in the kernel body), so the per-q weight is
  one broadcast.
  """
  k = kernel.shape[0]
  c_out = kernel.shape[3]
  a, bsel = _selection_tensors(k)
  aj = jnp.asarray(a, jnp.float32)
  bj = jnp.asarray(bsel, jnp.float32)
  # [d_slot, w_slot, pw, ci, r, Rw, co]
  w = jnp.einsum(
      "dtr,wpsu,tsco->dwpcruo", aj, bj, kernel.astype(jnp.float32),
      precision=jax.lax.Precision.HIGHEST,
  )
  # pad the (pw, ci) block 96 -> CBLK lanes; flatten K = (d_slot, w_slot, blk)
  w = w.reshape(3, 3, S1 * c_in, S2 * SP * c_out)
  w = jnp.pad(w, ((0, 0), (0, 0), (0, CBLK - S1 * c_in), (0, 0)))
  return w.reshape(3 * 3 * CBLK, S2 * SP * c_out)


def build_weights_per_shift(kernel: jax.Array, c_in: int) -> jax.Array:
  """Like build_weights but stacked per width shift: [3, 3*CBLK, 2*16*c_out].

  W[ws] has K layout (d_slot, blk) and is contracted against the UNSHIFTED
  mega row; the width tap is applied afterwards by rolling the f32 partial
  products along the row (sublane) axis -- see final_deconv_phase_rolled.
  """
  k = kernel.shape[0]
  c_out = kernel.shape[3]
  a, bsel = _selection_tensors(k)
  aj = jnp.asarray(a, jnp.float32)
  bj = jnp.asarray(bsel, jnp.float32)
  w = jnp.einsum(
      "dtr,wpsu,tsco->dwpcruo", aj, bj, kernel.astype(jnp.float32),
      precision=jax.lax.Precision.HIGHEST,
  )
  w = w.reshape(3, 3, S1 * c_in, S2 * SP * c_out)
  w = jnp.pad(w, ((0, 0), (0, 0), (0, CBLK - S1 * c_in), (0, 0)))
  # (d_slot, w_slot, blk, n) -> (w_slot, d_slot*blk, n)
  return jnp.transpose(w, (1, 0, 2, 3)).reshape(
      3, 3 * CBLK, S2 * SP * c_out
  )


def _make_rolled_kernel(c_out: int, wl: int, wp: int, dtype, interpret: bool):
  """Kernel body for the unshifted-input variant.

  refs: own [2, 1, WP, 8*CBLK], above [2, 1, WP, CBLK], below [2, 1, WP, CBLK],
        w_ref [3, 3*CBLK, n_cols], b_ref [1, n_cols]
  out:  [2, 1, 8, wl, n_cols]
  WP = wl + 2 (halo) rounded up to a sublane multiple so per-batch row
  offsets stay 8-aligned.
  """
  n_cols = S2 * SP * c_out

  def roll_rows(x, shift):
    if interpret:
      return jnp.roll(x, shift, axis=0)
    # pltpu.roll requires a non-negative shift; wrap modulo the axis size.
    return pltpu.roll(x, shift=shift % x.shape[0], axis=0)

  def kernel_fn(own, above, below, w_ref, b_ref, out_ref):
    # Mega segment: slots = [above:p7, own:p0..p7, below:p0], one copy each
    # (no width shifts): [2*WP, 10*CBLK].
    rows = []
    for b in range(2):
      pieces = [above[b, 0]]
      pieces += [
          own[b, 0][:, ph * CBLK : (ph + 1) * CBLK] for ph in range(S1)
      ]
      pieces.append(below[b, 0])
      rows.append(jnp.concatenate(pieces, axis=1))
    mega = jnp.concatenate(rows, axis=0)  # [2*WP, 10*CBLK]

    for q in range(S1):
      seg = mega[:, q * CBLK : (q + 3) * CBLK]  # [2*WP, 384]
      acc = None
      for ws in range(3):
        part = jnp.dot(
            seg, w_ref[ws], preferred_element_type=jnp.float32
        )  # [2*WP, n_cols]
        # out[w] = sum_ws part_ws[w + ws]  (padded row coords)
        part = roll_rows(part, -ws)
        acc = part if acc is None else acc + part
      acc = acc + b_ref[0].astype(jnp.float32)
      for b in range(2):
        out_ref[b, 0, q] = acc[b * wp : b * wp + wl, :].astype(out_ref.dtype)

  return kernel_fn


def _make_rolled2_kernel(
    c_out: int, wl: int, wp: int, nb: int, dtype, interpret: bool
):
  """Two output rows (x nb batch images) per grid cell: halves the per-cell
  fixed costs (DMA issue, mega assembly, matmul count per output row) and
  multiplies matmul M.

  refs: row0..row3 [nb, 1, WP, *] = padded rows 2j .. 2j+3 (row0 carries only
  the phase-7 block, row3 only the phase-0 block; rows 1-2 are full),
  w_ref [3, 3*CBLK, n_cols], b_ref [1, n_cols]
  out:  [nb, 2, 8, wl, n_cols]  (batch block x row pair)
  """
  n_cols = S2 * SP * c_out

  def roll_rows(x, shift):
    if interpret:
      return jnp.roll(x, shift, axis=0)
    return pltpu.roll(x, shift=shift % x.shape[0], axis=0)

  def kernel_fn(row0, row1, row2, row3, w_ref, b_ref, out_ref):
    full = (row1, row2)
    # Mega rows ordered (b, r)-major: [b0r0, b0r1, b1r0, ...], each WP rows.
    megas = []
    for b in range(nb):
      for r in range(2):
        own = full[r][b, 0]
        above = (
            row0[b, 0] if r == 0
            else full[0][b, 0][:, (S1 - 1) * CBLK : S1 * CBLK]
        )
        below = (
            full[1][b, 0][:, 0:CBLK] if r == 0 else row3[b, 0]
        )
        pieces = [above]
        pieces += [own[:, ph * CBLK : (ph + 1) * CBLK] for ph in range(S1)]
        pieces.append(below)
        megas.append(jnp.concatenate(pieces, axis=1))
    mega = jnp.concatenate(megas, axis=0)  # [nb*2*WP, 10*CBLK]

    for q in range(S1):
      seg = mega[:, q * CBLK : (q + 3) * CBLK]  # [nb*2*WP, 384]
      acc = None
      for ws in range(3):
        part = jnp.dot(seg, w_ref[ws], preferred_element_type=jnp.float32)
        part = roll_rows(part, -ws)  # out[w] = sum_ws part_ws[w + ws]
        acc = part if acc is None else acc + part
      acc = acc + b_ref[0].astype(jnp.float32)
      for b in range(nb):
        for r in range(2):
          base = (2 * b + r) * wp
          out_ref[b, r, q] = acc[base : base + wl, :].astype(out_ref.dtype)

  return kernel_fn


def _final_deconv_phase_rolled_impl(
    mid_p: jax.Array, kernel: jax.Array, bias, c_in: int
) -> jax.Array:
  """Unshifted-DMA variant of _final_deconv_phase_impl: one copy of each row
  is fetched (vs 3 width-shifted copies) and the width taps are applied by
  rolling the f32 partial products inside the kernel. Cuts the XLA pre-shift
  pass and most of the per-cell DMA (the kernel is DMA/overhead-bound).
  Processes 2 output rows per grid cell when the height is even; odd batch
  sizes (per-image eval) use single-image cells."""
  b, h, wl, _ = mid_p.shape
  k = kernel.shape[0]
  c_out = kernel.shape[3]
  n_cols = S2 * SP * c_out
  dtype = mid_p.dtype
  interpret = jax.default_backend() == "cpu"
  two_rows = h % 2 == 0
  nb = 2 if b % 2 == 0 else 1
  assert two_rows or b % 2 == 0, "odd batch needs even height"

  wp = ((wl + 2) + 7) // 8 * 8  # halo + sublane alignment
  xb = mid_p.reshape(b, h, wl, S1, S1 * c_in)
  xb = jnp.pad(
      xb, ((0, 0), (1, 1), (1, wp - wl - 1), (0, 0), (0, CBLK - S1 * c_in))
  )
  xb = xb.reshape(b, h + 2, wp, S1 * CBLK)

  w_arr = build_weights_per_shift(kernel, c_in).astype(dtype)
  if bias is None:
    bias = jnp.zeros((c_out,), dtype)
  b_arr = jnp.tile(jnp.asarray(bias, jnp.float32), S2 * SP).reshape(1, n_cols)

  w_spec = pl.BlockSpec((3, 3 * CBLK, n_cols), lambda i, j: (0, 0, 0),
                        memory_space=pltpu.VMEM)
  bias_spec = pl.BlockSpec((1, n_cols), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
  if two_rows:
    in_specs = [
        pl.BlockSpec((nb, 1, wp, CBLK), lambda i, j: (i, 2 * j, 0, S1 - 1),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, 1, wp, S1 * CBLK), lambda i, j: (i, 2 * j + 1, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, 1, wp, S1 * CBLK), lambda i, j: (i, 2 * j + 2, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, 1, wp, CBLK), lambda i, j: (i, 2 * j + 3, 0, 0),
                     memory_space=pltpu.VMEM),
        w_spec, bias_spec,
    ]
    out = pl.pallas_call(
        _make_rolled2_kernel(c_out, wl, wp, nb, dtype, interpret),
        grid=(b // nb, h // 2),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (nb, 2, S1, wl, n_cols), lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, S1, wl, n_cols), dtype),
        interpret=interpret,
    )(xb, xb, xb, xb, w_arr, b_arr)
  else:
    in_specs = [
        pl.BlockSpec((2, 1, wp, S1 * CBLK), lambda i, j: (i, j + 1, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1, wp, CBLK), lambda i, j: (i, j, 0, S1 - 1),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1, wp, CBLK), lambda i, j: (i, j + 2, 0, 0),
                     memory_space=pltpu.VMEM),
        w_spec, bias_spec,
    ]
    out = pl.pallas_call(
        _make_rolled_kernel(c_out, wl, wp, dtype, interpret),
        grid=(b // 2, h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (2, 1, S1, wl, n_cols), lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, S1, wl, n_cols), dtype),
        interpret=interpret,
    )(xb, xb, xb, w_arr, b_arr)

  out = out.reshape(b, h, S1, wl, S2, SP * c_out)
  out = jnp.transpose(out, (0, 1, 2, 4, 3, 5))
  return out.reshape(b, h * SP, wl * SP, c_out)


def _make_kernel(c_out: int, wl: int, dtype):
  n_cols = S2 * SP * c_out  # 96 for c_out=3

  def kernel_fn(*refs):
    # refs layout (width pre-shifted in XLA; see final_deconv_phase):
    #   0..2   own row, 3 width shifts          [2, 1, W, 8*CBLK]
    #   3..5   row above, phase-7 block only    [2, 1, W, CBLK]
    #   6..8   row below, phase-0 block only    [2, 1, W, CBLK]
    #   9 w_ref [9*CBLK, n_cols]; 10 b_ref [1, n_cols]
    # out_ref: [2, 1, 8, W, n_cols]
    own, above, below = refs[0:3], refs[3:6], refs[6:9]
    w_ref, b_ref, out_ref = refs[9], refs[10], refs[11]

    # One 10-slot mega segment per cell: slots = [above:p7, own:p0..p7,
    # below:p0], each slot = 3 width shifts x CBLK lanes. Every q then
    # contracts the contiguous (384-aligned) slice [q*384, (q+3)*384).
    slot_w = 3 * CBLK
    mega_rows = []
    for b in range(2):
      pieces = []
      for slot in range(S1 + 2):
        for w_slot in range(3):
          if slot == 0:
            pieces.append(above[w_slot][b, 0])
          elif slot == S1 + 1:
            pieces.append(below[w_slot][b, 0])
          else:
            phase = slot - 1
            pieces.append(
                own[w_slot][b, 0][:, phase * CBLK : (phase + 1) * CBLK]
            )
      mega_rows.append(jnp.concatenate(pieces, axis=1))  # [W, 10*384]
    mega = jnp.concatenate(mega_rows, axis=0)  # [2W, 10*384]

    for q in range(S1):
      seg = mega[:, q * slot_w : (q + 3) * slot_w]  # [2W, 1152]
      acc = jnp.dot(seg, w_ref[:, :], preferred_element_type=jnp.float32)
      acc = acc + b_ref[0].astype(jnp.float32)
      for b in range(2):
        out_ref[b, 0, q] = acc[b * wl : (b + 1) * wl, :].astype(out_ref.dtype)

  return kernel_fn


def _reference_final_deconv(mid_p, kernel, bias, c_in):
  """Exact XLA formulation of the same function (fully differentiable)."""
  from shallow_ntc_tpu.ops import fast_deconv as fd

  del c_in
  return fd.packed_conv_transpose(
      fd.partial_depth_to_space(mid_p, S1, S1), kernel, bias, S2, S1
  )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def final_deconv_phase(
    mid_p: jax.Array, kernel: jax.Array, bias, c_in: int
) -> jax.Array:
  """mid_p [B, H, W, 64*c_in] (s1=8 phase space) -> image [B, 16H, 16W, c_out].

  Equivalent to depth_to_space(mid_p, 8) followed by the SAME k-x-k stride-2
  conv-transpose `kernel` (+ bias). B must be even (batch pairs per cell).

  Differentiable: pallas_call has no autodiff rule, so the custom VJP routes
  the backward pass through the exact dense XLA formulation
  (packed_conv_transpose) -- the same function, so gradients are exact; the
  fast Pallas kernel keeps the forward pass (which training/itinf also runs).
  """
  return _final_deconv_phase_impl(mid_p, kernel, bias, c_in)


def _final_deconv_fwd(mid_p, kernel, bias, c_in):
  return _final_deconv_phase_impl(mid_p, kernel, bias, c_in), (
      mid_p, kernel, bias)


def _final_deconv_bwd(c_in, residuals, g):
  mid_p, kernel, bias = residuals
  _, vjp = jax.vjp(
      lambda m, k, b: _reference_final_deconv(m, k, b, c_in),
      mid_p, kernel, bias,
  )
  return vjp(g)


final_deconv_phase.defvjp(_final_deconv_fwd, _final_deconv_bwd)


def _final_deconv_phase_impl(
    mid_p: jax.Array, kernel: jax.Array, bias, c_in: int
) -> jax.Array:
  import os

  if (
      os.environ.get("SNTC_FINAL_KERNEL", "rolled") == "rolled"
      or mid_p.shape[0] % 2 != 0  # shifted variant needs batch pairs
  ):
    return _final_deconv_phase_rolled_impl(mid_p, kernel, bias, c_in)
  b, h, wl, _ = mid_p.shape
  assert b % 2 == 0, "batch must be even for the pairing scheme"
  k = kernel.shape[0]
  c_out = kernel.shape[3]
  n_cols = S2 * SP * c_out
  dtype = mid_p.dtype

  # Pad each 96-channel phase block to 128 lanes, plus 1px spatial halo.
  xb = mid_p.reshape(b, h, wl, S1, S1 * c_in)
  xb = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0), (0, CBLK - S1 * c_in)))
  xb = xb.reshape(b, h + 2, wl + 2, S1 * CBLK)

  w_arr = build_weights(kernel, c_in).astype(dtype)
  if bias is None:
    bias = jnp.zeros((c_out,), dtype)
  b_arr = jnp.tile(jnp.asarray(bias, jnp.float32), S2 * SP).reshape(1, n_cols)

  # Width-shifted copies (Mosaic rejects unaligned in-kernel sublane slices).
  x_shifts = [xb[:, :, w_slot : w_slot + wl, :] for w_slot in range(3)]
  inputs = []
  in_specs = []
  # Own row: all 8 phase blocks, 3 shifts.
  for w_slot in range(3):
    inputs.append(x_shifts[w_slot])
    in_specs.append(
        pl.BlockSpec(
            (2, 1, wl, S1 * CBLK),
            lambda i, jj: (i, jj + 1, 0, 0),
            memory_space=pltpu.VMEM,
        )
    )
  # Neighbor rows contribute exactly one phase block each (phase 7 from the
  # row above for q=0, phase 0 from the row below for q=7): DMA only that
  # 128-lane block instead of the full row -- the kernel is DMA-bound.
  for row_off, phase in ((0, S1 - 1), (2, 0)):
    for w_slot in range(3):
      inputs.append(x_shifts[w_slot])
      in_specs.append(
          pl.BlockSpec(
              (2, 1, wl, CBLK),
              lambda i, jj, off=row_off, ph=phase: (i, jj + off, 0, ph),
              memory_space=pltpu.VMEM,
          )
      )
  in_specs += [
      pl.BlockSpec((9 * CBLK, n_cols), lambda i, j: (0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((1, n_cols), lambda i, j: (0, 0),
                   memory_space=pltpu.VMEM),
  ]
  out = pl.pallas_call(
      _make_kernel(c_out, wl, dtype),
      grid=(b // 2, h),
      in_specs=in_specs,
      out_specs=pl.BlockSpec(
          (2, 1, S1, wl, n_cols), lambda i, j: (i, j, 0, 0, 0),
          memory_space=pltpu.VMEM,
      ),
      out_shape=jax.ShapeDtypeStruct((b, h, S1, wl, n_cols), dtype),
      interpret=jax.default_backend() == "cpu",
  )(*inputs, w_arr, b_arr)

  # [b, x, q, w, (r, Rw, c)] -> [b, 16x + 2q + r, 16w + Rw, c]
  out = out.reshape(b, h, S1, wl, S2, SP * c_out)
  out = jnp.transpose(out, (0, 1, 2, 4, 3, 5))
  return out.reshape(b, h * SP, wl * SP, c_out)
