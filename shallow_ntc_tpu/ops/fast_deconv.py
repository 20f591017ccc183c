"""Subpixel (phase-decomposed) transposed convolution for TPU.

XLA lowers `lax.conv_transpose` (input dilation) poorly on TPU for the big
strided deconvs in this framework's decoders (k13s8, k5s2, k16/18s16): the
measured flagship decode ran at <10% of MXU peak. This module rewrites any
SAME conv-transpose as a *dense* stride-1 convolution producing s*s output
phases followed by depth-to-space -- the classic subpixel decomposition --
which XLA tiles onto the MXU like any ordinary conv.

Math: for flax/lax SAME conv_transpose with kernel K [k, k, C_in, C_out]
(cross-correlated, unflipped, over the s-dilated input padded by
P = k-1-max(k-s,0)//2 on the low side), output position o = s*b + r satisfies

    out[s*b + r] = sum_d z[b + d] * K[P - r + s*d]   for P - r + s*d in [0, k)

so phase r is a stride-1 conv over z with taps d in a fixed small window
[dmin, dmax]. All s*s phases stack into one conv with T = dmax-dmin+1 taps
per axis and s*s*C_out output channels (zero-padded where a phase has fewer
taps), then depth_to_space(s) interleaves the phases. Equality with
lax.conv_transpose is exact (tested for every (k, s) used by the paper).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shallow_ntc_tpu.ops import int8ops


def _s1_conv(x, w, pad, dn, precision):
  """The stride-1 dense conv all phase-space lowerings funnel through.

  Routed to the int8 MXU path (ops/int8ops.py) when int8 decode is enabled;
  int8 is inference-only (zero quantizer gradient), so training and SGA
  itinf keep the float path."""
  if int8ops.enabled():
    return int8ops.conv_s1_int8(x, w, pad, dn, x.dtype)
  return jax.lax.conv_general_dilated(
      x, w, (1, 1), pad, dimension_numbers=dn, precision=precision
  )


@functools.lru_cache(maxsize=None)
def _phase_geometry(k: int, s: int) -> Tuple[int, int, np.ndarray, np.ndarray]:
  """Static tap geometry: (dmin, T, t_idx[s, T], valid[s, T])."""
  pad_fwd_lo = max(k - s, 0) // 2
  p = k - 1 - pad_fwd_lo
  d_candidates = range(-(k // s) - 1, k // s + 2)
  dmin, dmax = None, None
  for r in range(s):
    for d in d_candidates:
      t = p - r + s * d
      if 0 <= t < k:
        dmin = d if dmin is None else min(dmin, d)
        dmax = d if dmax is None else max(dmax, d)
  T = dmax - dmin + 1
  t_idx = np.zeros((s, T), np.int32)
  valid = np.zeros((s, T), bool)
  for r in range(s):
    for j in range(T):
      t = p - r + s * (dmin + j)
      if 0 <= t < k:
        t_idx[r, j] = t
        valid[r, j] = True
  return dmin, T, t_idx, valid


def _phase_kernel_6d(kernel: jax.Array, stride: int):
  """[k, k, C_in, C_out] -> ([T, s, T, s, C_in, C_out], dmin, T) where axes
  are (j_h, r_h, j_w, r_w, ci, co); see phase_kernel for the mapping."""
  k = kernel.shape[0]
  s = stride
  dmin, T, _, _ = _phase_geometry(k, s)
  p = k - 1 - max(k - s, 0) // 2
  start = p + s * dmin - s + 1
  total = T * s
  pad_front = max(0, -start)
  pad_back = max(0, start + total - k)
  kp = jnp.pad(kernel, ((pad_front, pad_back), (pad_front, pad_back), (0, 0), (0, 0)))
  off = start + pad_front
  kp = kp[off : off + total, off : off + total]
  c_in, c_out = kernel.shape[2], kernel.shape[3]
  w = kp.reshape(T, s, T, s, c_in, c_out)
  w = w[:, ::-1, :, ::-1]  # r' = s-1-r  ->  phase order r
  return w, dmin, T


@functools.lru_cache(maxsize=None)
def _phase_groups(k: int, s: int, exact: bool = False):
  """Group phases by their tap window; returns per-axis groups
  [(j0, Tg, phases_tuple)] in j-index units relative to dmin.

  exact=False groups by window start only (adjacent-width windows merge, so
  a group may still carry one padded tap); exact=True groups by
  (start, width) so every group conv multiplies only true kernel taps
  (k13s8: 3 exact groups with 2+1+2 taps = the 13 effective taps; k5s2:
  2 exact groups with 2+3 taps = the 5)."""
  _, T, t_idx, valid = _phase_geometry(k, s)
  by_window = {}
  for r in range(s):
    js = [j for j in range(T) if valid[r, j]]
    key = (min(js), max(js)) if exact else (min(js),)
    by_window.setdefault(key, []).append(r)
  groups = []
  for key, phases in sorted(by_window.items()):
    j0 = key[0]
    jmax = max(
        j for r in phases for j in range(T) if valid[r, j]
    )
    groups.append((j0, jmax - j0 + 1, tuple(phases)))
  return tuple(groups)


def grouped_phase_pieces(
    z: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    stride: int,
    precision=None,
    group_width: bool = False,
    exact: bool = False,
):
  """Phase conv as per-tap-window group convs.

  Skips phase_conv's zero tap padding (k13s8 pads the 13 effective taps/axis
  to T*s = 24; the two tap-window groups use 2*8 = 16). Returns
  (pieces, phase_lists): pieces[i] is a [B, h, w, len(phase_lists[i]) * C_out]
  conv output whose channels are (flat_phase, c)-major with
  flat_phase = r_h * s + r_w iterating phase_lists[i] in order. No channel
  permutation is applied -- callers that need the canonical phase_conv layout
  use canonicalize_pieces (contiguous slices, not a gather).

  group_width=False (default) groups the HEIGHT axis only: fewer FLOP savings
  on paper (2/3 vs 4/9 dense for k13s8) but each piece's phases are already
  canonically ordered, so canonicalize_pieces is a single 2-way concat and
  per-piece elementwise/GDN work stays in a few wide ops -- measured faster
  end-to-end than 2D grouping, whose 4-way piece interleave pays more in
  reassembly than the extra conv FLOPs cost (PERF_NOTES round 2).
  """
  s = stride
  k = kernel.shape[0]
  c_out = kernel.shape[3]
  w6, dmin, T = _phase_kernel_6d(kernel, s)
  groups = _phase_groups(k, s, exact)
  w_groups = groups if group_width else ((0, T, tuple(range(s))),)
  pieces = []
  phase_lists = []
  for j0h, tgh, ph in groups:
    for j0w, tgw, pw in w_groups:
      wg = w6[j0h : j0h + tgh][:, jnp.asarray(ph)]
      wg = wg[:, :, j0w : j0w + tgw][:, :, :, jnp.asarray(pw)]
      # [tgh, |ph|, tgw, |pw|, ci, co] -> [tgh, tgw, ci, |ph|*|pw|*co]
      wg = jnp.transpose(wg, (0, 2, 4, 1, 3, 5)).reshape(
          tgh, tgw, kernel.shape[2], len(ph) * len(pw) * c_out
      ).astype(z.dtype)
      gmin_h, gmin_w = dmin + j0h, dmin + j0w
      pad = [(-gmin_h, tgh - 1 + gmin_h), (-gmin_w, tgw - 1 + gmin_w)]
      dn_g = jax.lax.conv_dimension_numbers(
          z.shape, wg.shape, ("NHWC", "HWIO", "NHWC")
      )
      out = _s1_conv(z, wg, pad, dn_g, precision)
      if bias is not None:
        out = out + jnp.tile(bias, len(ph) * len(pw)).astype(out.dtype)
      pieces.append(out)
      phase_lists.append(tuple(rh * s + rw for rh in ph for rw in pw))
  return pieces, phase_lists


def canonicalize_pieces(pieces, phase_lists, c_out: int) -> jax.Array:
  """Reassemble grouped_phase_pieces output into phase_conv's canonical
  [B, h, w, s*s*C_out] layout using contiguous channel slices only.

  Canonical phases that sit consecutively inside one piece are merged into a
  single slice, so the 2x2 grouping of k13s8 needs 16 slices (one per
  (r_h, width-group) run) -- XLA fuses the concat into one copy pass, unlike
  the gather a flat index permutation lowers to (measured slower than the
  grouped convs' own savings; PERF_NOTES round 1).
  """
  where = {}
  for i, phases in enumerate(phase_lists):
    for pos, p in enumerate(phases):
      where[p] = (i, pos)
  runs = []  # (piece_idx, start_pos, length) in canonical phase order
  for p in sorted(where):
    i, pos = where[p]
    if runs and runs[-1][0] == i and runs[-1][1] + runs[-1][2] == pos:
      runs[-1] = (i, runs[-1][1], runs[-1][2] + 1)
    else:
      runs.append((i, pos, 1))
  slices = [
      pieces[i][..., pos * c_out : (pos + ln) * c_out] for i, pos, ln in runs
  ]
  return slices[0] if len(slices) == 1 else jnp.concatenate(slices, axis=-1)


def grouped_phase_conv(
    z: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    stride: int,
    precision=None,
) -> jax.Array:
  """phase_conv via tap-window grouping; canonical [B, h, w, s*s*C_out]."""
  if len(_phase_groups(kernel.shape[0], stride)) <= 1:
    return phase_conv(z, kernel, bias, stride, precision=precision)
  pieces, phase_lists = grouped_phase_pieces(
      z, kernel, bias, stride, precision=precision
  )
  return canonicalize_pieces(pieces, phase_lists, kernel.shape[3])


def phase_kernel(kernel: jax.Array, stride: int) -> Tuple[jax.Array, int, int]:
  """[k, k, C_in, C_out] -> ([T, T, C_in, s*s*C_out], dmin, T).

  Implemented with pad + slice + reshape + flip only (no gathers): the map
  (r, j) -> t = P - r + s*(dmin + j) is, in terms of r' = s-1-r, a contiguous
  re-chunking of the zero-padded kernel starting at A - s + 1 with
  A = P + s*dmin. Gather-free matters: the kernel is a runtime parameter, so
  this transform executes per call (and per loop iteration when the decode
  sits inside lax.scan/fori_loop) -- as reshapes it is effectively free,
  whereas the gather formulation dominated the decode time.
  """
  k = kernel.shape[0]
  s = stride
  dmin, T, _, _ = _phase_geometry(k, s)
  p = k - 1 - max(k - s, 0) // 2
  start = p + s * dmin - s + 1
  total = T * s
  pad_front = max(0, -start)
  pad_back = max(0, start + total - k)
  kp = jnp.pad(kernel, ((pad_front, pad_back), (pad_front, pad_back), (0, 0), (0, 0)))
  off = start + pad_front
  kp = kp[off : off + total, off : off + total]
  c_in, c_out = kernel.shape[2], kernel.shape[3]
  w = kp.reshape(T, s, T, s, c_in, c_out)
  w = w[:, ::-1, :, ::-1]  # r' = s-1-r  ->  phase order r
  w = jnp.transpose(w, (0, 2, 4, 1, 3, 5))  # [T, T, C_in, s, s, C_out]
  return w.reshape(T, T, c_in, s * s * c_out), dmin, T


def depth_to_space(x: jax.Array, block: int) -> jax.Array:
  b, h, w, c = x.shape
  x = x.reshape(b, h, w, block, block, c // (block * block))
  x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
  return x.reshape(b, h * block, w * block, c // (block * block))


def phase_conv(
    z: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    stride: int,
    precision=None,
) -> jax.Array:
  """Conv-transpose output in PHASE SPACE: [B, h, w, s*s*C_out].

  depth_to_space(phase_conv(...), s) == fast_conv_transpose(...). Keeping
  activations in phase space keeps the channel (lane) dimension wide --
  elementwise work on a [.., 12]-channel upsampled tensor wastes 90% of the
  VPU lanes, while the equivalent [.., 768] phase tensor is fully packed.
  """
  s = stride
  w_phase, dmin, T = phase_kernel(kernel, s)
  pad = [(-dmin, T - 1 + dmin), (-dmin, T - 1 + dmin)]
  dn = jax.lax.conv_dimension_numbers(
      z.shape, w_phase.shape, ("NHWC", "HWIO", "NHWC")
  )
  out = _s1_conv(z, w_phase, pad, dn, precision)
  if bias is not None:
    out = out + jnp.tile(bias, s * s).astype(out.dtype)
  return out


@functools.lru_cache(maxsize=None)
def _s2d_conv_geometry(k: int, s: int):
  """Tap geometry for a SAME stride-s conv consumed in s2d-packed form.

  SAME forward conv: out[o] = sum_t x[s*o + t - P] K[t] with
  P = (k - s) // 2 for k >= s (lax low padding). Packing x[s*u + a] gives
  per-(a, t) contributions at packed tap d = (t - P - a) / s when integral.
  Returns (dmin, Td, entries=((d, a, t), ...)).
  """
  p = max(k - s, 0) // 2
  entries = []
  dmin = dmax = None
  for t in range(k):
    for a in range(s):
      num = t - p - a
      if num % s:
        continue
      d = num // s
      entries.append((d, a, t))
      dmin = d if dmin is None else min(dmin, d)
      dmax = d if dmax is None else max(dmax, d)
  return dmin, dmax - dmin + 1, tuple(entries)


def strided_conv_s2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    stride: int,
    precision=None,
) -> jax.Array:
  """SAME stride-s conv as a dense stride-1 conv over the s2d-packed input.

  Numerically equivalent to lax.conv SAME (NHWC/HWIO). The win is for tiny
  input channel counts: an image-space k5s2 conv on 3 channels contracts
  K = 75 (<10% MXU utilization measured); packed it contracts K = 108 on a
  4x smaller spatial grid (~6x faster for ELIC's first conv). Requires H, W
  divisible by s (callers pad images to the downsample factor already).
  """
  s = stride
  k = kernel.shape[0]
  c_in, c_out = kernel.shape[2], kernel.shape[3]
  dmin, td, entries = _s2d_conv_geometry(k, s)
  # Packed kernel [td, td, s*s*c_in, c_out]: axis layout (d, a) per axis.
  kh = np.zeros((td, s, k), np.float32)
  for d, a, t in entries:
    kh[d - dmin, a, t] = 1.0
  khj = jnp.asarray(kh, kernel.dtype)
  w = jnp.einsum(
      "dat,ebu,tuio->deabio", khj, khj, kernel.astype(jnp.float32),
      precision=jax.lax.Precision.HIGHEST,
  ).reshape(td, td, s * s * c_in, c_out).astype(x.dtype)

  xp = space_to_depth(x, s)
  pad = [(-dmin, td - 1 + dmin), (-dmin, td - 1 + dmin)]
  dn = jax.lax.conv_dimension_numbers(
      xp.shape, w.shape, ("NHWC", "HWIO", "NHWC")
  )
  out = jax.lax.conv_general_dilated(
      xp, w, (1, 1), pad, dimension_numbers=dn, precision=precision
  )
  return out if bias is None else out + bias.astype(out.dtype)


def space_to_depth(x: jax.Array, block: int) -> jax.Array:
  b, h, w, c = x.shape
  x = x.reshape(b, h // block, block, w // block, block, c)
  x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
  return x.reshape(b, h // block, w // block, block * block * c)


def gdn_phase(
    x_p: jax.Array,
    beta: jax.Array,
    gamma: jax.Array,
    num_phases: int,
    inverse: bool,
    alpha: float = 1.0,
    epsilon: float = 1.0,
) -> jax.Array:
  """GDN applied to a phase-space tensor [.., num_phases*C].

  The per-true-channel (C, C) mixing becomes a block-diagonal
  (num_phases*C, num_phases*C) matmul via kron(I, gamma): redundant FLOPs
  (64x for the full (12, 12) flagship phase tensor) but fully MXU/lane-packed
  -- an order of magnitude faster than the same op on the depth-to-spaced
  tensor. Valid for any phase ordering and for per-group phase subsets
  (grouped_phase_pieces): GDN mixes only within a true channel's block.
  """
  s2 = num_phases
  c = gamma.shape[0]
  big_gamma = jnp.kron(jnp.eye(s2, dtype=gamma.dtype), gamma)
  big_beta = jnp.tile(beta, s2)
  if alpha == 1.0:
    pool = jnp.abs(x_p)
  elif alpha == 2.0:
    pool = jnp.square(x_p)
  else:
    pool = jnp.abs(x_p) ** alpha
  norm = pool @ big_gamma + big_beta
  if epsilon == 0.5:
    norm = jnp.sqrt(norm)
  elif epsilon != 1.0:
    norm = norm**epsilon
  return x_p * norm if inverse else x_p / norm


def partial_depth_to_space(x_p: jax.Array, s: int, keep: int) -> jax.Array:
  """Phase-space [B, h, w, s*s*C] -> space-packed [B, h*s/keep, w*s/keep,
  keep*keep*C]: expand phases to pixels except a keep x keep block that stays
  in channels (s2d(d2s(x, s), keep) in one rearrangement)."""
  assert s % keep == 0
  e = s // keep  # expansion factor
  b, h, w, c_p = x_p.shape
  c = c_p // (s * s)
  x = x_p.reshape(b, h, w, e, keep, e, keep, c)
  x = jnp.transpose(x, (0, 1, 3, 2, 5, 4, 6, 7))  # [b, h, e, w, e, keep, keep, c]
  return x.reshape(b, h * e, w * e, keep * keep * c)


@functools.lru_cache(maxsize=None)
def _packed_geometry(k: int, s: int, p: int):
  """Tap geometry for a stride-s SAME deconv consuming a p-packed input.

  Returns (delta_min, Tp, entries) with entries a tuple of
  (delta_idx, a_in, t, phase_out) per-axis assignments:
  out phase P = s*a_in' ... specifically out[(s*p)*u + P] picks input packed
  channel a at cell u+delta with original kernel tap t.
  """
  pad_fwd_lo = max(k - s, 0) // 2
  p0 = k - 1 - pad_fwd_lo
  entries = []
  dmin_o, dmax_o = None, None
  # P = s*a + r, input packed slot a_src at cell offset delta: d = p*delta + a_src - a
  for a in range(p):
    for r in range(s):
      P = s * a + r
      for a_src in range(p):
        for delta in range(-(k // (s * p)) - 2, k // (s * p) + 3):
          d = p * delta + a_src - a
          t = p0 - r + s * d
          if 0 <= t < k:
            entries.append((delta, a_src, t, P))
            dmin_o = delta if dmin_o is None else min(dmin_o, delta)
            dmax_o = delta if dmax_o is None else max(dmax_o, delta)
  Tp = dmax_o - dmin_o + 1
  return dmin_o, Tp, tuple(entries)


def packed_conv_transpose(
    x_packed: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    stride: int,
    pack: int,
    precision=None,
) -> jax.Array:
  """SAME conv-transpose of a p-packed input (channels [p*p*C_in]) producing
  the full-resolution output via one dense conv + depth_to_space(s*p).

  Equivalent to fast_conv_transpose(d2s-unpacked input, ...). Packing widens
  both the contraction and the output channel dims (p*p*C_in and
  (s*p)^2*C_out), curing the lane waste of small-channel decoders.
  """
  s, p = stride, pack
  k = kernel.shape[0]
  c_in, c_out = kernel.shape[2], kernel.shape[3]
  dmin, Tp, entries = _packed_geometry(k, s, p)
  # Per-axis selection tensor mapping original kernel taps into the packed
  # kernel: kh[delta, a_src, P, t] = 1 where that tap applies.
  kh = np.zeros((Tp, p, s * p, k), np.float32)
  for d, a, t, P in entries:
    kh[d - dmin, a, P, t] = 1.0
  khj = jnp.asarray(kh, kernel.dtype)
  # W[dh, dw, ah, aw, ci, Ph, Pw, co] =
  #   sum_{th, tw} kh[dh, ah, Ph, th] * kh[dw, aw, Pw, tw] * K[th, tw, ci, co]
  w_full = jnp.einsum(
      "dapt,ebqu,tuio->deabipqo", khj, khj, kernel.astype(jnp.float32),
      precision=jax.lax.Precision.HIGHEST,
  )
  w_full = w_full.reshape(Tp, Tp, p * p * c_in, (s * p) * (s * p) * c_out)
  w_full = w_full.astype(x_packed.dtype)

  pad = [(-dmin, Tp - 1 + dmin), (-dmin, Tp - 1 + dmin)]
  dn = jax.lax.conv_dimension_numbers(
      x_packed.shape, w_full.shape, ("NHWC", "HWIO", "NHWC")
  )
  out_small = jax.lax.conv_general_dilated(
      x_packed, w_full, (1, 1), pad, dimension_numbers=dn, precision=precision
  )
  out = depth_to_space(out_small, s * p)
  if bias is not None:
    out = out + bias.astype(out.dtype)
  return out


@functools.lru_cache(maxsize=None)
def _exact_tap_ratio(k: int, s: int) -> float:
  """Per-axis (tap, phase) entries of exact grouping vs the dense T*s."""
  _, T, _, _ = _phase_geometry(k, s)
  entries = sum(
      tg * len(ph) for _, tg, ph in _phase_groups(k, s, exact=True)
  )
  return entries / (T * s)


def fast_conv_transpose(
    z: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    stride: int,
    precision=None,
) -> jax.Array:
  """SAME conv-transpose via phase conv + depth_to_space.

  Numerically equivalent to
  lax.conv_transpose(z, kernel, (stride, stride), 'SAME', NHWC/HWIO) [+ bias].
  When the phase tap windows leave enough structural zeros in the dense
  phase kernel (e.g. k5s2 pads 5 taps/axis to 6), the conv runs as exact
  per-window group convs instead; the canonical reorder is contiguous
  slices that fuse into the depth_to_space copy.
  """
  s = stride
  if s > 1 and _exact_tap_ratio(kernel.shape[0], s) <= 0.9:
    pieces, plists = grouped_phase_pieces(
        z, kernel, bias, s, precision=precision, group_width=True, exact=True
    )
    out_small = canonicalize_pieces(pieces, plists, kernel.shape[3])
    return depth_to_space(out_small, s)
  w_phase, dmin, T = phase_kernel(kernel, s)
  pad_lo = -dmin
  pad_hi = T - 1 + dmin
  dn = jax.lax.conv_dimension_numbers(
      z.shape, w_phase.shape, ("NHWC", "HWIO", "NHWC")
  )
  out_small = _s1_conv(
      z, w_phase, [(pad_lo, pad_hi), (pad_lo, pad_hi)], dn, precision
  )
  out = depth_to_space(out_small, s)
  return out if bias is None else out + bias.astype(out.dtype)
