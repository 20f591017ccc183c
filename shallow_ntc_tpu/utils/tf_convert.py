"""TF/Keras -> flax weight-layout conversion rules.

Needed to import the reference's released TF checkpoints
(HF yiboyang/shallow-ntc-checkpoints, reference README.md:21) for golden R-D
tests. The geometric facts (validated against tf.keras in
tests/test_tf_conversion.py):

  * Conv2D:          TF kernel [kh, kw, in, out] == flax nn.Conv kernel. SAME
                     padding geometry is identical for the odd kernels used.
  * Conv2DTranspose: TF stores [kh, kw, out, in] and computes the *gradient*
                     of a strided conv (flipped correlation); flax
                     ConvTranspose stores [kh, kw, in, out] and correlates the
                     unflipped kernel over the dilated input. Same SAME
                     geometry (verified for every (k, s) used); conversion is
                     transpose(0,1,3,2) + spatial flip.
  * GDN:             tfc stores sqrt-reparameterized beta/gamma with pedestal
                     2^-18 -- identical to our storage; copy directly.
  * DeepFactorized:  matrices/biases/factors stored raw with shapes
                     (channels, f_out, f_in) / (channels, f_out, 1) --
                     identical; copy directly.
"""

import numpy as np


def conv_kernel_tf_to_flax(tf_kernel: np.ndarray) -> np.ndarray:
  """tf.keras Conv2D kernel [kh, kw, in, out] -> flax nn.Conv kernel."""
  return np.asarray(tf_kernel)


def conv_transpose_kernel_tf_to_flax(tf_kernel: np.ndarray) -> np.ndarray:
  """tf.keras Conv2DTranspose kernel [kh, kw, out, in] -> flax ConvTranspose
  kernel [kh, kw, in, out] computing the same function."""
  k = np.transpose(np.asarray(tf_kernel), (0, 1, 3, 2))
  return k[::-1, ::-1]


def conv_transpose_kernel_flax_to_tf(flax_kernel: np.ndarray) -> np.ndarray:
  """Inverse of conv_transpose_kernel_tf_to_flax."""
  k = np.asarray(flax_kernel)[::-1, ::-1]
  return np.transpose(k, (0, 1, 3, 2))
