"""Host rANS range coder + CDF table extraction (the codec path).

The device (TPU) computes latents, quantization grids and CDF tables; this
package does the sequential entropy coding on the host via a small C++
library (rans.cc) bound with ctypes. See codec/api.py for the model-level
compress/decompress functions.
"""

from shallow_ntc_tpu.codec.bindings import rans_decode, rans_encode  # noqa: F401
