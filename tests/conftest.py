"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip TPU hardware is not available in CI; following SURVEY.md section 4,
all sharding/parallelism tests run against XLA's host-platform device
simulation so collective layouts are validated without real chips.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# TF (used as the parity oracle in test_tf_parity.py) must not route convs
# through oneDNN custom ops: they fail outright on some deconv geometries
# ("could not create a primitive descriptor", mkl_conv_grad_input_ops.cc).
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
# Parity-sensitive numerics: run matmuls/convs in full f32 under test
# (JAX's DEFAULT matmul precision uses reduced-precision passes).
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
  os.environ["XLA_FLAGS"] = (
      xla_flags + " --xla_force_host_platform_device_count=8"
  ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (after env setup)

jax.config.update("jax_default_matmul_precision", "highest")
# This image pre-sets jax_platforms to "axon,cpu" (TPU plugin first), which
# silently overrides the JAX_PLATFORMS env var -- force CPU for tests.
jax.config.update("jax_platforms", "cpu")
