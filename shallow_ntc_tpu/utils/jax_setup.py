"""Process-level JAX configuration used by every entry point.

Two knobs matter for this framework:

  * matmul precision: training/eval default to 'highest' (full f32 passes on
    the MXU) for parity with the reference's f32 numerics; the decode
    benchmark path runs bf16 explicitly via model dtype.
  * persistent compilation cache: XLA-compile times dominate short jobs
    (especially over remote-TPU tunnels where a tiny model's first compile
    can take minutes); caching executables on disk makes every subsequent
    process start warm.
"""

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "SHALLOW_NTC_JAX_CACHE", os.path.expanduser("~/.cache/shallow_ntc_jax")
)


def setup_jax(matmul_precision: str = "highest", cache_dir: str = DEFAULT_CACHE_DIR):
  if matmul_precision:
    jax.config.update("jax_default_matmul_precision", matmul_precision)
  if cache_dir:
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
