"""shallow_ntc_tpu: a TPU-native (JAX/XLA/Pallas) neural image compression framework.

Re-implements the full capability surface of mandt-lab/shallow-ntc ("Computationally-
Efficient Neural Image Compression with Shallow Decoders", ICCV 2023) with a TPU-first
design:

  * pure-functional flax/optax models compiled with jax.jit (one XLA graph per step),
  * stateless entropy models (deep-factorized prior, mean-scale conditional Gaussian)
    with a device-side likelihood path and a host C++ rANS range coder for real
    bitstreams (a capability the reference never shipped: it always constructed its
    entropy models with compression=False),
  * SGA iterative inference (itinf) as a jitted lax.scan running entirely on device,
  * data-parallel training over a jax.sharding.Mesh,
  * fused Pallas decode kernels for the shallow synthesis transforms.

Layout (mirrors the reference's layer map, SURVEY.md section 1):
  ops/        core numerics: rounding/STE/SGA, entropy models, image math, Pallas kernels
  models/     NN transforms (transforms.py, elic.py) and the two model families
  latents.py  latent-variable abstraction (reference: common/latent_rvs_lib.py)
  schedule.py LR / lambda / tau schedules (reference: common/schedule.py)
  data.py     input pipeline (reference: common/data_lib.py), TF-free
  train_lib.py / eval_lib.py / itinf_lib.py   experiment orchestration
  parallel/   device mesh + sharding rules
  codec/      host rANS range coder (C++ w/ ctypes bindings) + CDF table extraction
  utils/      registry, runnames, writers, sweeps, json, profiling
"""

__version__ = "0.1.0"
