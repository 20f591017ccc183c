"""Mean-scale hyperprior family: model + train/itinf entry points."""

from shallow_ntc_tpu.models import mshyper as models  # noqa: F401
