"""Factorized-prior family: model + train/itinf entry points."""

from shallow_ntc_tpu.models import factorized as models  # noqa: F401
