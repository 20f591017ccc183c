"""Core numeric ops for TPU-native neural transform coding."""

from shallow_ntc_tpu.ops.math import lower_bound, upper_bound
from shallow_ntc_tpu.ops.rounding import (
    round_st,
    soft_round,
    sga_round,
    sample_unoise,
    quantize_eval,
)
