"""SGA iterative-inference encoding for the mean-scale hyperprior family.

Example:
  python -m shallow_ntc_tpu.mshyper.itinf \
      --config shallow_ntc_tpu/mshyper/configs/itinf.py --hid 0
"""

from shallow_ntc_tpu.utils import cli

if __name__ == "__main__":
  cli.define_common_flags(default_experiments_dir="./itinf_xms")
  cli.run_itinf_main("mshyper")
