"""Train the factorized-prior family.

Example:
  python -m shallow_ntc_tpu.factorized.train \
      --config shallow_ntc_tpu/factorized/configs/bls2017.py --hid 0
"""

from shallow_ntc_tpu.utils import cli

if __name__ == "__main__":
  cli.define_common_flags(default_experiments_dir="./train_xms")
  cli.run_train_main("factorized")
