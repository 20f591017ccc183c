"""Train the mean-scale hyperprior family.

Example:
  python -m shallow_ntc_tpu.mshyper.train \
      --config shallow_ntc_tpu/mshyper/configs/two_layer_syn.py --hid 0
"""

from shallow_ntc_tpu.utils import cli

if __name__ == "__main__":
  cli.define_common_flags(default_experiments_dir="./train_xms")
  cli.run_train_main("mshyper")
