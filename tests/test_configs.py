"""Smoke tests over the committed config-file surface.

The config schema (get_config / get_cfg_str / get_hyper, runnames parsed
back at eval time) is the de-facto public API (SURVEY.md section 5 "Config /
flag system"); every config script shipped under shallow_ntc_tpu/*/configs/
must load, accept its own sweep overrides, and produce a runname that
utils.runname.parse_runname can invert (eval_lib recovers hparams from it,
reference common/eval_lib.py:91-101).
"""

import glob
import os

import pytest

from shallow_ntc_tpu.utils import cli, runname

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_FILES = sorted(
    glob.glob(os.path.join(REPO, "shallow_ntc_tpu", "*", "configs", "*.py"))
)


def _family(path):
  # shallow_ntc_tpu/<family>/configs/<name>.py
  return os.path.basename(os.path.dirname(os.path.dirname(path)))


@pytest.mark.parametrize(
    "config_file", CONFIG_FILES, ids=[os.path.basename(f) for f in CONFIG_FILES]
)
def test_config_loads_and_roundtrips(config_file):
  mod = cli.load_config_module(config_file)
  cfg = mod.get_config()

  # Schema invariants shared by all experiment configs.
  assert "model_config" in cfg, config_file
  model_cfg = cfg["model_config"]
  assert "transform_config" in model_cfg or "warm_start_exp_dir" in str(cfg)

  # Every sweep entry must apply cleanly on top of the base config
  # (mirrors utils/cli.resolve_config; reference mshyper/train.py:46-51).
  if hasattr(mod, "get_hyper"):
    for hparams in mod.get_hyper():
      cfg_i = mod.get_config()
      cfg_i.update_from_flattened_dict(hparams)

      # The runname must be parseable back into hparams (str round-trip).
      if hasattr(mod, "get_cfg_str"):
        name = _family(config_file) + "-" + mod.get_cfg_str(cfg_i)
        parsed = runname.parse_runname(name)
        assert parsed, name


def test_all_families_covered():
  families = {_family(f) for f in CONFIG_FILES}
  assert {"mshyper", "factorized"} <= families
