"""Balle-2017 factorized-prior model on dead leaves: budgeted R-D run.

Companion to mshyper/configs/two_layer_syn_rd.py for the factorized family
(reference factorized/configs/bls2017.py); 20k steps, the paper's seven
rate points (mshyper/configs/two_layer_syn.py:73).
"""

import ml_collections

RD_LAMBDAS = [0.00125, 0.0025, 0.005, 0.01, 0.02, 0.04, 0.08]


def get_config():
  config = ml_collections.ConfigDict()
  config.model_family = "factorized"

  config.train_data_config = dict(
      dataset="deadleaves_train", batchsize=8, patchsize=256)
  config.val_data_config = dict(
      dataset="deadleaves_valid", batchsize=1, patchsize=None)
  config.train_eval_config = dict(
      num_steps=20_000,
      log_metrics_every_steps=250,
      checkpoint_every_steps=5_000,
      eval_every_steps=5_000,
      max_validation_steps=4,
      steps_per_dispatch=25,
  )

  config.model_config = dict(
      scheduled_num_steps=config.train_eval_config["num_steps"],
      rd_lambda=0.02,
      optimizer_config=dict(
          learning_rate=1e-4, reduce_lr_after=0.8, reduce_lr_factor=0.1,
          global_clipnorm=1.0,
      ),
      transform_config=dict(
          analysis=dict(cls="BLS2017Analysis", num_filters=192),
          synthesis=dict(cls="BLS2017Synthesis", num_filters=192),
      ),
  )
  return config


def get_cfg_str(config):
  from collections import OrderedDict

  from shallow_ntc_tpu.utils import runname

  d = OrderedDict()
  d["rd_lambda"] = config.model_config["rd_lambda"]
  d["num_steps"] = config.train_eval_config["num_steps"]
  return runname.config_dict_to_str(d)


def get_hyper():
  from shallow_ntc_tpu.utils import hyper

  return hyper.sweep("model_config.rd_lambda", RD_LAMBDAS)
