#!/usr/bin/env python
"""Convert a reference (TF) shallow-ntc checkpoint to a shallow_ntc_tpu one.

Targets the released checkpoints (HF yiboyang/shallow-ntc-checkpoints,
reference README.md:21) for golden R-D parity testing.

The mapping is *structural*, not heuristic: from the workdir's config.json we
enumerate the exact tf.train.Checkpoint object paths the reference's
keras-2.10 model produces (Sequential children as `layer_with_weights-N`,
tfc.GDN under `<conv>/activation/<beta|gamma>_parameter/variable`,
tfc.DeepFactorized under `_prior/_matrices/N`, ...) paired with our flax
param paths and the deconv kernel conversion flag -- see
shallow_ntc_tpu/utils/tf_convert.enumerate_transform_paths. Every variable is
shape-checked and any unmatched variable (either side) is a hard error, so a
layout drift can never silently produce a wrong checkpoint. Exercised end to
end on a real on-disk TF checkpoint in tests/test_tf_parity.py.

Run with --dump to list a checkpoint's variables (to extend the layout rules
for checkpoint formats not yet seen).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"


def read_tf_variables(ckpt_path):
  """All model variables in the checkpoint: relative object path -> ndarray."""
  import tensorflow as tf  # noqa: delayed heavy import

  reader = tf.train.load_checkpoint(ckpt_path)
  out = {}
  for name in reader.get_variable_to_shape_map():
    if ".OPTIMIZER_SLOT" in name or not name.endswith(_SUFFIX):
      continue
    rel = name[: -len(_SUFFIX)]
    if not rel.startswith("model/"):
      continue  # save_counter etc.
    rel = rel[len("model/"):]
    if rel.startswith("optimizer/"):
      continue  # reference keeps Adam as a model attribute (models.py:85)
    out[rel] = reader.get_tensor(name)
  return out


def build_translation(config: dict, model_family: str):
  """config.json -> {tf_relative_path: (our_param_path, needs_deconv_conv)}."""
  from shallow_ntc_tpu.utils import tf_convert

  tc = dict(config["model_config"]["transform_config"])
  entries = []
  entries += tf_convert.enumerate_transform_paths(
      dict(tc["analysis"]), "_analysis", "_analysis")
  entries += tf_convert.enumerate_transform_paths(
      dict(tc["synthesis"]), "_synthesis", "_synthesis")
  if model_family == "mshyper":
    ha = dict(tc.get("hyper_analysis", dict(cls="HyperAnalysis")))
    hs = dict(tc.get("hyper_synthesis", dict(cls="HyperSynthesis")))
    entries += tf_convert.enumerate_transform_paths(
        ha, "_hyper_analysis", "_hyper_analysis")
    entries += tf_convert.enumerate_transform_paths(
        hs, "_hyper_synthesis", "_hyper_synthesis")
  entries += tf_convert.enumerate_prior_paths()
  return {tf_path: (our_path, deconv) for tf_path, our_path, deconv in entries}


def flatten_params(tree, prefix=()):
  out = {}
  for k, v in tree.items():
    if isinstance(v, dict):
      out.update(flatten_params(v, prefix + (k,)))
    else:
      out[prefix + (k,)] = v
  return out


def convert(workdir_tf: str, out_workdir: str, model_family: str):
  import jax

  from shallow_ntc_tpu import train_lib
  from shallow_ntc_tpu.utils import runname as runname_utils
  from shallow_ntc_tpu.utils import tf_convert

  config = runname_utils.load_json(os.path.join(workdir_tf, "config.json"))
  model, optimizer_config = train_lib.build_model_from_config(
      config["model_config"], model_family
  )
  state, tx, _ = train_lib.create_train_state(
      model, optimizer_config, jax.random.PRNGKey(0), (64, 64, 3)
  )
  flat = flatten_params(jax.device_get(state.params))
  table = build_translation(config, model_family)

  import tensorflow as tf

  ckpt_dir = os.path.join(workdir_tf, "train", "checkpoints")
  latest = tf.train.latest_checkpoint(ckpt_dir) or tf.train.latest_checkpoint(workdir_tf)
  if latest is None:
    raise SystemExit(f"No TF checkpoint under {ckpt_dir}")
  tf_vars = read_tf_variables(latest)

  new_flat = dict(flat)
  assigned = set()
  unmatched, errors = [], []
  for rel, arr in sorted(tf_vars.items()):
    if rel not in table:
      unmatched.append(rel)
      continue
    our_path, deconv = table[rel]
    arr = np.asarray(arr)
    if deconv:
      arr = tf_convert.conv_transpose_kernel_tf_to_flax(arr)
    if our_path not in flat:
      errors.append(f"{rel} -> {'/'.join(our_path)}: no such flax param")
      continue
    if arr.shape != flat[our_path].shape:
      errors.append(
          f"{rel} -> {'/'.join(our_path)}: shape {arr.shape} vs "
          f"{flat[our_path].shape}"
      )
      continue
    new_flat[our_path] = arr.astype(flat[our_path].dtype)
    assigned.add(our_path)

  missing = sorted("/".join(p) for p in set(flat) - assigned)
  problems = []
  if unmatched:
    problems.append(
        "TF variables with no layout rule (extend "
        "tf_convert.enumerate_transform_paths):\n  " + "\n  ".join(unmatched)
    )
  if errors:
    problems.append("mapping errors:\n  " + "\n  ".join(errors))
  if missing:
    problems.append(
        "flax params not covered by the checkpoint:\n  " + "\n  ".join(missing)
    )
  if problems:
    raise RuntimeError("checkpoint conversion failed:\n" + "\n".join(problems))

  # Rebuild the nested tree and save via the normal checkpoint machinery.
  params = {}
  for path, arr in new_flat.items():
    node = params
    for k in path[:-1]:
      node = node.setdefault(k, {})
    node[path[-1]] = arr
  state = state.replace(params=params)

  os.makedirs(out_workdir, exist_ok=True)
  runname_utils.dump_json(config, os.path.join(out_workdir, "config.json"))
  manager = train_lib.make_checkpoint_manager(out_workdir)
  train_lib.save_checkpoint(manager, state)
  manager.wait_until_finished()
  print(f"Wrote converted checkpoint ({len(assigned)} params) to {out_workdir}")


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--workdir_tf", required=True,
                      help="Reference workdir (config.json + TF checkpoints)")
  parser.add_argument("--out", required=True, help="Output workdir")
  parser.add_argument("--model_family", default="mshyper")
  parser.add_argument("--dump", action="store_true",
                      help="Only list the TF checkpoint variables")
  args = parser.parse_args()

  if args.dump:
    import tensorflow as tf

    ckpt_dir = os.path.join(args.workdir_tf, "train", "checkpoints")
    latest = tf.train.latest_checkpoint(ckpt_dir) or tf.train.latest_checkpoint(
        args.workdir_tf
    )
    reader = tf.train.load_checkpoint(latest)
    for name, shape in sorted(reader.get_variable_to_shape_map().items()):
      print(name, shape)
    return
  convert(args.workdir_tf, args.out, args.model_family)


if __name__ == "__main__":
  main()
