#!/usr/bin/env python
"""Convert a reference (TF) shallow-ntc checkpoint to a shallow_ntc_tpu one.

Targets the released checkpoints (HF yiboyang/shallow-ntc-checkpoints) for
golden R-D parity testing. The layout math (conv/deconv kernel layout + SAME
geometry, GDN reparameterization, DeepFactorized parameter shapes) is
validated in tests/test_tf_conversion.py; this script does the bookkeeping:

  1. reads every variable in the TF checkpoint (tf.train.load_checkpoint),
  2. builds the matching shallow_ntc_tpu model from the workdir's config.json,
  3. pairs TF variables to flax params structurally -- grouped by object path
     prefix, matched by (converted) shape within each transform, in layer
     order -- applying the deconv transpose/flip where needed,
  4. writes an orbax checkpoint usable by eval.py / compress.py.

Run with --dump to list the checkpoint's variables (useful to extend the
path-classification rules below for checkpoint layouts not yet seen).
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# Object-path fragments -> our module names.
TRANSFORM_PREFIXES = {
    "_analysis": "_analysis",
    "_synthesis": "_synthesis",
    "_hyper_analysis": "_hyper_analysis",
    "_hyper_synthesis": "_hyper_synthesis",
    "_prior": "_prior",
    "prior": "_prior",
}
_DECONV_HINTS = ("_synthesis", "transpose")


def read_tf_variables(ckpt_path):
  import tensorflow as tf  # noqa: delayed heavy import

  reader = tf.train.load_checkpoint(ckpt_path)
  shape_map = reader.get_variable_to_shape_map()
  out = {}
  for name in shape_map:
    if "optimizer" in name or ".OPTIMIZER" in name or "save_counter" in name:
      continue
    if "VARIABLE_VALUE" not in name and not name.startswith("model"):
      continue
    out[name] = reader.get_tensor(name)
  return out


def classify(name: str):
  """Map a TF object path to (our transform name, sort key)."""
  for frag, ours in TRANSFORM_PREFIXES.items():
    if f"/{frag}/" in name or name.split("/")[1:2] == [frag]:
      # sort by the numeric indices in the path for stable layer order
      nums = tuple(int(x) for x in re.findall(r"\d+", name))
      return ours, (nums, name)
  return None, None


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

  import tensorflow as tf

  ckpt_dir = os.path.join(workdir_tf, "train", "checkpoints")
  latest = tf.train.latest_checkpoint(ckpt_dir) or tf.train.latest_checkpoint(workdir_tf)
  if latest is None:
    raise SystemExit(f"No TF checkpoint under {ckpt_dir}")
  tf_vars = read_tf_variables(latest)

  # Group both sides by transform, then greedily match by convertible shape.
  ours_by_transform = {}
  for path, arr in flat.items():
    ours_by_transform.setdefault(path[0], []).append((path, arr))
  tf_by_transform = {}
  for name, arr in tf_vars.items():
    t, key = classify(name)
    if t is not None:
      tf_by_transform.setdefault(t, []).append((key, name, arr))

  new_flat = dict(flat)
  unmatched = []
  for t, tf_list in tf_by_transform.items():
    tf_list.sort()
    ours = ours_by_transform.get(t, [])
    used = set()
    for _, name, arr in tf_list:
      arr = np.asarray(arr)
      hit = None
      for i, (path, target) in enumerate(ours):
        if i in used:
          continue
        if arr.shape == target.shape:
          hit = (i, arr)
          break
        if (
            arr.ndim == 4
            and tf_convert.conv_transpose_kernel_tf_to_flax(arr).shape
            == target.shape
            and any(h in name.lower() or h in t for h in _DECONV_HINTS)
        ):
          hit = (i, tf_convert.conv_transpose_kernel_tf_to_flax(arr))
          break
      if hit is None:
        unmatched.append(name)
      else:
        used.add(hit[0])
        path = ours[hit[0]][0]
        new_flat[path] = hit[1].astype(flat[path].dtype)

  if unmatched:
    print("WARNING: unmatched TF variables (extend classify()/hints):")
    for n in unmatched:
      print("  ", n)

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
  print(f"Wrote converted checkpoint to {out_workdir}")


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
