"""Utility-layer tests: runnames, writers, sweeps, registry (SURVEY section 2.7)."""

import json
import os

import numpy as np
import pytest

from shallow_ntc_tpu.utils import hyper, registry, runname, writers


class TestRunname:
  def test_roundtrip(self):
    cfg = {"rd_lambda": 0.0025, "bottleneck_size": 320, "act": "igdn"}
    s = runname.config_dict_to_str(cfg, args_abbr={})
    parsed = runname.parse_runname(s, parse_numbers=True)
    assert parsed["rd_lambda"] == 0.0025
    assert parsed["bottleneck_size"] == 320
    assert parsed["act"] == "igdn"

  def test_sequences_and_scientific(self):
    s = runname.config_dict_to_str({"arch": (2, 4, 8), "lr": 1e-6}, args_abbr={})
    parsed = runname.parse_runname(s, parse_numbers=True)
    assert parsed["arch"] == (2, 4, 8)
    assert parsed["lr"] == 1e-6

  def test_skip_falsy(self):
    s = runname.config_dict_to_str({"a": 0, "b": 1}, args_abbr={})
    assert "a=" not in s and "b=1" in s
    s2 = runname.config_dict_to_str({"a": 0}, skip_falsy=False, args_abbr={})
    assert "a=0" in s2

  def test_abbreviations(self):
    s = runname.config_dict_to_str(
        {"rd_lambda": 0.01}, args_abbr={"rd_lambda": "lmbda"}
    )
    assert s == "lmbda=0.01"

  def test_parse_example_from_reference_docstring(self):
    parsed = runname.parse_runname(
        "dir-lamb=2-arch=2_4_8/tau=1.0-step=0-kerasckpt"
    )
    assert list(parsed.items()) == [
        ("lamb", "2"), ("arch", "2_4_8"), ("tau", "1.0"), ("step", "0")
    ]

  def test_xid_wid_env(self, monkeypatch):
    monkeypatch.setenv("SLURM_ARRAY_JOB_ID", "123")
    monkeypatch.setenv("SLURM_ARRAY_TASK_ID", "4")
    assert runname.get_xid() == "123"
    assert runname.get_wid() == "4"
    monkeypatch.delenv("SLURM_ARRAY_JOB_ID")
    monkeypatch.delenv("SLURM_ARRAY_TASK_ID")
    assert runname.get_wid() is None
    assert len(runname.get_xid()) > 0  # timestamp fallback

  def test_json_numpy_safe(self, tmp_path):
    obj = {"a": np.float32(1.5), "b": np.asarray([1, 2]), "c": np.int64(3)}
    p = str(tmp_path / "x.json")
    runname.dump_json(obj, p)
    assert runname.load_json(p) == {"a": 1.5, "b": [1, 2], "c": 3}


class TestHyper:
  def test_sweep_izip_product(self):
    a = hyper.sweep("x", [1, 2])
    b = hyper.sweep("y", [3, 4])
    assert hyper.izip(a, b) == [{"x": 1, "y": 3}, {"x": 2, "y": 4}]
    assert len(hyper.product(a, b)) == 4
    with pytest.raises(AssertionError):
      hyper.izip(a, hyper.sweep("z", [1]))


class TestRegistry:
  def test_build_and_errors(self):
    class A:
      def __init__(self, v):
        self.v = v

    b = registry.ClassBuilder({"A": A})
    assert b.build("A", v=7).v == 7
    with pytest.raises(KeyError):
      b.build("B")

    @b.register
    class B:
      pass

    assert b.build("B") is not None


class TestWriters:
  def test_jsonl_writer(self, tmp_path):
    w = writers.JsonlWriter(str(tmp_path))
    w.write_scalars(3, {"loss": np.float32(1.25), "steps_per_sec": 10.0})
    w.write_scalars(4, {"steps_per_sec": 9.0})  # dropped (steps_per_sec only)
    w.flush()
    lines = [json.loads(l) for l in open(tmp_path / "record.jsonl")]
    assert lines == [{"step": 3, "loss": 1.25, "steps_per_sec": 10.0}]
    w.close()

  def test_default_writer_writes_jsonl(self, tmp_path):
    w = writers.create_default_writer(str(tmp_path), collection="train",
                                      asynchronous=False)
    w.write_scalars(1, {"bpp": 0.5})
    w.flush()
    rec = os.path.join(tmp_path, "train", "record.jsonl")
    assert os.path.exists(rec)
    assert json.loads(open(rec).readline())["bpp"] == 0.5


class TestAggregateResults:
  """scripts/aggregate_results.py: an e2e invocation over synthetic files."""

  def _write(self, path, runname_base, step, lam, bpp, psnr):
    recs = [{"rd_lambda": lam, "bpp": bpp, "psnr": psnr, "mse": 1.0,
             "msssim": 0.99, "rd_loss": bpp + lam * 1.0, "instance_id": i}
            for i in range(2)]
    fname = f"{runname_base}-step={step}-xid=t.json"
    with open(os.path.join(path, fname), "w") as f:
      json.dump(recs, f)

  def test_latest_step_wins_and_schema(self, tmp_path):
    import subprocess
    import sys as _sys

    d = tmp_path / "end_to_end"
    d.mkdir()
    # Two evals of the same run at different checkpoints: only step=200
    # may enter the aggregate (stale-step dedup), plus a second lambda.
    self._write(str(d), "fam-lmbda=0.01-num_steps=200", 100, 0.01, 9.9, 1.0)
    self._write(str(d), "fam-lmbda=0.01-num_steps=200", 200, 0.01, 0.5, 30.0)
    self._write(str(d), "fam-lmbda=0.02-num_steps=200", 200, 0.02, 0.8, 32.0)
    out = tmp_path / "agg"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "aggregate_results.py"),
         "--results_glob", str(d / "*.json"), "--out", str(out)],
        capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr
    assert "dropping stale-step eval" in r.stdout
    agg = json.load(open(out / "aggregate.json"))
    (method,) = agg.keys()
    assert agg[method]["rd_lambda"] == [0.01, 0.02]
    # step=100's bpp=9.9 must not contaminate the lambda=0.01 mean.
    assert agg[method]["bpp"] == [0.5, 0.8]
    assert agg[method]["num_images"] == [2, 2]
