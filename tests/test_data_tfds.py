"""tfds dataset path: reference semantics via a fake tfds module.

tensorflow_datasets is not installed in this environment, so the pipeline is
exercised with a stub builder injected into sys.modules -- validating the
dispatcher's name/split resolution (reference data_lib.py:125-134), the
small-image filter, mnist special-casing, and batching, without the
dependency.
"""

import sys
import types

import numpy as np
import pytest

from shallow_ntc_tpu import data as data_lib


class _FakeTfds(types.ModuleType):
  """Minimal tfds: load() returns a list of {'image': ...} examples."""

  def __init__(self, examples_by_split):
    super().__init__("tensorflow_datasets")
    self._examples = examples_by_split
    self.load_calls = []

  def load(self, name, split, shuffle_files=False):
    self.load_calls.append((name, split, shuffle_files))
    return list(self._examples[split])

  @staticmethod
  def as_numpy(ds):
    return ds


@pytest.fixture
def fake_tfds(monkeypatch):
  rng = np.random.default_rng(0)

  def img(h, w, c=3):
    return {"image": rng.integers(0, 256, (h, w, c)).astype(np.uint8)}

  fake = _FakeTfds({
      "train": [img(64, 64), img(16, 16), img(80, 48)],  # middle one too small
      "validation": [img(70, 90), img(50, 60)],
      "test": [img(28, 28, 1), img(28, 28, 1), img(28, 28, 1)],
  })
  monkeypatch.setitem(sys.modules, "tensorflow_datasets", fake)
  return fake


def test_clic_eval_uses_validation_split(fake_tfds):
  ds = data_lib.get_dataset("clic", split="test", batchsize=1, patchsize=None)
  batches = list(ds)
  assert fake_tfds.load_calls == [("clic", "validation", False)]
  assert [b.shape for b in batches] == [(1, 70, 90, 3), (1, 50, 60, 3)]
  # normalized to [-0.5, 0.5)
  assert batches[0].min() >= -0.5 and batches[0].max() <= 0.5


def test_tfds_train_filters_small_images_and_repeats(fake_tfds):
  ds = data_lib.get_dataset("clic", split="train", batchsize=2, patchsize=32)
  it = iter(ds)
  b = next(it)
  assert b.shape == (2, 32, 32, 3)  # 2 eligible images per epoch
  b2 = next(it)  # repeat=True: a second epoch arrives
  assert b2.shape == (2, 32, 32, 3)
  assert fake_tfds.load_calls[0] == ("clic", "train", True)


def test_mnist_single_channel_and_split(fake_tfds):
  ds = data_lib.get_dataset("mnist", split="test", batchsize=3, patchsize=28)
  batches = list(ds)
  assert fake_tfds.load_calls == [("mnist", "test", False)]
  assert [b.shape for b in batches] == [(3, 28, 28, 1)]


def test_mnist_patchsize_bound():
  with pytest.raises(AssertionError):
    data_lib.TfdsDataset("mnist", "train", True, True, True, 2, patchsize=64)


def test_header_only_dimensions(tmp_path):
  from shallow_ntc_tpu.data import image_dimensions, write_png

  arr = np.zeros((12, 34, 3), np.uint8)
  path = tmp_path / "im.png"
  write_png(str(path), arr)
  assert image_dimensions(str(path)) == (12, 34)
