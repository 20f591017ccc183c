"""Native C++ data loader tests (decode parity vs PIL, batch crops, pipeline)."""

import os

import numpy as np
import pytest

from shallow_ntc_tpu import data as data_lib
from shallow_ntc_tpu import dataio


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
  from PIL import Image

  d = tmp_path_factory.mktemp("imgs")
  rng = np.random.default_rng(0)
  for i in range(6):
    arr = rng.integers(0, 256, (80 + i, 100, 3)).astype(np.uint8)
    Image.fromarray(arr).save(d / f"img{i}.png")
    Image.fromarray(arr).save(d / f"img{i}.jpg", quality=95)
  # grayscale + palette PNGs exercise the normalization paths
  Image.fromarray(rng.integers(0, 256, (64, 64)).astype(np.uint8), "L").save(
      d / "gray.png"
  )
  return str(d)


@pytest.mark.skipif(not dataio.available(), reason="native loader unavailable")
class TestNativeLoader:
  def test_png_decode_matches_pil(self, image_dir):
    from PIL import Image

    path = os.path.join(image_dir, "img0.png")
    ours = dataio.decode_image(path)
    ref = np.asarray(Image.open(path).convert("RGB"))
    np.testing.assert_array_equal(ours, ref)

  def test_jpeg_decode_close_to_pil(self, image_dir):
    from PIL import Image

    path = os.path.join(image_dir, "img0.jpg")
    ours = dataio.decode_image(path)
    ref = np.asarray(Image.open(path).convert("RGB"))
    assert ours.shape == ref.shape
    # IDCT implementations may differ by a couple of levels
    assert float(np.mean(np.abs(ours.astype(int) - ref.astype(int)))) < 2.0

  def test_gray_png_promoted_to_rgb(self, image_dir):
    ours = dataio.decode_image(os.path.join(image_dir, "gray.png"))
    assert ours.shape[-1] == 3
    np.testing.assert_array_equal(ours[..., 0], ours[..., 1])

  def test_batch_crops(self, image_dir):
    paths = [os.path.join(image_dir, f"img{i}.png") for i in range(4)]
    batch = dataio.decode_crop_batch(paths, 64, seeds=[1, 2, 3, -1], threads=4)
    assert batch.shape == (4, 64, 64, 3)
    # deterministic given the same seed
    again = dataio.decode_crop_batch(paths, 64, seeds=[1, 2, 3, -1], threads=2)
    np.testing.assert_array_equal(batch, again)
    # center crop (seed -1) matches numpy center crop of the PIL decode
    from PIL import Image

    ref = np.asarray(Image.open(paths[3]).convert("RGB"))
    h, w = ref.shape[:2]
    y0, x0 = (h - 64) // 2, (w - 64) // 2
    np.testing.assert_array_equal(batch[3], ref[y0 : y0 + 64, x0 : x0 + 64])

  def test_failure_raises(self, image_dir):
    with pytest.raises(RuntimeError):
      dataio.decode_crop_batch([os.path.join(image_dir, "missing.png")], 32, [-1])

  def test_pipeline_uses_native(self, image_dir):
    ds = data_lib.get_dataset(
        os.path.join(image_dir, "*.png"), "train", batchsize=2, patchsize=48,
    )
    batch = next(iter(ds))
    assert batch.shape == (2, 48, 48, 3)
    assert batch.min() >= -0.5 and batch.max() <= 0.5


def test_pipeline_pil_fallback(image_dir, monkeypatch):
  monkeypatch.setattr(dataio, "_lib", None)
  monkeypatch.setattr(dataio, "_lib_failed", True)
  ds = data_lib.get_dataset(
      os.path.join(image_dir, "*.png"), "train", batchsize=2, patchsize=48,
  )
  batch = next(iter(ds))
  assert batch.shape == (2, 48, 48, 3)
