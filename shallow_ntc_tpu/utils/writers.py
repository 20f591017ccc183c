"""Metric writers (reference: common/custom_writers.py).

Keeps the reference's observability surface: absl logging + TensorBoard +
line-buffered JSONL (`record.jsonl`, one {"step": ..., metric: ...} object per
line). Built on clu.metric_writers (the JAX-ecosystem equivalent of the
reference's CLU usage); TensorBoard output is gated on tensorboardX
availability so the core pipeline has no TF dependency.
"""

import json
import os
from typing import Any, Mapping, Optional

import numpy as np
from clu import metric_writers
from clu.metric_writers.interface import MetricWriter

from shallow_ntc_tpu.utils.runname import MyJSONEncoder


class JsonlWriter(MetricWriter):
  """CLU MetricWriter emitting JSON lines (custom_writers.py:29-84)."""

  def __init__(self, logdir: str, filename: str = "record.jsonl"):
    os.makedirs(logdir, exist_ok=True)
    self._file = open(os.path.join(logdir, filename), "a", buffering=1)

  def write_scalars(self, step: int, scalars: Mapping[str, Any]):
    # Drop CLU's steps_per_sec-only records (custom_writers.py:45-47).
    keys = set(scalars.keys())
    if keys == {"steps_per_sec"} or not keys:
      return
    record = {"step": int(step)}
    for k, v in scalars.items():
      record[k] = float(v) if np.ndim(v) == 0 else np.asarray(v).tolist()
    self._file.write(json.dumps(record, cls=MyJSONEncoder) + "\n")

  def write_images(self, step, images):
    pass  # images go to TensorBoard only

  def write_videos(self, step, videos):
    pass

  def write_audios(self, step, audios, *, sample_rate):
    pass

  def write_texts(self, step, texts):
    pass

  def write_histograms(self, step, arrays, num_buckets=None):
    pass

  def write_hparams(self, hparams):
    self._file.write(
        json.dumps({"hparams": hparams}, cls=MyJSONEncoder, default=str) + "\n"
    )

  def write_summaries(self, step, values, metadata=None):
    pass

  def flush(self):
    self._file.flush()

  def close(self):
    self._file.close()


class TensorboardXWriter(MetricWriter):
  """TensorBoard writer via tensorboardX (no TF dependency)."""

  def __init__(self, logdir: str):
    import tensorboardX

    self._tb = tensorboardX.SummaryWriter(logdir)

  def write_scalars(self, step, scalars):
    for k, v in scalars.items():
      self._tb.add_scalar(k, float(v), global_step=int(step))

  def write_images(self, step, images):
    for k, v in images.items():
      arr = np.asarray(v)
      if arr.ndim == 4:
        arr = arr[0]
      if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
      self._tb.add_image(k, arr, global_step=int(step), dataformats="HWC")

  def write_videos(self, step, videos):
    pass

  def write_audios(self, step, audios, *, sample_rate):
    pass

  def write_texts(self, step, texts):
    for k, v in texts.items():
      self._tb.add_text(k, v, global_step=int(step))

  def write_histograms(self, step, arrays, num_buckets=None):
    for k, v in arrays.items():
      self._tb.add_histogram(k, np.asarray(v), global_step=int(step))

  def write_hparams(self, hparams):
    pass

  def write_summaries(self, step, values, metadata=None):
    pass

  def flush(self):
    self._tb.flush()

  def close(self):
    self._tb.close()


def create_default_writer(
    logdir: Optional[str] = None,
    just_logging: bool = False,
    asynchronous: bool = True,
    collection: Optional[str] = None,
) -> MetricWriter:
  """LoggingWriter + TensorBoard + JSONL multi-writer (custom_writers.py:89-128)."""
  writers = [metric_writers.LoggingWriter(collection=collection)]
  if logdir is not None and not just_logging:
    if collection:
      logdir = os.path.join(logdir, collection)
    try:
      writers.append(TensorboardXWriter(logdir))
    except ImportError:
      pass
    writers.append(JsonlWriter(logdir))
  writer = metric_writers.MultiWriter(writers)
  if asynchronous:
    writer = metric_writers.AsyncWriter(writer)
  return writer
