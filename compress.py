"""Compress/decompress image files with a trained model (real bitstreams).

A capability the reference lacks (its entropy models never compress;
SURVEY.md section 2.9). Examples:

  python compress.py compress --workdir <wd> --input img.png --output img.sntc
  python compress.py decompress --workdir <wd> --input img.sntc --output out.png
  python compress.py roundtrip --workdir <wd> --input img.png
"""

import os
import sys

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("workdir", None, "Trained workdir (from train_lib).")
flags.DEFINE_string("input", None, "Input file (image or .sntc bitstream).")
flags.DEFINE_string("output", None, "Output file.")
flags.DEFINE_string("model_family", None, "mshyper|factorized (default: inferred).")
flags.DEFINE_enum(
    "decode_dtype", "float", ["float", "int8_syn"],
    "Synthesis precision for decompress (ops/int8ops.py). int8_syn keeps "
    "the entropy path float, so bitstreams stay interoperable with float "
    "encoders/decoders; only the reconstruction shifts by ~-0.08 dB.",
)
flags.DEFINE_integer(
    "spatial_devices", 1,
    "Shard the pixel-space transforms (analysis, synthesis) over N devices "
    "along image height for high-resolution images (XLA inserts the conv "
    "halo exchanges). Coding tables stay canonical single-device, so "
    "bitstreams interoperate across settings.",
)


def _load_codec():
  from shallow_ntc_tpu import eval_lib
  from shallow_ntc_tpu.codec import api as codec_api
  from shallow_ntc_tpu.utils.jax_setup import setup_jax

  setup_jax()
  if FLAGS.decode_dtype == "int8_syn":
    # 'syn' keeps mu/sigma (the coded distribution) float: the rANS decode
    # consumes identical CDFs, so int8_syn and float decoders accept each
    # other's bitstreams bit-for-bit.
    os.environ["SNTC_INT8_DECODE"] = "syn"
  model, params, _ = eval_lib.load_latest_ckpt(FLAGS.workdir, FLAGS.model_family)
  return codec_api.make_codec(
      model, params, spatial_devices=FLAGS.spatial_devices)


def main(argv):
  if len(argv) != 2 or argv[1] not in ("compress", "decompress", "roundtrip"):
    raise app.UsageError("Usage: compress.py {compress|decompress|roundtrip} ...")
  mode = argv[1]
  from shallow_ntc_tpu import data as data_lib
  from shallow_ntc_tpu.models.base import normalize_image
  from shallow_ntc_tpu.ops.metrics_ops import mse_psnr

  codec = _load_codec()

  if mode == "compress":
    img = normalize_image(data_lib.read_png(FLAGS.input).astype(np.float32))
    result = codec.compress(img)
    out = FLAGS.output or FLAGS.input + ".sntc"
    with open(out, "wb") as f:
      f.write(result.bitstring)
    logging.info("%s -> %s: %d bytes, %.4f bpp", FLAGS.input, out,
                 len(result.bitstring), result.bpp)
    print(f"bpp={result.bpp:.4f} bytes={len(result.bitstring)}")
  elif mode == "decompress":
    with open(FLAGS.input, "rb") as f:
      blob = f.read()
    rec = codec.decompress(blob)
    out = FLAGS.output or FLAGS.input + ".png"
    data_lib.write_png(out, rec)
    logging.info("%s -> %s (%dx%d)", FLAGS.input, out, rec.shape[0], rec.shape[1])
    print(f"wrote {out} {rec.shape}")
  else:  # roundtrip: compress + decompress + report bpp/PSNR
    raw = data_lib.read_png(FLAGS.input).astype(np.float32)
    result = codec.compress(normalize_image(raw))
    rec = codec.decompress(result.bitstring)
    assert np.array_equal(rec, result.reconstruction), "enc/dec mismatch!"
    _, psnr = mse_psnr(raw[None], rec[None].astype(np.float32))
    print(f"bpp={result.bpp:.4f} psnr={float(psnr[0]):.2f} "
          f"bytes={len(result.bitstring)} bit_exact=True")


if __name__ == "__main__":
  flags.mark_flags_as_required(["workdir", "input"])
  app.run(main)
