#!/usr/bin/env python
"""Repo-checkout shim for the export CLI (installed name: `sota-export`).

Usage:
  python scripts/export_model.py -c configs/r50_baseline.yaml \
      --ckpt logs/.../model_last.ckpt --out /tmp/r50_serve \
      [--ema] [--batch 8 | --batch poly] [--image-size 224] [--quantize int8]

The artifact is loadable WITHOUT this repo's model code:
  from sota_imagenet_tpu.utils.export import load_exported
  serve, meta = load_exported(out_dir); logits = serve(images_u8_nhwc)

Implementation: sota_imagenet_tpu/cli.py::export_main.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sota_imagenet_tpu.cli import export_main

if __name__ == "__main__":
    export_main()
