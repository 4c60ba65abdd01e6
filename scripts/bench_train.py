#!/usr/bin/env python
"""Training throughput at the reference defaults (batch 16, patch 96, x2,
16-RRDB) through the real train CLI, on whatever device JAX picks.

Builds a synthetic photo-sized dataset, runs a few epochs of the pixel
phase (and optionally the GAN phase), and reports the steady-state
patches/s that the CLI itself logs. Results recorded in PERF.md.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--n_images", type=int, default=256)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--family", type=str, default="sr",
                        choices=["sr", "fast"],
                        help="generator family for both phases: the "
                             "reference topology (16-RRDB) or the TPU-first "
                             "flagship (models/fast.py) at its shipped "
                             "preset — measures the training-side win of "
                             "the MXU-aligned trunk")
    parser.add_argument("--scale", type=int, default=2)
    parser.add_argument("--gan", action="store_true", help="also run the SRGAN phase")
    parser.add_argument("--backend", type=str, default="auto",
                        choices=["auto", "native", "python"])
    opt = parser.parse_args(argv)

    from PIL import Image

    from image_super_resolution_tpu.cli.create_json import main as cj
    from image_super_resolution_tpu.cli.train import main as tr

    ws = Path(tempfile.mkdtemp(prefix="bench_train_"))
    rng = np.random.default_rng(0)
    (ws / "train").mkdir()
    for i in range(opt.n_images):
        img = rng.integers(0, 256, (opt.size, opt.size, 3), dtype=np.uint8)
        Image.fromarray(img).save(ws / "train" / f"i{i}.jpg", quality=92)
    cj(["--train_dirs", str(ws / "train"), "--shape", "96", "--output", str(ws)])

    family = [] if opt.family == "sr" else ["--family", "fast"]
    common = [
        "--train_json", str(ws / "train_images.json"), "--work_dir", str(ws),
        "--scale", str(opt.scale), "--batch_size", "16", "--shape", "96",
        "--epochs", str(opt.epochs), "--no_tensorboard", "--ckpt_every", "100",
        "--loader_backend", opt.backend, "--worker", "4", *family,
    ]
    print("== pixel phase ==", flush=True)
    tr(["--resnet", *common])
    if opt.gan:
        print("== SRGAN phase ==", flush=True)
        tr(common)


if __name__ == "__main__":
    main()
