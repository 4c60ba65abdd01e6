#!/usr/bin/env python
"""Quantify the random-VGG GAN phase against pixel-only training.

The environment has no ImageNet VGG19 weights (no torchvision, zero egress),
so the SRGAN phase runs on RMS-calibrated random VGG features
(losses/perceptual.py feature_norm). This experiment measures what that
substitute actually does to output quality on the synthetic sharp-edge
benchmark, so the deviation from the reference's real-VGG GAN phase is a
number, not a hand-wave (VERDICT round-1 next #6). Results recorded in
PERF.md.

Protocol (all through the real CLIs):
  A. pixel pretrain E1 epochs                        -> eval
  B. A + GAN phase (random-VGG perceptual) E2 epochs -> eval
  C. A + pixel-only for E2 more epochs (control)     -> eval

Usage: python scripts/gan_vs_pixel_experiment.py [--workdir DIR] [--e1 N] [--e2 N]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_dataset(root: Path, n_train: int = 240, n_val: int = 8, size: int = 128):
    """Sharp-edge synthetic images: rectangles, lines, and gradients —
    content with actual high-frequency structure for x2 SR to recover."""
    from PIL import Image

    rng = np.random.default_rng(7)
    for split, n in (("train", n_train), ("val", n_val)):
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = np.full((size, size, 3), rng.integers(0, 255, 3), np.uint8)
            for _ in range(12):
                x0, y0 = rng.integers(0, size - 8, 2)
                w, h = rng.integers(4, size // 2, 2)
                img[y0 : y0 + h, x0 : x0 + w] = rng.integers(0, 255, 3)
            for _ in range(6):  # thin lines
                y = int(rng.integers(0, size))
                img[y : y + 2, :, :] = rng.integers(0, 255, 3)
            gx = np.linspace(0, rng.integers(30, 90), size, dtype=np.float32)
            img = np.clip(img.astype(np.float32) + gx[None, :, None], 0, 255)
            Image.fromarray(img.astype(np.uint8)).save(d / f"img_{i}.png")
    from image_super_resolution_tpu.cli.create_json import main as cj

    cj(["--train_dirs", str(root / "train"), "--val_dirs", str(root / "val"),
        "--shape", "48", "--output", str(root)])


def run(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=str, default="/tmp/gan_vs_pixel")
    parser.add_argument("--e1", type=int, default=80, help="pixel pretrain epochs")
    parser.add_argument("--e2", type=int, default=50, help="extra phase epochs")
    parser.add_argument("--depth", type=int, default=2)
    opt = parser.parse_args(argv)

    from image_super_resolution_tpu.cli.evaluate import main as ev
    from image_super_resolution_tpu.cli.export import main as ex
    from image_super_resolution_tpu.cli.train import main as tr

    ws = Path(opt.workdir)
    if ws.exists():
        shutil.rmtree(ws)
    ws.mkdir(parents=True)
    make_dataset(ws)
    common = ["--scale", "2", "--rs_deep", str(opt.depth), "--shape", "48",
              "--batch_size", "16", "--save_name", "x", "--ckpt_every", "25",
              "--train_json", str(ws / "train_images.json"),
              "--no_tensorboard", "--worker", "4"]

    def evaluate(ckpt: str, tag: str) -> dict:
        art = ws / f"{tag}.isr"
        ex(["--checkpoint", str(ws / ckpt), "--out", str(art),
            "--rs_deep", str(opt.depth), "--scale", "2"])
        print(f"--- eval {tag} ---")
        return ev(["--model", str(art), "--val_json", str(ws / "val_images.json"),
                   "--shape", "96", "--batch_size", "2"])

    results = {}
    # A: pixel pretrain.
    tr(["--resnet", "--epochs", str(opt.e1), "--work_dir", str(ws), *common])
    results["A_pixel_pretrain"] = evaluate(f"res_x_{opt.depth}_0.2.ckpt", "a")

    # B: GAN phase on top (warm-starts from the res ckpt automatically).
    gan_dir = ws / "gan"
    gan_dir.mkdir()
    shutil.copy(ws / f"res_x_{opt.depth}_0.2.ckpt", gan_dir)
    tr(["--epochs", str(opt.e2), "--work_dir", str(gan_dir), *common])
    results["B_gan_random_vgg"] = evaluate(f"gan/gen_x_{opt.depth}_0.2.ckpt", "b")

    # C: pixel-only control — same warm start, same extra epochs as B
    # (--resume on a FINAL checkpoint restores params but not the optimizer,
    # exactly like B's warm start, so the comparison is symmetric).
    ctl_dir = ws / "control"
    ctl_dir.mkdir()
    shutil.copy(ws / f"res_x_{opt.depth}_0.2.ckpt", ctl_dir)
    tr(["--resnet", "--resume", "--epochs", str(opt.e2),
        "--work_dir", str(ctl_dir), *common])
    results["C_pixel_control"] = evaluate(f"control/res_x_{opt.depth}_0.2.ckpt", "c")

    # Content-loss magnitude with the calibrated random-VGG features.
    contents = []
    jsonl = gan_dir / "x_metrics.jsonl"
    if jsonl.exists():
        for line in jsonl.read_text().splitlines():
            rec = json.loads(line)
            if rec["tag"] == "loss/content":
                contents.append(rec["value"])
    if contents:
        results["content_loss"] = {
            "first": round(contents[0], 5),
            "last": round(contents[-1], 5),
            "mean": round(float(np.mean(contents)), 5),
        }

    print(json.dumps(results, indent=2))
    (ws / "results.json").write_text(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    run()
