#!/usr/bin/env python
"""End-to-end real-chip drive used by /verify sessions (not a test).

create_json -> 1-epoch pixel train -> export (incl. reverse-interop
state_dicts) -> rs.py on a folder with COLLIDING names (the round-3
uniquify fix) -> checks output sizes and uniqueness. Runs on the default
backend (the real TPU chip in this container).
"""

import sys
import tempfile
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from image_super_resolution_tpu.cli.create_json import main as cj  # noqa: E402
from image_super_resolution_tpu.cli.evaluate import main as ev  # noqa: E402
from image_super_resolution_tpu.cli.export import main as ex  # noqa: E402
from image_super_resolution_tpu.cli.rs import main as rs  # noqa: E402
from image_super_resolution_tpu.cli.train import main as tr  # noqa: E402

ws = Path(tempfile.mkdtemp(prefix="isr_verify_"))
imgs = ws / "imgs"
imgs.mkdir()
rng = np.random.default_rng(0)
for i in range(6):
    base = rng.uniform(0, 255, (10, 10, 3))
    arr = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    Image.fromarray(arr).save(imgs / f"img_{i}.png")

cj(["--train_dirs", str(imgs), "--shape", "48", "--output", str(ws)])
tr(["--resnet", "--scale", "2", "--save_name", "v",
    "--train_json", str(ws / "train_images.json"), "--work_dir", str(ws),
    "--epochs", "1", "--batch_size", "2", "--rs_deep", "1", "--shape", "48",
    "--worker", "2", "--no_tensorboard"])
ckpt = ws / "res_v_1_0.2.ckpt"
assert ckpt.exists(), "train produced no checkpoint"

art = ws / "model.isr"
ex(["--checkpoint", str(ckpt), "--out", str(art), "--rs_deep", "1",
    "--scale", "2", "--torch_state_dict", str(ws / "back.pt"), "--smoke"])
assert art.exists() and (ws / "back.pt").exists()

# folder batch with colliding names: photo.jpg + photo.png + photo_jpg.png
batch = ws / "batch"
batch.mkdir()
pic = np.asarray(Image.open(imgs / "img_0.png"))
Image.fromarray(pic).save(batch / "photo.jpg")
Image.fromarray(pic).save(batch / "photo.png")
Image.fromarray(pic).save(batch / "photo_jpg.png")
out_dir = ws / "out"
rs(["--model", str(art), "--src", str(batch), "--save_dir", str(out_dir),
    "--window_size", "48", "--batch_size", "2"])
outs = sorted(p.name for p in out_dir.glob("*.png"))
print("outputs:", outs)
assert len(outs) == 3, f"collision lost an output: {outs}"
for p in out_dir.glob("*.png"):
    assert Image.open(p).size == (160, 160)

import json as _json

(ws / "val.json").write_text(_json.dumps(sorted(p.as_posix() for p in imgs.glob("*.png"))))
res = ev(["--model", str(art), "--val_json", str(ws / "val.json"),
          "--shape", "64", "--batch_size", "2"])
assert all(np.isfinite(res[k]) for k in ("psnr", "psnr_y", "ssim"))

# denoise_fast family: train -> export (dims+downshuffle inferred) -> x1 rs
# -> --denoise_eval, on the real chip
tr(["--train_denoise", "--family", "fast", "--width", "8", "--save_name", "v",
    "--train_json", str(ws / "train_images.json"), "--work_dir", str(ws),
    "--epochs", "1", "--batch_size", "2", "--rs_deep", "1", "--shape", "48",
    "--worker", "2", "--no_tensorboard"])
dn_art = ws / "dn.isr"
ex(["--checkpoint", str(ws / "denoise_v_1_0.2.ckpt"), "--out", str(dn_art),
    "--family", "denoise_fast", "--smoke"])
rs(["--model", str(dn_art), "--src", str(imgs / "img_1.png"),
    "--save_dir", str(ws / "dn.png"), "--window_size", "48", "--overlap", "4",
    "--batch_size", "2"])
assert Image.open(ws / "dn.png").size == (80, 80)  # x1 contract
res_dn = ev(["--model", str(dn_art), "--val_json", str(ws / "val.json"),
             "--shape", "64", "--batch_size", "2", "--denoise_eval"])
assert np.isfinite(res_dn["psnr_y"]) and "noisy_psnr" in res_dn
print("VERIFY DRIVE OK", ws)
