"""Worker for tests/test_multihost.py: one process of a 2-process
jax.distributed run driving the REAL train CLI. Launched in a subprocess
with JAX_PLATFORMS=cpu + 4 virtual devices per process.

argv: pid port workdir phase(pixel|gan|pixel+gan) [extra train flags...]
The gan phase warm-starts from the pixel checkpoint, so "pixel+gan" runs
both sequentially in the same distributed processes — covering the GAN
cross-process seam (two optimizers + perceptual loss + D state) that a
pixel-only smoke never exercises.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, port, ws = int(sys.argv[1]), sys.argv[2], sys.argv[3]
phases = sys.argv[4].split("+") if len(sys.argv) > 4 else ["pixel"]
# "{pid}" in extra args is substituted per process — lets tests give hosts
# DIFFERENT work dirs (unshared-filesystem scenarios).
extra = [a.replace("{pid}", str(pid)) for a in sys.argv[5:]]
nproc = int(os.environ.get("_ISR_MH_NPROC", "2"))

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc

from image_super_resolution_tpu.cli.train import main as train_main  # noqa: E402

common = [
    "--scale", "2", "--save_name", "mh",
    "--train_json", f"{ws}/train_images.json", "--work_dir", ws,
    "--epochs", "1", "--batch_size", "4", "--rs_deep", "1", "--shape", "32",
    "--no_tensorboard", "--worker", "2", "--loader_backend", "python",
]
for phase in phases:
    args = common + extra
    if phase == "pixel":
        args = ["--resnet"] + args
    elif phase == "denoise":
        args = ["--train_denoise"] + args
    train_main(args)
    print(f"WORKER {pid} PHASE {phase} DONE", flush=True)
print(f"WORKER {pid} DONE", flush=True)
