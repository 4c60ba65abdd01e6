"""Multi-HOST training smoke: two jax.distributed processes (4 virtual CPU
devices each = 8 global) run the REAL train CLI end to end — manifest
striping per process, global dp-sharded batches assembled with
make_array_from_process_local_data, gradient psum over hosts via the Gloo
collective backend, single-writer checkpointing.

This is the piece the in-process 8-device mesh tests CANNOT cover: real
process boundaries, a real coordinator, and non-addressable devices.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _scrubbed_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    entries = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([str(REPO)] + entries)
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def test_two_process_train_cli(tmp_path):
    from PIL import Image

    from image_super_resolution_tpu.cli.create_json import main as cj

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(16):
        Image.fromarray(
            rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        ).save(img_dir / f"i{i}.png")
    cj(["--train_dirs", str(img_dir), "--shape", "32", "--output", str(tmp_path)])

    env = _scrubbed_env(4)
    worker = str(REPO / "tests" / "multihost_worker.py")
    port = "9757"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), port, str(tmp_path)],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER {pid} DONE" in out

    # both processes saw the multi-host config; process 0 wrote the ckpt
    assert "multi-host 2 processes, global batch 8" in outs[0]
    ckpt = tmp_path / "res_mh_1_0.2.ckpt"
    assert ckpt.exists()

    from image_super_resolution_tpu.train import load_checkpoint

    meta = load_checkpoint(ckpt)["meta"]
    assert meta["step"] > 0
    assert np.all(np.isfinite(meta["loss"]))
