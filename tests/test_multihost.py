"""Multi-HOST training smoke: two jax.distributed processes (4 virtual CPU
devices each = 8 global) run the REAL train CLI end to end — manifest
striping per process, global dp-sharded batches assembled with
make_array_from_process_local_data, gradient psum over hosts via the Gloo
collective backend, single-writer checkpointing.

This is the piece the in-process 8-device mesh tests CANNOT cover: real
process boundaries, a real coordinator, and non-addressable devices.

Case coverage (each was a confirmed or suspected round-2 failure mode):
- UNEVEN manifest (23 images / 2 procs): round 2 striped [pid::count] and
  derived steps_per_epoch per host, deadlocking host 0 in its step-3 psum
  while host 1 exited; equal-length stripes must give both hosts the same
  step count.
- --mean: stats must come from the FULL manifest so hosts compile identical
  programs.
- --eval_every: eval batches must become global arrays in lockstep.
- GAN phase across processes: two optimizers + perceptual loss + D state.
"""

import os
import socket
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
    # Workers must not share the user-level persistent compile cache: a
    # cache-hit/miss asymmetry between processes skews their arrival at the
    # first collective past Gloo's 30 s rendezvous deadline (observed), and
    # concurrent LRU eviction against one directory is not what the feature
    # is for. Belt to conftest.py's suspenders — this also holds when the
    # test file is run without the repo conftest.
    env["ISR_COMPILE_CACHE"] = "off"
    return env


def _free_port() -> str:
    # Ephemeral port instead of a hardcoded one: parallel CI shards or a
    # leaked coordinator from a timed-out run would otherwise collide.
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


def _make_manifest(tmp_path, n_images: int) -> None:
    from PIL import Image

    from image_super_resolution_tpu.cli.create_json import main as cj

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n_images):
        Image.fromarray(
            rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        ).save(img_dir / f"i{i}.png")
    cj(["--train_dirs", str(img_dir), "--shape", "32", "--output", str(tmp_path)])


def _run_workers(tmp_path, phase: str, extra=(), timeout=900, n_procs=2):
    env = _scrubbed_env(4)
    env["_ISR_MH_NPROC"] = str(n_procs)
    worker = str(REPO / "tests" / "multihost_worker.py")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), port, str(tmp_path), phase,
             *extra],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(n_procs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER {pid} DONE" in out
    return outs


def test_two_process_uneven_manifest_with_mean_and_eval(tmp_path):
    """23 images / 2 processes: the round-2 repro that deadlocked. Equal
    stripes (11 each, remainder dropped) must complete on BOTH workers, with
    --mean (global stats) and --eval_every (lockstep global eval batches)."""
    _make_manifest(tmp_path, 23)
    outs = _run_workers(
        tmp_path, "pixel",
        extra=["--mean", "--eval_every", "1",
               "--eval_json", str(tmp_path / "train_images.json")],
    )

    assert "multi-host 2 processes, global batch 8" in outs[0]
    # both hosts must agree on the stripe length AND the step count
    for out in outs:
        assert "11 images, 2 steps/epoch" in out
    # eval ran on proc 0 (and did not desync proc 1, which also completed)
    assert "Eval [0]" in outs[0]

    from image_super_resolution_tpu.train import load_checkpoint

    ckpt = tmp_path / "res_mh_1_0.2.ckpt"
    assert ckpt.exists()
    meta = load_checkpoint(ckpt)["meta"]
    assert meta["step"] > 0
    assert np.all(np.isfinite(meta["loss"]))


def test_two_process_gan_phase(tmp_path):
    """Pixel pretrain then GAN fine-tune across real process boundaries —
    the GAN step's two optimizers, perceptual loss, and D state have to run
    the same collective program on both hosts."""
    _make_manifest(tmp_path, 16)
    # generous timeout: two sequential train runs + GAN compile; under full
    # parallel-suite load the wall clock roughly doubles vs standalone
    outs = _run_workers(tmp_path, "pixel+gan", timeout=1800)
    for pid, out in enumerate(outs):
        assert f"WORKER {pid} PHASE pixel DONE" in out
        assert f"WORKER {pid} PHASE gan DONE" in out

    from image_super_resolution_tpu.train import load_checkpoint

    ckpt = tmp_path / "gen_mh_1_0.2.ckpt"
    assert ckpt.exists()
    data = load_checkpoint(ckpt)
    assert "d_params" in data  # D state saved by the single writer
    assert np.all(np.isfinite(data["meta"]["loss"]))


def test_two_process_resume_without_shared_workdir(tmp_path):
    """Hosts need not share a filesystem: on --resume only host 0 may see
    the checkpoint. Without the proc-0 broadcast of (state, start_epoch),
    host 0 would resume at epoch 1 and run ONE epoch while host 1 starts
    at epoch 0 and runs TWO — unequal lockstep epoch counts (deadlock)
    plus psum-averaging of divergent weights. With the broadcast, BOTH
    hosts adopt host 0's resumed state and skip epoch 0 entirely.

    The checkpoint is synthesized NON-final (final saves drop opt_state and
    would not advance start_epoch — that degenerate case tests nothing)."""
    import jax
    import jax.numpy as jnp

    from image_super_resolution_tpu.models import SRGenerator
    from image_super_resolution_tpu.train import (
        build_optimizer,
        create_train_state,
        load_checkpoint,
        save_checkpoint,
    )

    _make_manifest(tmp_path, 16)
    w0 = tmp_path / "w0"
    w1 = tmp_path / "w1"
    w0.mkdir()
    w1.mkdir()

    # Non-final epoch-0 checkpoint visible to host 0 only: same model and
    # optimizer family the CLI builds, so its tree structures match.
    model = SRGenerator(depth=1, add_rate=0.2, scale=2)
    state = create_train_state(
        model, (1, 24, 24, 3), build_optimizer(total_steps=4),
        jax.random.PRNGKey(0), ema_tau=4.0,
    )
    state = state.replace(step=jnp.asarray(2, jnp.int32))
    ckpt = w0 / "res_mh_1_0.2.ckpt"
    save_checkpoint(ckpt, state, epoch=0,
                    mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225],
                    loss_history=[0.1], final=False)

    # per-host work dirs ({pid} substituted by the worker): only host 0 can
    # see the checkpoint
    outs = _run_workers(
        tmp_path, "pixel",
        extra=["--resume", "--epochs", "2",
               "--work_dir", str(tmp_path / "w{pid}")],
    )
    assert "load from" in outs[0]      # host 0 resumed from its checkpoint
    assert "load from" not in outs[1]  # host 1 had nothing to load
    for out in outs:  # BOTH hosts adopted start_epoch=1: epoch 0 never ran
        assert "Epoch [1]" in out
        assert "Epoch [0]" not in out

    meta = load_checkpoint(ckpt)["meta"]
    assert meta["epoch"] == 1  # resumed at epoch 1, ran exactly one more
    assert meta["step"] > 2    # continued from the synthesized step counter
    assert np.all(np.isfinite(meta["loss"]))


def test_two_process_orbax_backend(tmp_path):
    """``--ckpt_backend orbax`` inside a real 2-process run. Same scenario as
    the msgpack resume test (non-final checkpoint visible to host 0 only),
    but the checkpoint is an Orbax DIRECTORY: proc 0 restores it, broadcasts
    state, and is the sole writer of the per-epoch overwrite."""
    import jax
    import jax.numpy as jnp

    from image_super_resolution_tpu.models import SRGenerator
    from image_super_resolution_tpu.train import build_optimizer, create_train_state
    from image_super_resolution_tpu.train.orbax_io import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    _make_manifest(tmp_path, 16)
    w0 = tmp_path / "w0"
    w1 = tmp_path / "w1"
    w0.mkdir()
    w1.mkdir()

    model = SRGenerator(depth=1, add_rate=0.2, scale=2)
    state = create_train_state(
        model, (1, 24, 24, 3), build_optimizer(total_steps=4),
        jax.random.PRNGKey(0), ema_tau=4.0,
    )
    state = state.replace(step=jnp.asarray(2, jnp.int32))
    ckpt = w0 / "res_mh_1_0.2.ckpt"
    save_checkpoint_orbax(ckpt, state, epoch=0,
                          mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225],
                          loss_history=[0.1], final=False)

    outs = _run_workers(
        tmp_path, "pixel",
        extra=["--resume", "--epochs", "2", "--ckpt_backend", "orbax",
               "--work_dir", str(tmp_path / "w{pid}")],
    )
    assert "load from" in outs[0]
    assert "load from" not in outs[1]
    for out in outs:  # both hosts adopted proc 0's start_epoch=1
        assert "Epoch [1]" in out
        assert "Epoch [0]" not in out

    assert ckpt.is_dir()
    data = load_checkpoint_orbax(ckpt)
    assert data["meta"]["epoch"] == 1
    assert data["meta"]["step"] > 2
    assert np.all(np.isfinite(data["meta"]["loss"]))
    assert not (w1 / "res_mh_1_0.2.ckpt").exists()  # single writer


def test_two_process_fast_family(tmp_path):
    """--family fast across real process boundaries: the flagship's
    sharding-agnostic step must run the same collective program on both
    hosts (same machinery as sr, but the param tree / step graph differ —
    this pins that nothing in the multi-host path is sr-specific)."""
    _make_manifest(tmp_path, 16)
    outs = _run_workers(
        tmp_path, "pixel", extra=["--family", "fast", "--width", "8"],
    )
    for pid, out in enumerate(outs):
        assert f"WORKER {pid} PHASE pixel DONE" in out

    from image_super_resolution_tpu.train import load_checkpoint

    ckpt = tmp_path / "res_mh_1_0.2.ckpt"
    assert ckpt.exists()
    meta = load_checkpoint(ckpt)["meta"]
    assert meta["step"] > 0
    assert np.all(np.isfinite(meta["loss"]))


def test_two_process_denoise_fast_family(tmp_path):
    """The denoise phase across real process boundaries, with the
    denoise_fast family: its on-device degradation rng comes from --seed
    (identical on every host), so hosts apply the same noise program to
    their own manifest stripes — this pins that the third phase (and the
    sub-pixel-front model) is not single-host-only."""
    _make_manifest(tmp_path, 16)
    outs = _run_workers(
        tmp_path, "denoise", extra=["--family", "fast", "--width", "8"],
    )
    for pid, out in enumerate(outs):
        assert f"WORKER {pid} PHASE denoise DONE" in out

    from image_super_resolution_tpu.train import load_checkpoint

    ckpt = tmp_path / "denoise_mh_1_0.2.ckpt"
    assert ckpt.exists()
    meta = load_checkpoint(ckpt)["meta"]
    assert meta["step"] > 0
    assert np.all(np.isfinite(meta["loss"]))


def test_three_process_uneven_manifest(tmp_path):
    """Nothing in the multi-host path may assume exactly two hosts: three
    processes (12 global devices) over a 23-image manifest must agree on
    stripes (7 each, 2 dropped) and complete in lockstep."""
    _make_manifest(tmp_path, 23)
    outs = _run_workers(tmp_path, "pixel", n_procs=3)

    assert "multi-host 3 processes, global batch 12" in outs[0]
    for out in outs:
        assert "7 images, 1 steps/epoch" in out

    from image_super_resolution_tpu.train import load_checkpoint

    meta = load_checkpoint(tmp_path / "res_mh_1_0.2.ckpt")["meta"]
    assert meta["step"] > 0
    assert np.all(np.isfinite(meta["loss"]))
