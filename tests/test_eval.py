"""Eval CLI + degradation parity tests."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_eval_cli_reports_metrics(tmp_path):
    from PIL import Image

    from image_super_resolution_tpu.cli.evaluate import main as eval_main
    from image_super_resolution_tpu.models import SRGenerator
    from image_super_resolution_tpu.models.deploy import DeploySpec, save_artifact

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        base = rng.uniform(0, 255, (12, 12, 3))
        arr = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
        p = img_dir / f"v{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p.as_posix())
    (tmp_path / "val.json").write_text(json.dumps(paths))

    spec = DeploySpec(family="sr", depth=1, width=8, scale=2)
    model = spec.build_model(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    artifact = tmp_path / "m.isr"
    save_artifact(artifact, spec, params)

    result = eval_main([
        "--model", str(artifact), "--val_json", str(tmp_path / "val.json"),
        "--shape", "64", "--batch_size", "2",
        "--json_out", str(tmp_path / "r.json"),
    ])
    for key in ("psnr", "psnr_y", "ssim", "bicubic_psnr"):
        assert key in result and np.isfinite(result[key])
    assert result["scale"] == 2
    assert json.loads((tmp_path / "r.json").read_text()) == result
    # a random-weight model must lose to bicubic; sanity of the baseline
    assert result["bicubic_psnr"] > result["psnr"]


def test_downscale_matches_cv2_bilinear():
    """Our default LR degradation vs the reference's cv2.INTER_LINEAR resize
    (albumentations.Resize default, utils/datasets.py:302)."""
    cv2 = pytest.importorskip("cv2")

    from image_super_resolution_tpu.data.degrade import downscale

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (60, 60, 3)).astype(np.float32)  # white noise: strictest
    for s in (2, 3, 4):
        want = cv2.resize(img, (60 // s, 60 // s), interpolation=cv2.INTER_LINEAR)
        got = np.asarray(downscale(jnp.asarray(img[None]), s)[0])
        # closed-form midpoint sampling == cv2 INTER_LINEAR exactly
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"scale {s}")


def test_profiling_step_timer():
    from image_super_resolution_tpu.utils.profiling import StepTimer

    t = StepTimer(window=4)
    t.tick()
    for _ in range(4):
        t.tick()
    assert t.steps_per_sec > 0
    assert t.patches_per_sec(16) == pytest.approx(t.steps_per_sec * 16)


def test_eval_cli_data_devices_matches_single(tmp_path):
    """eval --data_devices shards eval batches over the data mesh and must
    reproduce the single-device metrics exactly."""
    from PIL import Image

    from image_super_resolution_tpu.cli.evaluate import main as eval_main
    from image_super_resolution_tpu.models.deploy import DeploySpec, save_artifact

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    paths = []
    for i in range(8):
        base = rng.uniform(0, 255, (12, 12, 3))
        arr = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
        p = img_dir / f"v{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p.as_posix())
    (tmp_path / "val.json").write_text(json.dumps(paths))

    spec = DeploySpec(family="sr", depth=1, width=8, scale=2)
    model = spec.build_model(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    artifact = tmp_path / "m.isr"
    save_artifact(artifact, spec, params)

    args = ["--model", str(artifact), "--val_json", str(tmp_path / "val.json"),
            "--shape", "48", "--batch_size", "8"]
    single = eval_main(args)
    sharded = eval_main(args + ["--data_devices", "8"])
    for k in ("psnr", "psnr_y", "ssim"):
        # differently-partitioned XLA reductions need not be bit-identical
        np.testing.assert_allclose(sharded[k], single[k], rtol=1e-4,
                                   err_msg=k)
