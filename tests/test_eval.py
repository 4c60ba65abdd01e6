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


def test_texture_metrics_properties():
    """hf_energy_ratio / gradient_hist_distance / sharpness behave as
    documented: blur drops HF energy below 1 and grows the histogram
    distance; noise pushes HF energy above 1; identity is exact."""
    from image_super_resolution_tpu.utils.metrics import (
        gradient_hist_distance,
        hf_energy_ratio,
        sharpness,
    )

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (2, 8, 8, 3))
    hr = jnp.asarray(np.kron(base, np.ones((1, 8, 8, 1))))  # structured
    # identity: ratio == 1, distance == 0
    np.testing.assert_allclose(float(hf_energy_ratio(hr, hr)), 1.0, atol=1e-5)
    assert float(gradient_hist_distance(hr, hr)) == pytest.approx(0.0, abs=1e-6)

    # box-blur the HR: oversmoothed output
    k = np.ones((5, 5)) / 25.0
    blurred = np.stack([
        np.stack([
            np.real(np.fft.ifft2(np.fft.fft2(np.asarray(hr)[n, :, :, c])
                                 * np.fft.fft2(k, s=(64, 64))))
            for c in range(3)
        ], axis=-1)
        for n in range(2)
    ])
    blurred = jnp.asarray(np.clip(blurred, 0, 1))
    assert float(hf_energy_ratio(blurred, hr)) < 0.8
    assert float(gradient_hist_distance(blurred, hr)) > 0.05
    assert float(sharpness(blurred)) < float(sharpness(hr))

    # noisy output: HF energy above ground truth's
    noisy = jnp.clip(hr + rng.normal(0, 0.1, hr.shape), 0, 1)
    assert float(hf_energy_ratio(noisy, hr)) > 1.1


def test_psnr_y_per_image_matches_scalar():
    """The per-image PSNR-Y vector is consistent with the batch scalar:
    for a batch of identical-MSE images they coincide."""
    from image_super_resolution_tpu.utils.metrics import (
        psnr_y,
        psnr_y_per_image,
    )

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(0, 1, (3, 24, 24, 3)))
    b = jnp.clip(a + 0.05, 0, 1)
    per = np.asarray(psnr_y_per_image(a, b))
    assert per.shape == (3,)
    # batch scalar is the PSNR of the pooled MSE — must lie within the
    # per-image range
    scalar = float(psnr_y(a, b))
    assert per.min() - 1e-3 <= scalar <= per.max() + 1e-3


def test_eval_cli_reports_dispersion_and_texture(tmp_path):
    from PIL import Image

    from image_super_resolution_tpu.cli.evaluate import main as eval_main
    from image_super_resolution_tpu.models.deploy import DeploySpec, save_artifact

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(5)
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
    ])
    for key in ("hf_ratio", "grad_dist", "sharpness", "sharpness_hr",
                "bicubic_hf_ratio", "psnr_y_min", "psnr_y_max", "psnr_y_std",
                "psnr_y_median"):
        assert key in result and np.isfinite(result[key]), key
    assert result["n_images"] == 4
    assert result["psnr_y_min"] <= result["psnr_y_median"] <= result["psnr_y_max"]


def test_denoise_severity_presets_order(tmp_path):
    """DENOISE_SEVERITIES: heavier presets damage a clean image more."""
    from image_super_resolution_tpu.data.degrade import (
        DENOISE_SEVERITIES,
        denoise_degradation,
    )
    from image_super_resolution_tpu.utils.metrics import psnr_y

    rng = np.random.default_rng(2)
    base = rng.uniform(0, 1, (2, 12, 12, 3))
    hr = jnp.asarray(np.kron(base, np.ones((1, 8, 8, 1))))
    scores = {}
    for name, (var_r, iso_r, q_r) in DENOISE_SEVERITIES.items():
        noisy = jnp.clip(
            denoise_degradation(jax.random.PRNGKey(0), hr,
                                quality_range=q_r, var_range=var_r,
                                intensity=iso_r),
            0, 1)
        scores[name] = float(psnr_y(noisy, hr))
    assert scores["light"] > scores["default"] > scores["heavy"]


def test_severity_sweep_script(tmp_path):
    """scripts/denoise_severity_sweep.py: evals every artifact in a finished
    denoise workdir at the requested severities (dose-response evidence for
    the x1 gates, VERDICT r4 item 4)."""
    import importlib.util
    from pathlib import Path as _P

    from PIL import Image

    from image_super_resolution_tpu.models.deploy import DeploySpec, save_artifact

    spec_mod = importlib.util.spec_from_file_location(
        "denoise_severity_sweep",
        _P(__file__).resolve().parent.parent / "scripts" /
        "denoise_severity_sweep.py")
    sweep = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(sweep)

    ws = tmp_path / "dq"
    (ws / "imgs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        base = rng.uniform(0, 255, (12, 12, 3))
        arr = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
        p = ws / "imgs" / f"v{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p.as_posix())
    (ws / "val_images.json").write_text(json.dumps(paths))

    spec = DeploySpec(family="denoise_fast", depth=1, width=8, scale=1,
                      downshuffle=2)
    model = spec.build_model(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    save_artifact(ws / "W_tiny.isr", spec, params)

    results = sweep.run(["--workdir", str(ws), "--severities", "light,heavy"])
    assert set(results) == {"W_tiny@light", "W_tiny@heavy"}
    for v in results.values():
        assert np.isfinite(v["psnr_y"]) and np.isfinite(v["noisy_psnr_y"])
    # dose-response: the heavy preset damages the input more
    assert results["W_tiny@heavy"]["noisy_psnr_y"] < \
        results["W_tiny@light"]["noisy_psnr_y"]
    assert (ws / "severity_sweep.json").exists()
