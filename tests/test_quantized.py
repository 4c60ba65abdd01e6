"""Int8 PTQ serving path for the fast family (models/quantized.py).

The load-bearing test is the first one: the functional bf16 mirror must be
BIT-IDENTICAL to the flax FastSRGenerator, because the calibration and
int8 graphs are that same function with hooks swapped in — exactness there
means the quantized path approximates the real deployed model, not a
drifted re-implementation of it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_super_resolution_tpu.models.deploy import DeployedModel, DeploySpec
from image_super_resolution_tpu.models.fast import FastSRGenerator
from image_super_resolution_tpu.models.quantized import (
    calibrate_scales,
    fast_forward,
    int8_forward,
    quantize_deployed,
    quantize_fast_params,
    trunk_sites,
)

DEPTH, WIDTH, SCALE, ADD = 3, 16, 2, 0.2


@pytest.fixture(scope="module")
def tiny():
    model = FastSRGenerator(depth=DEPTH, width=WIDTH, scale=SCALE,
                            add_rate=ADD, fused=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))[
        "params"
    ]
    return model, params


def _norm_batch(seed, shape=(2, 12, 12, 3)):
    # a plausible normalized input: zero-mean, unit-ish scale
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


def test_functional_mirror_is_bit_exact(tiny):
    model, params = tiny
    x = _norm_batch(0)
    want = np.asarray(model.apply({"params": params}, x))
    got = np.asarray(fast_forward(params, x, DEPTH, ADD, SCALE))
    np.testing.assert_array_equal(got, want)


def test_functional_mirror_bit_exact_with_downshuffle():
    """Same contract for the denoise_fast variant: the mirror must replicate
    the sub-pixel front (edge-pad + space_to_depth + crop-back) exactly,
    odd input sizes included."""
    from image_super_resolution_tpu.models import FastDenoiser

    model = FastDenoiser(depth=2, width=16, downshuffle=2, fused=True)
    params = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 8, 8, 3)))[
        "params"
    ]
    for shape in [(2, 12, 12, 3), (1, 7, 9, 3)]:
        x = _norm_batch(5, shape)
        want = np.asarray(model.apply({"params": params}, x))
        got = np.asarray(
            fast_forward(params, x, 2, ADD, 1, downshuffle=2)
        )
        np.testing.assert_array_equal(got, want)


def test_functional_mirror_bit_exact_with_refine():
    """The refinement tail (models/fast.py refine_blocks) must be mirrored
    exactly too — calibration and int8 serving run through this function."""
    from image_super_resolution_tpu.models import FastDenoiser

    model = FastDenoiser(depth=2, width=16, downshuffle=2, refine_blocks=2,
                         refine_width=8, fused=True)
    params = model.init(jax.random.PRNGKey(6), jnp.zeros((1, 8, 8, 3)))[
        "params"
    ]
    for shape in [(2, 12, 12, 3), (1, 7, 9, 3)]:
        x = _norm_batch(7, shape)
        want = np.asarray(model.apply({"params": params}, x))
        got = np.asarray(
            fast_forward(params, x, 2, ADD, 1, downshuffle=2, refine_blocks=2)
        )
        np.testing.assert_array_equal(got, want)


def test_quantize_deployed_refine_uint8_parity():
    """int8 PTQ end to end on a refine-tail artifact: the refine params pass
    through unquantized and the uint8 outputs track the bf16 deployment."""
    spec = DeploySpec(family="denoise_fast", depth=DEPTH, width=WIDTH,
                      add_rate=ADD, downshuffle=2, refine_blocks=2,
                      refine_width=8)
    m = spec.build_model()
    variables = m.init(jax.random.PRNGKey(8), jnp.zeros((1, 8, 8, 3)))
    deployed = DeployedModel(spec, variables["params"])
    rng = np.random.default_rng(13)
    tiles = jnp.asarray(rng.integers(0, 256, (2, 17, 15, 3), np.uint8))
    q = quantize_deployed(deployed, [tiles])
    got = np.asarray(q(tiles)).astype(np.int32)
    want = np.asarray(deployed(tiles)).astype(np.int32)
    assert got.shape == want.shape == (2, 17, 15, 3)
    diff = np.abs(got - want)
    assert float(diff.mean()) < 1.0
    assert int(diff.max()) <= 8


def test_quantize_deployed_denoise_fast_uint8_parity():
    spec = DeploySpec(family="denoise_fast", depth=DEPTH, width=WIDTH,
                      add_rate=ADD, downshuffle=2)
    m = spec.build_model()
    variables = m.init(jax.random.PRNGKey(5), jnp.zeros((1, 8, 8, 3)))
    deployed = DeployedModel(spec, variables["params"])
    rng = np.random.default_rng(11)
    tiles = jnp.asarray(rng.integers(0, 256, (2, 17, 15, 3), np.uint8))
    q = quantize_deployed(deployed, [tiles])
    got = np.asarray(q(tiles)).astype(np.int32)
    want = np.asarray(deployed(tiles)).astype(np.int32)
    assert got.shape == want.shape == (2, 17, 15, 3)
    diff = np.abs(got - want)
    assert float(diff.mean()) < 1.0
    assert int(diff.max()) <= 8


def test_calibration_covers_every_site(tiny):
    _, params = tiny
    scales = calibrate_scales(params, [_norm_batch(1)], DEPTH, ADD, SCALE)
    assert set(scales) == set(trunk_sites(DEPTH))
    assert all(s > 0 for s in scales.values())


def test_int8_forward_tracks_bf16(tiny):
    model, params = tiny
    scales = calibrate_scales(
        params, [_norm_batch(1), _norm_batch(2)], DEPTH, ADD, SCALE
    )
    q = quantize_fast_params(
        jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params),
        scales, DEPTH,
    )
    x = _norm_batch(3)
    ref = np.asarray(model.apply({"params": params}, x))
    got = np.asarray(int8_forward(q, x, DEPTH, ADD, SCALE))
    assert got.shape == ref.shape
    mse = float(np.mean((got - ref) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # tanh range spans 2.0
    assert psnr > 40, f"int8 trunk diverged from bf16: {psnr:.1f} dB"
    assert float(np.abs(got - ref).max()) < 0.05


def test_quantize_deployed_uint8_parity():
    spec = DeploySpec(family="fast", depth=DEPTH, width=WIDTH, scale=SCALE,
                      add_rate=ADD)
    m = spec.build_model()
    variables = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))
    deployed = DeployedModel(spec, variables["params"])
    rng = np.random.default_rng(7)
    tiles = jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3), np.uint8))
    q = quantize_deployed(deployed, [tiles])
    got = np.asarray(q(tiles)).astype(np.int32)
    want = np.asarray(deployed(tiles)).astype(np.int32)
    assert got.shape == want.shape and got.dtype == want.dtype
    diff = np.abs(got - want)
    assert float(diff.mean()) < 1.0
    assert int(diff.max()) <= 8


def test_int8_through_tiled_engine():
    """The quantized wrapper drops into TiledUpscaler like any deployed
    model (same call surface), and the tiled int8 output tracks the tiled
    bf16 output."""
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    spec = DeploySpec(family="fast", depth=DEPTH, width=WIDTH, scale=SCALE,
                      add_rate=ADD)
    m = spec.build_model()
    variables = m.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 8, 3)))
    deployed = DeployedModel(spec, variables["params"])
    img = np.random.default_rng(3).integers(0, 255, (40, 56, 3), np.uint8)
    calib = jnp.asarray(img[:16, :16][None])
    q = quantize_deployed(deployed, [calib])
    a = TiledUpscaler(deployed, window=16, overlap=4, batch_size=4
                      ).upscale_image(img)
    b = TiledUpscaler(q, window=16, overlap=4, batch_size=4
                      ).upscale_image(img)
    assert a.shape == b.shape == (80, 112, 3)
    diff = np.abs(a.astype(int) - b.astype(int))
    assert float(diff.mean()) < 1.5 and int(diff.max()) <= 12


def test_rs_cli_int8(tmp_path):
    """rs.py --int8 end to end: artifact -> self-calibrated PTQ -> tiled
    upscale; output tracks the bf16 run. --int8 + --tp_devices rejected."""
    from PIL import Image

    from image_super_resolution_tpu.cli import rs
    from image_super_resolution_tpu.models.deploy import save_artifact

    spec = DeploySpec(family="fast", depth=DEPTH, width=WIDTH, scale=SCALE,
                      add_rate=ADD)
    m = spec.build_model()
    variables = m.init(jax.random.PRNGKey(3), jnp.zeros((1, 8, 8, 3)))
    isr = tmp_path / "m.isr"
    save_artifact(isr, spec, variables["params"])
    src = tmp_path / "in.png"
    Image.fromarray(
        np.random.default_rng(4).integers(0, 255, (40, 56, 3), np.uint8)
    ).save(src)

    common = ["--model", str(isr), "--src", str(src),
              "--window_size", "16", "--overlap", "4"]
    rs.main([*common, "--save_dir", str(tmp_path / "bf16.png")])
    rs.main([*common, "--save_dir", str(tmp_path / "int8.png"), "--int8"])
    a = np.asarray(Image.open(tmp_path / "bf16.png"), dtype=int)
    b = np.asarray(Image.open(tmp_path / "int8.png"), dtype=int)
    assert a.shape == b.shape == (80, 112, 3)
    diff = np.abs(a - b)
    assert float(diff.mean()) < 1.5 and int(diff.max()) <= 12

    with pytest.raises(SystemExit, match="tp_devices"):
        rs.main([*common, "--save_dir", str(tmp_path / "x.png"),
                 "--int8", "--tp_devices", "2"])


def test_int8_with_data_axis_sharding_matches_single_device():
    """rs.py allows --int8 --data_devices: the quantized wrapper must
    produce identical tiles when the engine shards tile batches over the
    data mesh axis."""
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    spec = DeploySpec(family="fast", depth=DEPTH, width=WIDTH, scale=SCALE,
                      add_rate=ADD)
    m = spec.build_model()
    variables = m.init(jax.random.PRNGKey(5), jnp.zeros((1, 8, 8, 3)))
    deployed = DeployedModel(spec, variables["params"])
    img = np.random.default_rng(6).integers(0, 255, (40, 56, 3), np.uint8)
    q = quantize_deployed(deployed, [jnp.asarray(img[:16, :16][None])])
    single = TiledUpscaler(q, window=16, overlap=4, batch_size=4
                           ).upscale_image(img)
    sharded = TiledUpscaler(q, window=16, overlap=4, batch_size=4,
                            data_devices=2).upscale_image(img)
    np.testing.assert_array_equal(single, sharded)


def test_int8_rejects_spatial_sharding():
    """--int8 + spatial sharding is forbidden: requantization turns the
    sub-LSB halo-truncation and shape-dependent-reassociation differences
    the bf16 spatial path tolerates into full quant steps that cascade
    through the trunk (measured up to ~40 uint8 LSB on a depth-3 toy) —
    the band output would visibly depend on the device count."""
    from image_super_resolution_tpu.cli import rs

    with pytest.raises(SystemExit, match="spatial"):
        rs.run(model="unused.isr", src="unused.png", int8=True,
               spatial_devices=2)
    with pytest.raises(SystemExit, match="spatial"):
        rs.run(model="unused.isr", src="unused.png", int8=True,
               spatial_grid=(2, 2))


def test_eval_cli_int8_quantifies_ptq_cost(tmp_path):
    """evaluate.py --int8 runs the PTQ path on a real manifest and lands
    within tolerance of the bf16 metrics — the tool that quantifies the
    quantization quality cost on a trained checkpoint."""
    import json

    from PIL import Image

    from image_super_resolution_tpu.cli.evaluate import main as eval_main
    from image_super_resolution_tpu.models.deploy import save_artifact

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

    spec = DeploySpec(family="fast", depth=DEPTH, width=WIDTH, scale=SCALE,
                      add_rate=ADD)
    m = spec.build_model()
    params = m.init(jax.random.PRNGKey(4), jnp.zeros((1, 8, 8, 3)))["params"]
    artifact = tmp_path / "m.isr"
    save_artifact(artifact, spec, params)

    common = ["--model", str(artifact), "--val_json",
              str(tmp_path / "val.json"), "--shape", "64",
              "--batch_size", "2"]
    bf16 = eval_main(common)
    int8 = eval_main([*common, "--int8"])
    for key in ("psnr", "psnr_y", "ssim"):
        assert np.isfinite(int8[key])
    assert abs(int8["psnr_y"] - bf16["psnr_y"]) < 1.0


def test_int8_calibration_handles_tiny_images_and_mixed_folders(tmp_path):
    """Calibration crops must cope with images smaller than the window (a
    5x100 strip used to produce negative crop origins -> np.stack crash)
    and with folders of mixed sizes (sampled across up to 8 images, one
    COMMON crop size so the calibration forward compiles once)."""
    from PIL import Image

    from image_super_resolution_tpu.cli.rs import _int8_calib_batches

    rng = np.random.default_rng(9)
    tiny = tmp_path / "tiny.png"
    Image.fromarray(rng.integers(0, 255, (5, 100, 3), np.uint8)).save(tiny)
    (batch,) = _int8_calib_batches(tiny, 96)
    assert batch.ndim == 4 and batch.shape[1:] == (5, 5, 3)

    folder = tmp_path / "imgs"
    folder.mkdir()
    for name, shape in (("a.png", (12, 20, 3)), ("b.png", (30, 18, 3))):
        Image.fromarray(rng.integers(0, 255, shape, np.uint8)
                        ).save(folder / name)
    (batch,) = _int8_calib_batches(folder, 96)
    assert batch.shape == (8, 12, 12, 3)  # 4 crops from each of 2 images


def test_int8_calibration_skips_unreadable_files(tmp_path):
    """One corrupt file among the sampled calibration images must not kill
    the batch run (the folder serving loop tolerates bad files; calibration
    inherits that contract). An ALL-corrupt folder still fails loudly."""
    from PIL import Image

    from image_super_resolution_tpu.cli.rs import _int8_calib_batches

    rng = np.random.default_rng(3)
    folder = tmp_path / "imgs"
    folder.mkdir()
    for name, shape in (("a.png", (12, 20, 3)), ("c.png", (30, 18, 3))):
        Image.fromarray(rng.integers(0, 255, shape, np.uint8)
                        ).save(folder / name)
    (folder / "b.png").write_bytes(b"not an image at all")
    (batch,) = _int8_calib_batches(folder, 96)
    assert batch.shape == (8, 12, 12, 3)  # 4 crops from each READABLE image

    bad = tmp_path / "allbad"
    bad.mkdir()
    (bad / "x.png").write_bytes(b"junk")
    with pytest.raises(FileNotFoundError, match="no readable"):
        _int8_calib_batches(bad, 96)


def test_cli_rejects_negative_tp_devices(tmp_path):
    """A negative --tp_devices (typo for a positive count) must error, not
    silently serve single-device with no TP."""
    from image_super_resolution_tpu.cli import rs

    with pytest.raises(SystemExit, match="tp_devices must be >= 0"):
        rs.main(["--model", str(tmp_path / "m.isr"),
                 "--src", str(tmp_path / "in.png"),
                 "--save_dir", str(tmp_path / "o.png"),
                 "--tp_devices", "-4"])


def test_cli_int8_rejects_non_fast_artifacts(tmp_path):
    """rs.py/eval.py --int8 on a non-fast artifact exits with the clean
    one-line message the other flag-validation errors use, not a
    ValueError traceback."""
    import json

    from PIL import Image

    from image_super_resolution_tpu.cli import rs
    from image_super_resolution_tpu.cli.evaluate import main as eval_main
    from image_super_resolution_tpu.models.deploy import save_artifact

    spec = DeploySpec(family="sr", depth=1, width=8, scale=2)
    m = spec.build_model()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    isr = tmp_path / "sr.isr"
    save_artifact(isr, spec, params)
    src = tmp_path / "in.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (20, 20, 3), np.uint8)
    ).save(src)
    with pytest.raises(SystemExit, match="fast famil"):
        rs.main(["--model", str(isr), "--src", str(src),
                 "--save_dir", str(tmp_path / "o.png"), "--int8"])
    (tmp_path / "val.json").write_text(json.dumps([src.as_posix()]))
    with pytest.raises(SystemExit, match="fast famil"):
        eval_main(["--model", str(isr), "--val_json",
                   str(tmp_path / "val.json"), "--shape", "16",
                   "--batch_size", "1", "--int8"])


def test_quantize_deployed_rejects_non_fast():
    spec = DeploySpec(family="sr", depth=1, width=8, scale=2)
    m = spec.build_model()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    deployed = DeployedModel(spec, variables["params"], optimize=False)
    with pytest.raises(ValueError, match="fast famil"):
        quantize_deployed(deployed, [jnp.zeros((1, 8, 8, 3), jnp.uint8)])


def test_quantize_deployed_percentile_calibration():
    """percentile calibration (the high-fidelity PTQ lever, PERF.md r5):
    still tracks bf16 within the standard tolerance, and produces SMALLER
    activation scales than amax (outliers clipped)."""
    from image_super_resolution_tpu.models.quantized import calibrate_scales
    from image_super_resolution_tpu.data.transforms import normalize

    spec = DeploySpec(family="fast", depth=DEPTH, width=WIDTH, scale=SCALE,
                      add_rate=ADD)
    m = spec.build_model()
    variables = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))
    deployed = DeployedModel(spec, variables["params"])
    rng = np.random.default_rng(7)
    tiles = jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3), np.uint8))

    q = quantize_deployed(deployed, [tiles], percentile=99.9)
    got = np.asarray(q(tiles)).astype(np.int32)
    want = np.asarray(deployed(tiles)).astype(np.int32)
    diff = np.abs(got - want)
    assert float(diff.mean()) < 1.0
    assert int(diff.max()) <= 8

    params32 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), deployed.params)
    mean = tuple(float(v) for v in spec.mean)
    std = tuple(float(v) for v in spec.std)
    batch = [normalize(tiles, mean, std)]
    amax = calibrate_scales(params32, batch, DEPTH, ADD, SCALE)
    pct = calibrate_scales(params32, batch, DEPTH, ADD, SCALE,
                           percentile=99.0)
    assert set(amax) == set(pct)
    assert all(pct[s] <= amax[s] + 1e-12 for s in amax)
    assert any(pct[s] < amax[s] for s in amax)  # clipping engaged somewhere
