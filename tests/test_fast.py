"""TPU-first flagship family (models/fast.py, ``family="fast"``).

This family has no reference counterpart by design (it is the "re-designed
tpu-first" architecture VERDICT r3 item 1 asked for); the goldens here are
self-consistency contracts: param count of the flagship preset, IO contract
parity with SRGenerator (normalized float in, tanh [-1,1] out), deploy
artifact roundtrip, and remat gradient equality.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_super_resolution_tpu.models import FastSRGenerator, SRGenerator
from image_super_resolution_tpu.models.deploy import (
    DeployedModel,
    DeploySpec,
    build_deployed,
    family_defaults,
    load_artifact,
    save_artifact,
)


def n_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def test_flagship_param_count():
    m = FastSRGenerator()  # preset: depth 14, width 128, x4
    v = jax.eval_shape(m.init, jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(v))
    # head 3->128 (3584) + 14 blocks x 2 convs 128->128 (4,132,352)
    # + trunk_conv (147,584) + tail 128->48 (55,344)
    assert n == 4_338_864


@pytest.mark.parametrize("scale", [1, 2, 4])
def test_forward_shape_and_range(scale):
    m = FastSRGenerator(depth=2, width=16, scale=scale)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    y = m.apply(v, jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)),
                               jnp.float32))
    assert y.shape == (2, 8 * scale, 8 * scale, 3)
    assert y.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh range


def test_bad_scale_rejected():
    m = FastSRGenerator(depth=1, width=8, scale=3)
    with pytest.raises(ValueError, match="scale"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))


def test_family_defaults():
    assert family_defaults("sr") == (16, 64)
    assert family_defaults("fast") == (14, 128)
    assert family_defaults("fast", rs_deep=3) == (3, 128)
    assert family_defaults("fast", width=64) == (14, 64)
    assert family_defaults("denoise") == (16, 64)


def test_infer_family_dims():
    """Export-CLI dim inference: depth/width read from the param tree for
    every family prefix; garbage trees answer (None, None)."""
    from image_super_resolution_tpu.models.deploy import infer_family_dims

    m = FastSRGenerator(depth=3, width=16, scale=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert infer_family_dims(v["params"], "fast") == (3, 16)

    s = SRGenerator(depth=2, add_rate=0.2, scale=2, enchant=True)
    vs = s.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert infer_family_dims(vs["params"], "sr") == (2, 64)

    # Denoiser builds depth//2 res0_ blocks: the key count must be DOUBLED
    # or every flag-less denoise export silently builds a half-depth model.
    from image_super_resolution_tpu.models import Denoiser
    from image_super_resolution_tpu.models.denoiser import LegacyDenoiser

    d = Denoiser(depth=4, width=8)
    vd = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert infer_family_dims(vd["params"], "denoise") == (4, 8)

    ld = LegacyDenoiser(depth=3, width=8, hidden=4)
    vl = ld.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert infer_family_dims(vl["params"], "denoise_legacy") == (3, 8)

    assert infer_family_dims({}, "fast") == (None, None)
    assert infer_family_dims({"head": {}}, "sr") == (None, None)


def test_tanh_commutes_with_shuffle():
    """The born-folded tail relies on tanh-before-shuffle == shuffle-after:
    check the deployed graph against an explicit post-shuffle tanh."""
    from image_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 12)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(pixel_shuffle(jnp.tanh(x), 2)),
        np.asarray(jnp.tanh(pixel_shuffle(x, 2))),
    )


def test_deploy_roundtrip(tmp_path):
    """checkpoint -> build_deployed -> artifact -> load_artifact: identical
    uint8 outputs, and the spec records the fast family + width."""
    spec = DeploySpec(family="fast", depth=2, width=16, scale=2)
    model = spec.build_model(dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    ckpt = {"params": jax.device_get(v["params"]), "batch_stats": {},
            "meta": {"mean": [0.5, 0.5, 0.5], "std": [0.2, 0.2, 0.2]}}
    deployed, fused = build_deployed(ckpt, spec, use_ema=False,
                                     dtype=jnp.float32)
    assert not deployed.optimized  # fast is born in the optimized form
    u8 = jnp.asarray(np.random.default_rng(2).integers(0, 255, (2, 8, 8, 3),
                                                       dtype=np.uint8))
    out = np.asarray(deployed(u8))
    assert out.shape == (2, 16, 16, 3) and out.dtype == np.uint8

    save_artifact(tmp_path / "fast.isr", deployed.spec, fused)
    reloaded = load_artifact(tmp_path / "fast.isr", dtype=jnp.float32)
    assert reloaded.spec.family == "fast"
    assert reloaded.spec.width == 16
    assert reloaded.spec.mean == (0.5, 0.5, 0.5)
    # fp16 artifact storage quantizes params: reload-vs-original stays within
    # a couple of uint8 LSBs, and a second load is bit-identical to the first.
    re_out = np.asarray(reloaded(u8))
    assert np.max(np.abs(re_out.astype(int) - out.astype(int))) <= 2
    again = load_artifact(tmp_path / "fast.isr", dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(again(u8)), re_out)


def test_remat_gradients_match():
    """remat recomputes the forward instead of storing it; XLA may fuse the
    recompute differently, so equality is up to float reassociation."""
    m = FastSRGenerator(depth=2, width=8, scale=2, dtype=jnp.float32)
    mr = FastSRGenerator(depth=2, width=8, scale=2, remat=True,
                         dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 8, 8, 3)),
                    jnp.float32)

    def loss(params, model):
        return jnp.mean(model.apply({"params": params}, x) ** 2)

    g1 = jax.grad(loss)(v["params"], m)
    g2 = jax.grad(loss)(v["params"], mr)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        g1, g2,
    )


def test_ema_and_warm_start_compatible():
    """The generic train-state machinery (EMA, GAN warm start via
    checkpoint intersection) works on the fast param tree unchanged."""
    from image_super_resolution_tpu.train import (
        build_optimizer,
        create_train_state,
        resume_state,
    )
    from image_super_resolution_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    import tempfile
    from pathlib import Path

    m = FastSRGenerator(depth=1, width=8, scale=2)
    state = create_train_state(m, (1, 8, 8, 3), build_optimizer(total_steps=4),
                               jax.random.PRNGKey(0), ema_tau=4.0)
    assert state.ema is not None
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "res_f_1_0.2.ckpt"
        save_checkpoint(p, state, epoch=0, mean=[0.5] * 3, std=[0.2] * 3,
                        loss_history=[1.0], final=False)
        fresh = create_train_state(m, (1, 8, 8, 3),
                                   build_optimizer(total_steps=4),
                                   jax.random.PRNGKey(1), ema_tau=4.0)
        resumed, start_epoch = resume_state(fresh, load_checkpoint(p),
                                            verbose=False)
        assert start_epoch == 1
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3),
            jax.device_get(resumed.params), jax.device_get(state.params),
        )


# --------------------------------------------------------- denoise_fast ----


def test_fast_denoiser_preset_param_count():
    from image_super_resolution_tpu.models import FastDenoiser

    m = FastDenoiser()  # depth 14, width 128, downshuffle 2, x1
    v = jax.eval_shape(m.init, jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(v))
    # head 12->128 (13,952) + 14 blocks x 2 convs 128->128 (4,132,352)
    # + trunk_conv (147,584) + tail 128->12 (13,836)
    assert n == 4_307_724


@pytest.mark.parametrize("hw", [(8, 8), (7, 9), (1, 5)])
def test_fast_denoiser_same_size_any_shape(hw):
    """x1 output at the INPUT size for any H/W — the sub-pixel front
    edge-pads to a multiple of downshuffle and the tail crops back, so
    tiling/video never has to care about divisibility."""
    from image_super_resolution_tpu.models import FastDenoiser

    m = FastDenoiser(depth=2, width=16, downshuffle=2, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, *hw, 3)),
                    jnp.float32)
    y = m.apply(v, x)
    assert y.shape == (2, *hw, 3)
    assert y.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_fast_denoiser_internal_pad_equals_explicit_pad_and_crop():
    """The module's odd-size handling IS edge-pad + crop: running the model
    on a hand-edge-padded divisible input and cropping gives bit-identical
    output to feeding the odd input directly."""
    from image_super_resolution_tpu.models import FastDenoiser

    m = FastDenoiser(depth=1, width=8, downshuffle=2, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    x = np.random.default_rng(1).normal(size=(1, 5, 7, 3)).astype(np.float32)
    direct = np.asarray(m.apply(v, jnp.asarray(x)))
    padded = np.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    via_pad = np.asarray(m.apply(v, jnp.asarray(padded)))[:, :5, :7, :]
    np.testing.assert_array_equal(direct, via_pad)


def test_fast_denoiser_downshuffle_grid_sensitivity_documented():
    """The space_to_depth grid is anchored at the image origin: shifting
    the input by one pixel does NOT commute (this is WHY rs.py forbids
    spatial band sharding for downshuffle>1 artifacts)."""
    from image_super_resolution_tpu.models import FastDenoiser

    m = FastDenoiser(depth=1, width=8, downshuffle=2, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    x = np.random.default_rng(2).normal(size=(1, 9, 8, 3)).astype(np.float32)
    full = np.asarray(m.apply(v, jnp.asarray(x)))[:, 1:]
    shifted = np.asarray(m.apply(v, jnp.asarray(x[:, 1:])))
    assert not np.array_equal(full, shifted)


def test_denoise_fast_deploy_roundtrip(tmp_path):
    """denoise_fast artifact: spec records family + downshuffle, deployed
    model is uint8 x1, and the artifact round-trips."""
    spec = DeploySpec(family="denoise_fast", depth=2, width=16, downshuffle=2)
    assert spec.output_scale == 1
    model = spec.build_model(dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    deployed = DeployedModel(spec, v["params"], dtype=jnp.float32)
    assert not deployed.optimized
    u8 = jnp.asarray(np.random.default_rng(3).integers(
        0, 255, (2, 9, 11, 3), dtype=np.uint8))
    out = np.asarray(deployed(u8))
    assert out.shape == (2, 9, 11, 3) and out.dtype == np.uint8

    save_artifact(tmp_path / "dn.isr", spec, v["params"])
    reloaded = load_artifact(tmp_path / "dn.isr", dtype=jnp.float32)
    assert reloaded.spec.family == "denoise_fast"
    assert reloaded.spec.downshuffle == 2
    re_out = np.asarray(reloaded(u8))
    assert np.max(np.abs(re_out.astype(int) - out.astype(int))) <= 2


def test_denoise_fast_family_helpers():
    from image_super_resolution_tpu.models import FastDenoiser
    from image_super_resolution_tpu.models.deploy import (
        infer_downshuffle,
        infer_family_dims,
    )

    assert family_defaults("denoise_fast") == (14, 128)
    m = FastDenoiser(depth=3, width=16, downshuffle=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert infer_family_dims(v["params"], "denoise_fast") == (3, 16)
    assert infer_downshuffle(v["params"]) == 2
    # the SR flagship's head sees 3 channels -> f=1
    sr = FastSRGenerator(depth=1, width=8, scale=2)
    vs = sr.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert infer_downshuffle(vs["params"]) == 1
    assert infer_downshuffle({}) is None
    # old artifacts (no downshuffle key in the spec JSON) default to 1
    import dataclasses
    import json

    d = {k: v for k, v in dataclasses.asdict(
        DeploySpec(family="fast")).items() if k != "downshuffle"}
    spec = DeploySpec(**json.loads(json.dumps(d)))
    assert spec.downshuffle == 1


# ----------------------------------------------------- refinement tail ----


@pytest.mark.parametrize("scale,downshuffle", [(1, 2), (2, 1), (4, 1)])
def test_refine_forward_shape_and_range(scale, downshuffle):
    """refine_blocks > 0 swaps the born-folded tail for full-res refinement
    blocks; the IO contract (shape, dtype, tanh range) is unchanged."""
    m = FastSRGenerator(depth=1, width=16, scale=scale,
                        downshuffle=downshuffle, refine_blocks=2,
                        refine_width=8, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)),
                    jnp.float32)
    y = m.apply(v, x)
    assert y.shape == (2, 8 * scale, 8 * scale, 3)
    assert y.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_refine_param_fingerprint():
    """infer_refine reads (blocks, width) back out of the param tree — the
    export CLI's flag-less path — and answers the spec defaults (0, 32) for
    refine-less trees."""
    from image_super_resolution_tpu.models.deploy import infer_refine

    m = FastSRGenerator(depth=1, width=16, scale=1, downshuffle=2,
                        refine_blocks=3, refine_width=8)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert infer_refine(v["params"]) == (3, 8)

    plain = FastSRGenerator(depth=1, width=16, scale=2)
    vp = plain.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert infer_refine(vp["params"]) == (0, 32)
    assert infer_refine({}) == (0, 32)


def test_refine_denoiser_same_size_any_shape():
    """x1 refine-tail denoiser keeps the any-shape contract: the front
    edge-pad is cropped back AFTER the full-res refinement stage."""
    from image_super_resolution_tpu.models import FastDenoiser

    m = FastDenoiser(depth=1, width=16, downshuffle=2, refine_blocks=2,
                     refine_width=8, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 7, 9, 3)),
                    jnp.float32)
    y = m.apply(v, x)
    assert y.shape == (1, 7, 9, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_refine_deploy_roundtrip(tmp_path):
    """Artifact lifecycle with a refinement tail: spec carries the refine
    fields, export-CLI inference fingerprints them, and old spec JSONs
    (no refine keys) deserialize to the born-folded defaults."""
    spec = DeploySpec(family="denoise_fast", depth=2, width=16, downshuffle=2,
                      refine_blocks=2, refine_width=8)
    model = spec.build_model(dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    deployed = DeployedModel(spec, v["params"], dtype=jnp.float32)
    u8 = jnp.asarray(np.random.default_rng(3).integers(
        0, 255, (2, 9, 11, 3), dtype=np.uint8))
    out = np.asarray(deployed(u8))
    assert out.shape == (2, 9, 11, 3) and out.dtype == np.uint8

    save_artifact(tmp_path / "rf.isr", spec, v["params"])
    reloaded = load_artifact(tmp_path / "rf.isr", dtype=jnp.float32)
    assert reloaded.spec.refine_blocks == 2
    assert reloaded.spec.refine_width == 8
    re_out = np.asarray(reloaded(u8))
    assert np.max(np.abs(re_out.astype(int) - out.astype(int))) <= 2

    import dataclasses
    import json

    d = {k: v for k, v in dataclasses.asdict(spec).items()
         if not k.startswith("refine")}
    old = DeploySpec(**json.loads(json.dumps(d)))
    assert old.refine_blocks == 0 and old.refine_width == 32


def test_refine_cli_flag_guards():
    """--refine_blocks is a fast-family-only lever and must be >= 0."""
    from image_super_resolution_tpu.cli.train import build_parser, run_training

    parser = build_parser()
    opt = parser.parse_args(["--resnet", "--refine_blocks", "2"])
    with pytest.raises(SystemExit, match="fast family"):
        run_training(opt)
    opt = parser.parse_args(["--resnet", "--family", "fast",
                             "--refine_blocks", "-1"])
    with pytest.raises(SystemExit, match=">= 0"):
        run_training(opt)


def test_flop_budget_vs_reference():
    """The design claim behind the family: <=0.55 MFLOP per output pixel at
    the flagship preset — ~3x less than the reference topology's 1.57
    (PERF.md). Counted analytically from the architecture."""

    def conv_flops(k, cin, cout):
        return 2 * k * k * cin * cout  # per pixel at the conv's resolution

    w, d, scale = 128, 14, 4
    per_lr_px = (
        conv_flops(3, 3, w)
        + d * 2 * conv_flops(3, w, w)
        + conv_flops(3, w, w)  # trunk_conv
        + conv_flops(3, w, 3 * scale * scale)  # born-folded tail
    )
    per_out_px = per_lr_px / scale**2
    assert per_out_px <= 0.55e6, per_out_px
    # reference topology for comparison (48 RDBs etc.) is 1.57e6 (PERF.md)
    assert per_out_px < 1.57e6 / 2.5
