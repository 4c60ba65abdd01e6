"""Golden param-count and shape tests for the model zoo.

The golden numbers are measured from the reference implementation
(SURVEY.md §2.4): instantiating utils/models.py classes and counting
``parameters()``. Any drift means the rebuild's architecture diverged.
"""

import jax
import jax.numpy as jnp
import pytest

from image_super_resolution_tpu.models import (
    Denoiser,
    Discriminator,
    SRGenerator,
    TruncatedVGG19,
)


def n_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def init_model(model, shape):
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(shape, jnp.float32))
    return variables


@pytest.mark.parametrize(
    "kwargs,golden",
    [
        (dict(depth=16, add_rate=0.2, scale=2), 11_735_875),
        (dict(depth=16, add_rate=0.2, scale=4), 11_883_587),
        (dict(depth=16, add_rate=0.2, scale=2, enchant=True), 11_726_595),
    ],
)
def test_generator_param_counts(kwargs, golden):
    variables = init_model(SRGenerator(**kwargs), (1, 24, 24, 3))
    assert n_params(variables["params"]) == golden


def test_discriminator_param_count():
    variables = init_model(Discriminator(), (1, 96, 96, 3))
    assert n_params(variables["params"]) == 23_563_649


def test_denoiser_param_count():
    variables = init_model(Denoiser(depth=16), (1, 64, 64, 3))
    assert n_params(variables["params"]) == 3_760_963


@pytest.mark.parametrize("scale", [2, 4])
def test_generator_output_shape_and_range(scale):
    model = SRGenerator(depth=2, scale=scale)
    variables = init_model(model, (2, 24, 24, 3))
    out = model.apply(variables, jnp.zeros((2, 24, 24, 3)))
    assert out.shape == (2, 24 * scale, 24 * scale, 3)
    assert out.dtype == jnp.float32
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 24, 3))
    out = model.apply(variables, x)
    assert jnp.all(out >= -1.0) and jnp.all(out <= 1.0)  # tanh tail


def test_denoiser_same_size():
    model = Denoiser(depth=4)
    variables = init_model(model, (1, 64, 64, 3))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 3)


def test_discriminator_logit_shape_any_input_size():
    model = Discriminator()
    variables = init_model(model, (1, 96, 96, 3))
    for hw in (96, 128):
        out = model.apply(variables, jnp.zeros((3, hw, hw, 3)))
        assert out.shape == (3, 1)


def test_generator_train_mode_updates_batch_stats():
    model = SRGenerator(depth=1, scale=2)
    variables = init_model(model, (1, 16, 16, 3))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 32, 32, 3)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not jnp.allclose(a, b) for a, b in zip(old, new)
    ), "train=True must update running stats"


def test_enchant_has_no_batch_stats():
    model = SRGenerator(depth=1, scale=2, enchant=True)
    variables = init_model(model, (1, 16, 16, 3))
    assert "batch_stats" not in variables


def test_vgg_truncation_shapes():
    # (i=5, j=4): 4 pools before the kept conv -> /16 spatial, 512 channels.
    model = TruncatedVGG19(i=5, j=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    out = model.apply(variables, jnp.zeros((2, 96, 96, 3)))
    assert out.shape == (2, 6, 6, 512)
    # pre-act variant shares shapes but not values
    model_pre = TruncatedVGG19(i=5, j=4, before_act=True)
    out_pre = model_pre.apply(variables, jnp.ones((1, 96, 96, 3)))
    assert out_pre.shape == (1, 6, 6, 512)
    assert jnp.any(out_pre < 0)  # pre-activation features can be negative


def test_perceptual_feature_norm_calibrates_content_magnitude():
    """Random-VGG fallback: with feature_norm, loss/content is the RELATIVE
    feature error (O(0.01-1) for plausible SR outputs), not an arbitrary
    He-init-dependent scale (VERDICT round-1 next #6)."""
    import jax

    from image_super_resolution_tpu.losses.perceptual import PerceptualLoss
    from image_super_resolution_tpu.models.vgg import TruncatedVGG19, init_vgg_params

    vgg = TruncatedVGG19(i=2, j=1, dtype=jnp.float32)
    with pytest.warns(UserWarning):
        params, loaded = init_vgg_params(vgg, with_status=True)
    assert not loaded

    import numpy as np

    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    sr = hr + 0.05 * jnp.asarray(rng.standard_normal(hr.shape), jnp.float32)
    logits = jnp.zeros((2, 1))

    plain = PerceptualLoss(params, vgg_i=2, vgg_j=1, dtype=jnp.float32)
    calib = PerceptualLoss(params, vgg_i=2, vgg_j=1, feature_norm=True,
                           dtype=jnp.float32)
    _, _, c_plain = plain(sr, hr, logits)
    _, _, c_calib = calib(sr, hr, logits)
    # Calibrated content == plain content / mean(hr_feat^2) for the MSE flavor.
    feats = calib.features(hr)
    expect = float(c_plain) / float(jnp.mean(jnp.square(feats)) + 1e-6)
    assert float(c_calib) == pytest.approx(expect, rel=1e-3)
    assert 1e-4 < float(c_calib) < 10.0  # meaningful magnitude
    # Gradients still flow through sr.
    g = jax.grad(lambda s: calib(s, hr, logits)[0])(sr)
    assert float(jnp.max(jnp.abs(g))) > 0


def test_vgg_pth_auto_convert(tmp_path):
    """--vgg_weights with a raw torchvision .pth: auto-converted to a cached
    npz and loaded (users with torchvision VGG19 weights need zero manual
    steps for reference-parity perceptual loss)."""
    import numpy as np
    import torch

    from image_super_resolution_tpu.models.vgg import (
        TruncatedVGG19,
        init_vgg_params,
    )

    rng = np.random.default_rng(0)
    sd = {}
    for idx, (cin, cout) in zip((0, 2, 5), ((3, 64), (64, 64), (64, 128))):
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
        )
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            rng.standard_normal((cout,)).astype(np.float32)
        )
    pth = tmp_path / "vgg19.pth"
    torch.save(sd, pth)

    model = TruncatedVGG19(i=2, j=1)
    params, loaded = init_vgg_params(model, pth, with_status=True)
    assert loaded
    assert (tmp_path / "vgg19.pth.npz").exists()  # cached conversion
    np.testing.assert_allclose(
        np.asarray(params["conv0"]["kernel"]),
        np.transpose(sd["features.0.weight"].numpy(), (2, 3, 1, 0)),
    )
    # second load hits the cache (no re-conversion needed to succeed)
    params2, loaded2 = init_vgg_params(model, pth, with_status=True)
    assert loaded2
    np.testing.assert_allclose(
        np.asarray(params2["conv2"]["kernel"]),
        np.transpose(sd["features.5.weight"].numpy(), (2, 3, 1, 0)),
    )


@pytest.mark.parametrize("i,j,before_act", [(5, 4, False), (5, 4, True), (3, 2, False)])
def test_vgg_pth_feature_parity_vs_torch(tmp_path, i, j, before_act):
    """The exact path a user with real ImageNet weights takes — a
    torchvision-layout vgg19 .pth through init_vgg_params — produces the
    same truncated features torch produces from the SAME .pth (reference
    TruncatedVGG19, utils/models.py:454-510). Weights are random-but-saved
    (He-scaled so 16 ReLU convs don't overflow); parity here proves the
    converter + layout + truncation are bit-correct for any weights,
    ImageNet's included."""
    import numpy as np
    import torch
    import torch.nn as tnn

    from image_super_resolution_tpu.models.vgg import (
        TruncatedVGG19,
        init_vgg_params,
    )

    # torchvision vgg19().features layout: convs at indices
    # 0,2,5,7,10,12,14,16,19,21,23,25,28,30,32,34; pools at 4,9,18,27,36.
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(cin, v, 3, padding=1), tnn.ReLU()]
            cin = v
    features = tnn.Sequential(*layers)

    rng = np.random.default_rng(7)
    sd = {}
    for idx, mod in enumerate(features):
        if isinstance(mod, tnn.Conv2d):
            co, ci = mod.out_channels, mod.in_channels
            sd[f"{idx}.weight"] = torch.from_numpy(
                (rng.standard_normal((co, ci, 3, 3)) * np.sqrt(2.0 / (ci * 9)))
                .astype(np.float32))
            sd[f"{idx}.bias"] = torch.from_numpy(
                (0.01 * rng.standard_normal((co,))).astype(np.float32))
    features.load_state_dict(sd, strict=True)
    pth = tmp_path / "vgg19.pth"
    torch.save({f"features.{k}": v for k, v in sd.items()}, pth)

    # torch truncation exactly as the reference scans it
    convs = pools = 0
    trunc = None
    for idx, mod in enumerate(features):
        if isinstance(mod, tnn.MaxPool2d):
            pools += 1
            convs = 0
        elif isinstance(mod, tnn.Conv2d):
            convs += 1
        if pools == i - 1 and convs == j and isinstance(mod, tnn.Conv2d):
            trunc = idx + (1 if before_act else 2)  # keep conv [, relu]
            break
    truncated = features[:trunc]

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = truncated(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = TruncatedVGG19(i=i, j=j, before_act=before_act, dtype=jnp.float32)
    params, loaded = init_vgg_params(model, pth, with_status=True)
    assert loaded
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(
        got.transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-4 * np.abs(want).max()
    )
