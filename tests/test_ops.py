"""Ops-layer tests: pixel shuffle vs torch, conv autopad, BN fusion parity,
transforms round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_super_resolution_tpu.data import transforms as T
from image_super_resolution_tpu.models import Denoiser, SRGenerator
from image_super_resolution_tpu.ops import (
    ConvBlock,
    fuse_conv_bn,
    pixel_shuffle,
    pixel_unshuffle,
)
from image_super_resolution_tpu.utils.general import ground_up, intersect_trees


def test_pixel_shuffle_matches_torch():
    import torch

    x = np.random.default_rng(0).standard_normal((2, 16, 5, 7)).astype(np.float32)
    want = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()  # NCHW
    got = pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)  # NHWC
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-6)


def test_pixel_shuffle_roundtrip():
    x = jnp.arange(2 * 4 * 6 * 12, dtype=jnp.float32).reshape(2, 4, 6, 12)
    assert jnp.array_equal(pixel_unshuffle(pixel_shuffle(x, 2), 2), x)


@pytest.mark.parametrize("kernel,stride", [(3, 1), (9, 1), (3, 2)])
def test_conv_same_padding_shapes(kernel, stride):
    m = ConvBlock(8, kernel, stride=stride, use_bn=False, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    out = m.apply(v, jnp.zeros((1, 16, 16, 3)))
    assert out.shape == (1, 16 // stride, 16 // stride, 8)


def test_conv_matches_torch_conv2d():
    """Cross-check the NHWC conv against torch's NCHW conv with same weights."""
    import torch

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 10, 10)).astype(np.float32)
    w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)  # OIHW
    b = rng.standard_normal((8,)).astype(np.float32)
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), padding=1
    ).numpy()

    m = ConvBlock(8, 3, use_bn=False, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 10, 3)))
    v = {"params": {"conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                             "bias": jnp.asarray(b)}}}
    got = m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("channelwise", [False, True])
def test_prelu_matches_torch(channelwise):
    """PReLU forward + alpha-gradient parity vs torch nn.PReLU."""
    import torch

    from image_super_resolution_tpu.ops.activations import PReLU

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 5, 8)).astype(np.float32)
    alpha = rng.uniform(-0.5, 0.5, (8 if channelwise else 1,)).astype(np.float32)

    t = torch.nn.PReLU(8 if channelwise else 1)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(alpha))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    out_t = t(xt)
    out_t.sum().backward()

    m = PReLU(channelwise=channelwise)
    variables = {"params": {"alpha": jnp.asarray(alpha)}}
    got = m.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), out_t.detach().numpy(), rtol=1e-6
    )

    grad = jax.grad(lambda v: m.apply(v, jnp.asarray(x)).sum())(variables)
    np.testing.assert_allclose(
        np.asarray(grad["params"]["alpha"]), t.weight.grad.numpy(),
        rtol=1e-4, atol=1e-4,
    )


def test_conv_prelu_channel_fix():
    """ConvBlock with a prelu spec: shared slope for "prelu", one slope per
    OUT channel for ("prelu", n>1) — the reference Conv's channel-fix
    (utils/models.py:92-94)."""
    m = ConvBlock(8, 3, act="prelu", use_bn=False, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 3)))
    assert v["params"]["prelu"]["alpha"].shape == (1,)
    assert float(v["params"]["prelu"]["alpha"][0]) == 0.25

    m2 = ConvBlock(8, 3, act=("prelu", 2), use_bn=False, dtype=jnp.float32)
    v2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 3)))
    assert v2["params"]["prelu"]["alpha"].shape == (8,)
    out = m2.apply(v2, np.random.default_rng(0).standard_normal((1, 6, 6, 3)))
    assert out.shape == (1, 6, 6, 8)


def test_act_list_breadth_matches_torch():
    """Every non-learnable reference ACT_LIST entry (utils/general.py:10-12)
    has a spec; values match the torch modules."""
    import torch

    from image_super_resolution_tpu.ops.activations import apply_act

    x = np.linspace(-4, 4, 41, dtype=np.float32).reshape(1, 41)
    pairs = {
        ("leaky_relu", 0.2): torch.nn.LeakyReLU(0.2),
        "relu": torch.nn.ReLU(),
        "relu6": torch.nn.ReLU6(),
        "hardswish": torch.nn.Hardswish(),
        "silu": torch.nn.SiLU(),
        "tanh": torch.nn.Tanh(),
        "sigmoid": torch.nn.Sigmoid(),
        ("elu", None): torch.nn.ELU(),
        "softmax": torch.nn.Softmax(dim=-1),
        "hardsigmoid": torch.nn.Hardsigmoid(),
        "gelu": torch.nn.GELU(),
        "softsign": torch.nn.Softsign(),
        "softplus": torch.nn.Softplus(),
    }
    for spec, mod in pairs.items():
        want = mod(torch.from_numpy(x)).numpy()
        got = np.asarray(apply_act(jnp.asarray(x), spec))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6, err_msg=str(spec))


@pytest.mark.parametrize("model_ctor,shape", [
    (lambda: SRGenerator(depth=2, scale=2, dtype=jnp.float32), (1, 16, 16, 3)),
    (lambda: Denoiser(depth=2, dtype=jnp.float32), (1, 16, 16, 3)),
])
def test_bn_fusion_numerical_parity(model_ctor, shape):
    """Fused (no-BN, biased) model == eval-mode BN model, after training steps
    have moved the running stats off their init."""
    model = model_ctor()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(shape))
    # Perturb running stats so fusion is non-trivial.
    x = jax.random.normal(jax.random.PRNGKey(1), (4,) + shape[1:]) * 2.0 + 0.5
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}

    fused_params = fuse_conv_bn(variables["params"], variables["batch_stats"])

    if isinstance(model, SRGenerator):
        fused_model = SRGenerator(depth=model.depth, scale=model.scale,
                                  fused=True, dtype=jnp.float32)
    else:
        fused_model = Denoiser(depth=model.depth, fused=True, dtype=jnp.float32)

    test_x = jax.random.normal(jax.random.PRNGKey(2), shape)
    want = model.apply(variables, test_x)
    got = fused_model.apply({"params": fused_params}, test_x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_transforms_roundtrip_and_contracts():
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8))
    n = T.normalize(u8)
    back = T.denormalize(n)
    np.testing.assert_allclose(np.asarray(back), np.asarray(u8, dtype=np.float32),
                               atol=1e-3)
    t = T.to_tanh(u8)
    assert float(t.min()) >= -1.0 and float(t.max()) <= 1.0
    u8b = T.tanh_to_uint8(t)
    np.testing.assert_array_equal(np.asarray(u8b), np.asarray(u8))


def test_tanh_to_uint8_matches_torch_round():
    import torch

    base = np.linspace(-1, 1, 511, dtype=np.float32)
    got = np.asarray(T.tanh_to_uint8(jnp.asarray(base)))
    xt = torch.from_numpy(base)
    want = ((xt + 1) / 2 * 255).round().to(torch.uint8).numpy()
    np.testing.assert_array_equal(got, want)


def test_tanh_to_norm_matches_reference_dance():
    """tanh -> [0,1] -> (x-mean)/std must equal the train.py:96-97 sequence."""
    x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (1, 4, 4, 3)), jnp.float32)
    got = T.tanh_to_norm(x)
    manual = ((x + 1.0) / 2.0 - jnp.asarray(T.IMAGENET_MEAN)) / jnp.asarray(T.IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(got), np.asarray(manual), rtol=1e-6)


def test_ground_up():
    assert ground_up(96, 4) == 96
    assert ground_up(97, 4) == 100
    assert ground_up(1, 3) == 3


def test_intersect_trees_partial_load():
    src = {"a": {"k": np.zeros((2, 2))}, "b": {"k": np.ones((3,))}}
    tgt = {"a": {"k": np.full((2, 2), 7.0)}, "b": {"k": np.zeros((4,))},
           "c": {"k": np.zeros(1)}}
    merged, matched, total = intersect_trees(src, tgt)
    assert matched == 1 and total == 3
    np.testing.assert_array_equal(merged["a"]["k"], np.zeros((2, 2)))
    np.testing.assert_array_equal(merged["b"]["k"], np.zeros((4,)))  # shape mismatch kept


def test_decode_prediction_autodetect():
    tanh = jnp.asarray([[-1.0, 0.0, 1.0]])
    np.testing.assert_array_equal(
        np.asarray(T.decode_prediction(tanh)), [[0.0, 128.0, 255.0]]  # 127.5 -> 128 (half-even)
    )
    unit = jnp.asarray([[0.0, 0.5, 1.0]])
    np.testing.assert_array_equal(
        np.asarray(T.decode_prediction(unit)), [[0.0, 128.0, 255.0]]
    )


def test_color_jitter_applies_probabilistically():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.2, 0.8, (8, 8, 8, 3)).astype(np.float32))
    out_never = T.color_jitter(jax.random.PRNGKey(0), x, p=0.0)
    np.testing.assert_array_equal(np.asarray(out_never), np.asarray(x))
    out_always = T.color_jitter(jax.random.PRNGKey(0), x, p=1.0)
    assert not np.allclose(np.asarray(out_always), np.asarray(x))
    assert float(out_always.min()) >= 0.0 and float(out_always.max()) <= 1.0


def test_to_pil_images():
    x = jnp.zeros((2, 4, 4, 3)) - 1.0
    imgs = T.to_pil_images(x)
    assert len(imgs) == 2 and imgs[0].size == (4, 4)


def test_convert_image_to_png(tmp_path):
    from PIL import Image

    from image_super_resolution_tpu.data.manifest import convert_image_to_png

    src = tmp_path / "a.webp"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(src)
    out = convert_image_to_png(src)
    assert out.suffix == ".png" and out.exists()
    assert src.exists(), "must not delete the original by default"
