"""Interop: reference PyTorch artifacts load into the flax models and match
numerically — the only available proof of architecture parity with REAL
weights in this offline environment (VERDICT round-1 next #4).

Two evidence tiers:
- the bundled ``/root/reference/model.pt`` (a genuinely TRAINED denoiser) must
  reproduce through the native uint8->uint8 deployment path within 1 LSB;
- the live reference classes (ResNet / EResNet / Discriminator / Denoise),
  instantiated with random weights, must match the flax twins' forward pass
  after state-dict import (torchvision & co. are stubbed out: the reference
  only needs them for VGG/datasets, not for these nets).
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = Path("/root/reference")
needs_ref = pytest.mark.skipif(not REF.exists(), reason="no reference checkout")


@pytest.fixture(scope="module")
def ref_models():
    """Import the reference utils.models with its heavy deps stubbed."""
    if not REF.exists():
        pytest.skip("no reference checkout")
    saved_path = list(sys.path)
    saved_utils = {k: v for k, v in sys.modules.items() if k.split(".")[0] == "utils"}
    for k in saved_utils:
        del sys.modules[k]
    sys.path.insert(0, str(REF))
    # torchvision / utils.datasets are only needed for TruncatedVGG19 and the
    # transform Modules — not for the nets under test.
    stub_tv = types.ModuleType("torchvision")
    fake_ds = types.ModuleType("utils.datasets")
    fake_ds.Normalize = type("Normalize", (torch.nn.Module,), {})
    injected = {}
    for name, mod in (("torchvision", stub_tv), ("utils.datasets", fake_ds)):
        if name not in sys.modules:
            sys.modules[name] = mod
            injected[name] = mod
    try:
        import utils.models as ref_models_mod

        yield ref_models_mod
    finally:
        sys.path[:] = saved_path
        for k in [k for k in sys.modules if k.split(".")[0] == "utils"]:
            del sys.modules[k]
        sys.modules.update(saved_utils)
        for name in injected:
            sys.modules.pop(name, None)


def _torch_forward(net, x_nhwc: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        y = net(torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2).copy()))
    return y.numpy().transpose(0, 2, 3, 1)


def _sd(net) -> dict:
    # .copy() matters: .numpy() on an fp32 tensor SHARES its memory, so a
    # later in-place optimizer step would silently mutate the captured
    # state dict (the trajectory co-run tests train the torch net after
    # capturing it).
    return {
        k: v.detach().float().numpy().copy() if v.dtype.is_floating_point
        else v.detach().numpy().copy()
        for k, v in net.state_dict().items()
    }


# ------------------------------------------------------- bundled model.pt --

@needs_ref
def test_bundled_model_pt_uint8_parity():
    """The reference's shipped TRAINED artifact reproduces within 1 LSB."""
    from image_super_resolution_tpu.interop import import_torchscript_artifact

    deployed, spec, params = import_torchscript_artifact(
        REF / "model.pt", dtype=jnp.float32
    )
    assert spec.family == "denoise_legacy"
    assert (spec.depth, spec.width, spec.hidden) == (8, 64, 32)
    assert spec.mean == pytest.approx((0.485, 0.456, 0.406), abs=1e-6)

    m = torch.jit.load(str(REF / "model.pt"), map_location="cpu")
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (2, 48, 48, 3), dtype=np.uint8)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    want = want.transpose(0, 2, 3, 1)
    got = np.asarray(deployed(x))
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert int(diff.max()) <= 1
    assert float((diff > 0).mean()) < 0.01  # only borderline-rounding pixels


@needs_ref
def test_import_torch_cli_roundtrip(tmp_path):
    """model.pt -> import CLI -> .isr -> rs.py tiled inference end to end."""
    from PIL import Image

    from image_super_resolution_tpu.cli.import_torch import main as import_main
    from image_super_resolution_tpu.cli.rs import main as rs_main

    artifact = tmp_path / "legacy.isr"
    import_main(["--src", str(REF / "model.pt"), "--out", str(artifact)])
    assert artifact.exists()

    rng = np.random.default_rng(1)
    src = tmp_path / "in.png"
    Image.fromarray(rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)).save(src)
    rs_main([
        "--model", str(artifact), "--src", str(src),
        "--save_dir", str(tmp_path / "out.png"),
        "--window_size", "48", "--overlap", "8", "--batch_size", "2",
    ])
    assert Image.open(tmp_path / "out.png").size == (80, 80)  # x1 denoiser


# --------------------------------------------------- live reference classes --

@needs_ref
def test_reference_resnet_imports_and_matches(ref_models):
    from image_super_resolution_tpu.interop import import_generator_state
    from image_super_resolution_tpu.models import SRGenerator

    tnet = ref_models.ResNet(2, 0.2, 2).eval()
    params, stats, cfg = import_generator_state(_sd(tnet))
    assert cfg["depth"] == 2 and cfg["scale"] == 2 and not cfg["enchant"]

    model = SRGenerator(depth=2, add_rate=0.2, scale=2, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    want = _torch_forward(tnet, x)
    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@needs_ref
def test_reference_eresnet_imports_and_matches(ref_models):
    from image_super_resolution_tpu.interop import import_generator_state
    from image_super_resolution_tpu.models import SRGenerator

    tnet = ref_models.EResNet(1, 0.2, 4).eval()
    params, stats, cfg = import_generator_state(_sd(tnet))
    assert cfg["enchant"] and cfg["scale"] == 4 and not stats

    model = SRGenerator(depth=1, add_rate=0.2, scale=4, enchant=True,
                        dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 12, 12, 3)).astype(np.float32)
    want = _torch_forward(tnet, x)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == (1, 48, 48, 3)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@needs_ref
def test_reference_srgan_prefix_imports(ref_models):
    """gen_*.pt checkpoints wrap the generator as SRGAN.res_net."""
    from image_super_resolution_tpu.interop import import_generator_state
    from image_super_resolution_tpu.models import SRGenerator

    tnet = ref_models.SRGAN(1, 0.2, enchant=True, scaleRate=2).eval()
    params, stats, cfg = import_generator_state(_sd(tnet), prefix="res_net.")
    model = SRGenerator(depth=1, add_rate=0.2, scale=2, enchant=True,
                        dtype=jnp.float32)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 12, 12, 3)).astype(np.float32)
    want = _torch_forward(tnet, x)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@needs_ref
def test_reference_discriminator_imports_and_matches(ref_models):
    from image_super_resolution_tpu.interop import import_discriminator_state
    from image_super_resolution_tpu.models import Discriminator

    tnet = ref_models.Discriminator(3, 8, 4, 16).eval()
    params, stats = import_discriminator_state(_sd(tnet))
    model = Discriminator(3, 8, 4, 16, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@needs_ref
def test_reference_denoise_imports_and_matches(ref_models):
    from image_super_resolution_tpu.interop import import_denoiser_state
    from image_super_resolution_tpu.models import Denoiser

    tnet = ref_models.Denoise(4).eval()
    params, stats, cfg = import_denoiser_state(_sd(tnet))
    assert cfg["depth"] == 4 and not cfg["fused"]
    model = Denoiser(depth=4, dtype=jnp.float32, fused=False)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    want = _torch_forward(tnet, x)
    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


# ------------------------------------------------------- export direction --

def test_export_generator_state_roundtrip():
    """export_generator_state is the exact inverse of import_generator_state."""
    from image_super_resolution_tpu.interop import (
        export_generator_state,
        import_generator_state,
    )
    from image_super_resolution_tpu.models import SRGenerator

    model = SRGenerator(depth=2, add_rate=0.2, scale=2, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))

    sd = export_generator_state(params, stats)
    p2, s2, cfg = import_generator_state(
        {k: np.asarray(v) for k, v in sd.items()}
    )
    assert cfg["depth"] == 2 and cfg["scale"] == 2

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(p2)
    assert len(flat1) == len(flat2)
    for (k1, v1), (k2, v2) in zip(flat1, flat2):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    for (k1, v1), (k2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(stats),
        jax.tree_util.tree_leaves_with_path(s2),
    ):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


@needs_ref
def test_exported_state_dict_loads_into_live_reference(ref_models):
    """The exported dict loads strict=True into the reference's ResNet and
    the torch forward matches the flax forward — migration BACK works."""
    from image_super_resolution_tpu.interop import export_generator_state
    from image_super_resolution_tpu.models import SRGenerator

    model = SRGenerator(depth=2, add_rate=0.2, scale=2, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 12, 12, 3)))
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))

    sd = export_generator_state(params, stats)
    tnet = ref_models.ResNet(2, 0.2, 2)
    missing, unexpected = tnet.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    tnet.eval()

    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    want = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )
    got = _torch_forward(tnet, x)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@needs_ref
def test_exported_discriminator_loads_into_live_reference(ref_models):
    from image_super_resolution_tpu.interop import export_discriminator_state
    from image_super_resolution_tpu.models import Discriminator

    model = Discriminator(channels=16, n_blocks=4, fc_size=32, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))

    sd = export_discriminator_state(params, stats)
    tnet = ref_models.Discriminator(3, 16, 4, 32)
    missing, unexpected = tnet.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    tnet.eval()

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 48, 48, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                    train=False)
    )
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               atol=1e-4, rtol=1e-4)


@needs_ref
def test_exported_denoiser_roundtrip_and_loads(ref_models):
    from image_super_resolution_tpu.interop import (
        export_denoiser_state,
        import_denoiser_state,
    )
    from image_super_resolution_tpu.models import Denoiser

    model = Denoiser(depth=4, width=64, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 16, 16, 3)))
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables.get("batch_stats", {}))

    sd = export_denoiser_state(params, stats)
    p2, s2, cfg = import_denoiser_state({k: np.asarray(v) for k, v in sd.items()})
    assert cfg["depth"] == 4 and cfg["width"] == 64
    for (k1, v1), (k2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(p2),
    ):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    tnet = ref_models.Denoise(4)
    missing, unexpected = tnet.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected


@needs_ref
def test_gradient_parity_with_reference_eresnet(ref_models):
    """One training-step's LOSS AND GRADIENTS match the live reference.

    Forward parity (above) cannot catch loss-reduction or normalization
    mismatches that only surface in backward; this runs the same MSE step on
    the same weights/batch in torch and JAX and compares every parameter's
    gradient through the export mapping (reference train.py:55-58 inner
    loop, pixel phase)."""
    from image_super_resolution_tpu.interop import (
        export_generator_state,
        import_generator_state,
    )
    from image_super_resolution_tpu.losses import mse_loss
    from image_super_resolution_tpu.models import SRGenerator

    torch.manual_seed(0)
    tnet = ref_models.EResNet(1, 0.2, 2).train()
    params, _, cfg = import_generator_state(_sd(tnet))
    model = SRGenerator(depth=1, add_rate=0.2, scale=2, enchant=True,
                        dtype=jnp.float32)

    rng = np.random.default_rng(11)
    lr = rng.standard_normal((2, 12, 12, 3)).astype(np.float32)
    hr = np.tanh(rng.standard_normal((2, 24, 24, 3))).astype(np.float32)

    # torch side
    t_lr = torch.from_numpy(lr.transpose(0, 3, 1, 2).copy())
    t_hr = torch.from_numpy(hr.transpose(0, 3, 1, 2).copy())
    t_loss = torch.nn.MSELoss()(tnet(t_lr), t_hr)
    t_loss.backward()
    t_grads = {k: p.grad.numpy() for k, p in tnet.named_parameters()}

    # jax side
    def loss_fn(p):
        return mse_loss(model.apply({"params": p}, jnp.asarray(lr)),
                        jnp.asarray(hr))

    j_loss, j_grads = jax.value_and_grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params)
    )
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=1e-5)

    # map the flax gradient TREE through the same exporter as the weights:
    # identical keys/layouts as torch's named_parameters
    sd_grads = export_generator_state(jax.device_get(j_grads), {})
    compared = 0
    for k, tg in t_grads.items():
        atol = 2e-3 * float(np.abs(tg).max()) + 1e-8
        np.testing.assert_allclose(
            sd_grads[k], tg, rtol=2e-3, atol=atol,
            err_msg=f"gradient mismatch at {k}",
        )
        compared += 1
    assert compared == len(t_grads) and compared > 10


@needs_ref
def test_gradient_parity_with_reference_resnet_bn(ref_models):
    """Same gradient-parity check for the BN variant: train-mode BatchNorm
    (batch statistics in forward AND backward) must differentiate
    identically across frameworks."""
    from image_super_resolution_tpu.interop import (
        export_generator_state,
        import_generator_state,
    )
    from image_super_resolution_tpu.losses import mse_loss
    from image_super_resolution_tpu.models import SRGenerator

    torch.manual_seed(0)
    tnet = ref_models.ResNet(1, 0.2, 2).train()
    params, stats, _ = import_generator_state(_sd(tnet))
    model = SRGenerator(depth=1, add_rate=0.2, scale=2, dtype=jnp.float32)

    rng = np.random.default_rng(13)
    lr = rng.standard_normal((4, 12, 12, 3)).astype(np.float32)
    hr = np.tanh(rng.standard_normal((4, 24, 24, 3))).astype(np.float32)

    t_lr = torch.from_numpy(lr.transpose(0, 3, 1, 2).copy())
    t_hr = torch.from_numpy(hr.transpose(0, 3, 1, 2).copy())
    t_loss = torch.nn.MSELoss()(tnet(t_lr), t_hr)
    t_loss.backward()
    t_grads = {k: p.grad.numpy() for k, p in tnet.named_parameters()}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, jnp.asarray(lr),
            train=True, mutable=["batch_stats"],
        )
        return mse_loss(out, jnp.asarray(hr))

    j_loss, j_grads = jax.value_and_grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params)
    )
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=1e-5)
    sd_grads = export_generator_state(jax.device_get(j_grads), {})
    compared = 0
    for k, tg in t_grads.items():
        atol = 5e-3 * float(np.abs(tg).max()) + 1e-8
        np.testing.assert_allclose(
            sd_grads[k], tg, rtol=5e-3, atol=atol,
            err_msg=f"gradient mismatch at {k}",
        )
        compared += 1
    assert compared == len(t_grads) and compared > 10


@needs_ref
def test_gan_generator_step_parity_with_reference(ref_models):
    """SURVEY hard part #1 end-to-end: the SRGAN G-step numerics — tanh ->
    [0,1] -> dataset-norm dance (reference train.py:96-97), L1 on
    pre-activation VGG features, BCE-to-ones through a train-mode
    Discriminator (utils/loss.py:16-24) — produce the same loss triple AND
    the same generator gradients in torch and JAX, sharing one set of
    (random) VGG weights across frameworks."""
    from image_super_resolution_tpu.data.transforms import tanh_to_norm
    from image_super_resolution_tpu.interop import (
        export_generator_state,
        import_discriminator_state,
        import_generator_state,
    )
    from image_super_resolution_tpu.losses.perceptual import PerceptualLoss
    from image_super_resolution_tpu.models import Discriminator, SRGenerator
    from image_super_resolution_tpu.models.vgg import TruncatedVGG19

    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)

    # --- shared weights: reference G and D, one flax-initialized VGG -------
    # (seeded: unseeded random D weights occasionally form a BN stack that
    # amplifies fp32 accumulation noise ~1000x into the two logits)
    torch.manual_seed(0)
    t_gen = ref_models.EResNet(1, 0.2, 2).train()
    t_disc = ref_models.Discriminator(3, 8, 4, 16).train()
    g_params, _, _ = import_generator_state(_sd(t_gen))
    d_params, d_stats = import_discriminator_state(_sd(t_disc))

    vgg = TruncatedVGG19(i=2, j=1, before_act=True, dtype=jnp.float32)
    vgg_params = vgg.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))["params"]

    # torch replica of the truncated VGG: conv-relu-conv-relu-pool-conv
    t_vgg = torch.nn.Sequential(
        torch.nn.Conv2d(3, 64, 3, padding=1), torch.nn.ReLU(),
        torch.nn.Conv2d(64, 64, 3, padding=1), torch.nn.ReLU(),
        torch.nn.MaxPool2d(2),
        torch.nn.Conv2d(64, 128, 3, padding=1),  # last conv: pre-activation
    )
    with torch.no_grad():
        for conv_name, t_layer in (("conv0", t_vgg[0]), ("conv1", t_vgg[2]),
                                   ("conv2", t_vgg[5])):
            k = np.asarray(vgg_params[conv_name]["kernel"])  # HWIO
            t_layer.weight.copy_(torch.from_numpy(k.transpose(3, 2, 0, 1).copy()))
            t_layer.bias.copy_(
                torch.from_numpy(np.asarray(vgg_params[conv_name]["bias"]))
            )

    rng = np.random.default_rng(17)
    lr = rng.standard_normal((2, 12, 12, 3)).astype(np.float32)
    hr01 = rng.uniform(0, 1, (2, 24, 24, 3)).astype(np.float32)
    hr_norm = (hr01 - np.asarray(mean)) / np.asarray(std)
    hr_norm = hr_norm.astype(np.float32)

    # --- torch G-step (reference train.py:91-110 semantics) ----------------
    t_lr = torch.from_numpy(lr.transpose(0, 3, 1, 2).copy())
    t_hr_norm = torch.from_numpy(hr_norm.transpose(0, 3, 1, 2).copy())
    t_mean = torch.tensor(mean).view(1, 3, 1, 1)
    t_std = torch.tensor(std).view(1, 3, 1, 1)

    sr = t_gen(t_lr)
    sr_norm = ((sr + 1.0) / 2.0 - t_mean) / t_std  # train.py:96-97
    logits = t_disc(sr_norm)
    content = torch.nn.L1Loss()(t_vgg(sr_norm), t_vgg(t_hr_norm).detach())
    adv = torch.nn.BCEWithLogitsLoss()(logits, torch.ones_like(logits))
    perceptual = content + 1e-3 * adv
    perceptual.backward()
    t_grads = {k: p.grad.numpy() for k, p in t_gen.named_parameters()}

    # --- JAX G-step (train/steps.py make_gan_train_step semantics) ---------
    g_model = SRGenerator(depth=1, add_rate=0.2, scale=2, enchant=True,
                          dtype=jnp.float32)
    d_model = Discriminator(3, 8, 4, 16, dtype=jnp.float32)  # fp32 like torch
    ploss = PerceptualLoss(vgg_params, vgg_i=2, vgg_j=1, before_act=True,
                           dtype=jnp.float32)

    def g_loss(gp):
        sr = g_model.apply({"params": gp}, jnp.asarray(lr))
        sr_n = tanh_to_norm(sr, mean, std)
        logits, _ = d_model.apply(
            {"params": d_params, "batch_stats": d_stats}, sr_n,
            train=True, mutable=["batch_stats"],
        )
        p, a, c = ploss(sr_n, jnp.asarray(hr_norm), logits)
        return p, (a, c)

    (j_perc, (j_adv, j_content)), j_grads = jax.value_and_grad(
        g_loss, has_aux=True
    )(jax.tree_util.tree_map(jnp.asarray, g_params))

    np.testing.assert_allclose(float(j_content), float(content.detach()),
                               rtol=1e-4)
    np.testing.assert_allclose(float(j_adv), float(adv.detach()), rtol=1e-4)
    np.testing.assert_allclose(float(j_perc), float(perceptual.detach()),
                               rtol=1e-4)
    sd_grads = export_generator_state(jax.device_get(j_grads), {})
    compared = 0
    for k, tg in t_grads.items():
        # bias grads are sums of mostly-cancelling terms; near-zero entries
        # need a tolerance scaled to the tensor's magnitude, not the entry's
        atol = 3e-3 * float(np.abs(tg).max()) + 1e-8
        np.testing.assert_allclose(
            sd_grads[k], tg, rtol=5e-3, atol=atol,
            err_msg=f"G gradient mismatch at {k}",
        )
        compared += 1
    assert compared == len(t_grads) and compared > 8


@needs_ref
def test_gan_discriminator_step_parity_with_reference(ref_models):
    """The D-step numerics — BCE(D(stop_grad(sr)), 0) + BCE(D(hr), 1) with
    two train-mode forwards (reference train.py:113-117, utils/loss.py:26-29)
    — produce the same loss and discriminator gradients in torch and JAX,
    completing step-level parity for the whole GAN loop."""
    from image_super_resolution_tpu.interop import (
        export_discriminator_state,
        import_discriminator_state,
    )
    from image_super_resolution_tpu.losses import discriminator_loss
    from image_super_resolution_tpu.models import Discriminator

    torch.manual_seed(0)
    t_disc = ref_models.Discriminator(3, 8, 4, 16).train()
    d_params, d_stats = import_discriminator_state(_sd(t_disc))
    d_model = Discriminator(3, 8, 4, 16, dtype=jnp.float32)

    rng = np.random.default_rng(29)
    sr_norm = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    hr_norm = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)

    # torch D-step
    t_sr = torch.from_numpy(sr_norm.transpose(0, 3, 1, 2).copy())
    t_hr = torch.from_numpy(hr_norm.transpose(0, 3, 1, 2).copy())
    sr_logits = t_disc(t_sr)
    hr_logits = t_disc(t_hr)
    bce = torch.nn.BCEWithLogitsLoss()
    t_loss = bce(sr_logits, torch.zeros_like(sr_logits)) + bce(
        hr_logits, torch.ones_like(hr_logits)
    )
    t_loss.backward()
    t_grads = {k: p.grad.numpy() for k, p in t_disc.named_parameters()}

    # JAX D-step (train/steps.py d_loss semantics: two train-mode forwards,
    # batch-stat bookkeeping threaded between them)
    def d_loss(dp):
        sl, mut = d_model.apply(
            {"params": dp, "batch_stats": d_stats}, jnp.asarray(sr_norm),
            train=True, mutable=["batch_stats"],
        )
        hl, _ = d_model.apply(
            {"params": dp, "batch_stats": mut["batch_stats"]},
            jnp.asarray(hr_norm), train=True, mutable=["batch_stats"],
        )
        return discriminator_loss(sl, hl)

    j_loss, j_grads = jax.value_and_grad(d_loss)(
        jax.tree_util.tree_map(jnp.asarray, d_params)
    )
    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=1e-5)

    sd_grads = export_discriminator_state(jax.device_get(j_grads), {})
    compared = 0
    for k, tg in t_grads.items():
        atol = 3e-3 * float(np.abs(tg).max()) + 1e-8
        np.testing.assert_allclose(
            sd_grads[k], tg, rtol=5e-3, atol=atol,
            err_msg=f"D gradient mismatch at {k}",
        )
        compared += 1
    assert compared == len(t_grads) and compared > 8


@needs_ref
def test_ema_parity_with_reference(ref_models):
    """ema_update reproduces the reference ModelEMA trajectory (ramped decay
    d = 0.9999*(1-exp(-n/tau)), full-state lerp — utils/models.py:17-40)
    over several updates with changing weights."""
    from image_super_resolution_tpu.interop import import_generator_state
    from image_super_resolution_tpu.train.state import ema_update, init_ema

    torch.manual_seed(1)
    tnet = ref_models.EResNet(1, 0.2, 2)
    t_ema = ref_models.ModelEMA(tnet, tau=100)

    params, stats, _ = import_generator_state(_sd(tnet))
    ema = init_ema(jax.tree_util.tree_map(jnp.asarray, params), stats)

    g = torch.Generator().manual_seed(7)
    for _ in range(4):
        with torch.no_grad():  # simulate an optimizer step
            for p in tnet.parameters():
                p.add_(0.01 * torch.randn(p.shape, generator=g))
        t_ema.update(tnet)
        params_k, stats_k, _ = import_generator_state(_sd(tnet))
        ema = ema_update(
            ema, jax.tree_util.tree_map(jnp.asarray, params_k), stats_k,
            tau=100.0,
        )

    want_params, _, _ = import_generator_state(_sd(t_ema.ema))
    for (k1, v1), (k2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(ema.params)),
        jax.tree_util.tree_leaves_with_path(want_params),
    ):
        assert k1 == k2
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-5, atol=1e-7)

# --------------------------------------------- N-step trajectory parity ----
# Per-step parity (above) pins each piece — gradients, one optimizer step,
# EMA update — in isolation. These co-runs close the remaining daylight: the
# COMPOSITION of per-batch LinearLR + Adam + global-norm clip + EMA ramp over
# many steps must track the live reference loop as a curve, not just at one
# step (VERDICT r3 item 2; reference train.py:41-67 and 70-129).


def _torch_pixel_loop(tnet, ref_models, hrs, lrs, n_steps, lr=1e-4, lr2=0.01):
    """The reference train() loop verbatim (train.py:50-66): Adam + per-batch
    LinearLR + clip_grad_norm_(10) + ModelEMA, on precomputed (hr, lr)."""
    from torch.optim.lr_scheduler import LinearLR

    opt = torch.optim.Adam(tnet.parameters(), lr=lr, betas=(0.9, 0.999),
                           weight_decay=0.0)
    sched = LinearLR(opt, start_factor=1, end_factor=lr2, total_iters=n_steps)
    ema = ref_models.ModelEMA(tnet, tau=n_steps)
    loss_fn = torch.nn.MSELoss()
    losses = []
    for k in range(n_steps):
        t_lr = torch.from_numpy(lrs[k].transpose(0, 3, 1, 2).copy())
        t_hr = torch.from_numpy(hrs[k].transpose(0, 3, 1, 2).copy())
        opt.zero_grad()
        loss = loss_fn(tnet(t_lr), t_hr)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tnet.parameters(), 10)
        opt.step()
        sched.step()
        ema.update(tnet)
        losses.append(float(loss.detach()))
    return losses, ema


@needs_ref
def test_pixel_training_trajectory_parity(ref_models):
    """50 co-run pixel steps: identical uint8 batches through OUR jitted
    step (make_pixel_train_step: on-device degrade + MSE + clip + Adam +
    LinearLR + EMA) and the reference loop; the loss CURVES and the final
    live + EMA params must track. Catches cross-step interactions no single
    step can (schedule indexing off-by-one, EMA-of-updated-params order,
    moment accumulation drift)."""
    from image_super_resolution_tpu.data.pipeline import DegradeConfig, make_sr_batch_fn
    from image_super_resolution_tpu.interop import (
        export_generator_state,
        import_generator_state,
    )
    from image_super_resolution_tpu.models import SRGenerator
    from image_super_resolution_tpu.train import build_optimizer, create_train_state
    from image_super_resolution_tpu.train.steps import make_pixel_train_step

    n_steps, batch, hr_px = 50, 4, 24
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)

    torch.manual_seed(3)
    tnet = ref_models.EResNet(1, 0.2, 2).train()
    params, _, _ = import_generator_state(_sd(tnet))

    rng = np.random.default_rng(41)
    batches_u8 = rng.integers(0, 256, (n_steps, batch, hr_px, hr_px, 3),
                              dtype=np.uint8)

    # One batch_fn produces the (hr, lr) pairs for BOTH frameworks — the
    # degradation itself is pinned to cv2 elsewhere (test_eval); here the
    # subject is the optimization trajectory.
    batch_fn = jax.jit(make_sr_batch_fn(2, "tanh", mean, std, DegradeConfig()))
    pairs = [jax.device_get(batch_fn(jnp.asarray(b))) for b in batches_u8]
    hrs = [p[0] for p in pairs]
    lrs = [p[1] for p in pairs]

    t_losses, t_ema = _torch_pixel_loop(tnet, ref_models, hrs, lrs, n_steps)

    model = SRGenerator(depth=1, add_rate=0.2, scale=2, enchant=True,
                        dtype=jnp.float32)
    state = create_train_state(model, (1, hr_px // 2, hr_px // 2, 3),
                               build_optimizer(total_steps=n_steps),
                               jax.random.PRNGKey(0), ema_tau=float(n_steps))
    state = state.replace(params=jax.tree_util.tree_map(jnp.asarray, params))
    # EMA starts from the loaded weights, like ModelEMA's deepcopy(model)
    state = state.replace(ema=state.ema.replace(
        params=jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), state.params)))
    step = make_pixel_train_step(2, "tanh", "mse", mean, std)

    j_losses = []
    for b in batches_u8:
        state, metrics = step(state, jnp.asarray(b))
        j_losses.append(float(metrics["loss"]))

    # Loss curves: the first step must match to fp-forward precision; the
    # whole 50-step curve must track within 0.5%. (Per-step torch-vs-XLA
    # conv-backward differences are ~0.2% relative — the single-step parity
    # tests above bound them — so tighter curve tolerances would re-test
    # float reassociation, not the optimization semantics under test here.)
    np.testing.assert_allclose(j_losses[0], t_losses[0], rtol=1e-4)
    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-3, atol=1e-7)
    # The curve must actually descend (this is a real optimization, not noise)
    assert np.mean(j_losses[-5:]) < np.mean(j_losses[:5])

    # Final live params and EMA params track through the export mapping.
    # Per-element comparison is the wrong metric after 50 Adam steps: Adam
    # normalizes each element by sqrt(v), so a ~0.2%/step gradient-algorithm
    # difference shows up as O(1) RELATIVE drift on near-zero elements while
    # the trajectory is identical to the eye. The honest contract is
    # norm-level: Frobenius drift under 1% per tensor (a schedule off-by-one,
    # wrong eps, or missed clip diverges 10-100x that).
    for got_tree, want_net, tag in (
        (state.params, tnet, "live"),
        (state.ema.params, t_ema.ema, "ema"),
    ):
        sd = export_generator_state(jax.device_get(got_tree), {})
        want = _sd(want_net)
        compared = 0
        for k, tv in want.items():
            if k not in sd:  # num_batches_tracked etc.
                continue
            rel = np.linalg.norm(sd[k] - tv) / (np.linalg.norm(tv) + 1e-12)
            assert rel < 1e-2, (
                f"{tag} param drift at {k} after {n_steps} steps: "
                f"relative Frobenius {rel:.4f}"
            )
            compared += 1
        assert compared > 10


@needs_ref
def test_gan_training_trajectory_parity(ref_models):
    """20 co-run SRGAN steps (G and D, shared random VGG): the content /
    adversarial / discriminator loss curves and the final G AND D params
    must track the reference train_srgan loop (train.py:91-127) through
    OUR single-program jitted GAN step."""
    from image_super_resolution_tpu.data.pipeline import DegradeConfig, make_sr_batch_fn
    from image_super_resolution_tpu.interop import (
        export_discriminator_state,
        export_generator_state,
        import_discriminator_state,
        import_generator_state,
    )
    from image_super_resolution_tpu.losses.perceptual import PerceptualLoss
    from image_super_resolution_tpu.models import Discriminator, SRGenerator
    from image_super_resolution_tpu.models.vgg import TruncatedVGG19
    from image_super_resolution_tpu.train import build_optimizer, create_train_state
    from image_super_resolution_tpu.train.steps import make_gan_train_step

    n_steps, batch, hr_px = 20, 2, 24
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)

    torch.manual_seed(5)
    t_gen = ref_models.EResNet(1, 0.2, 2).train()
    t_disc = ref_models.Discriminator(3, 8, 4, 16).train()
    g_params, _, _ = import_generator_state(_sd(t_gen))
    d_params, d_stats = import_discriminator_state(_sd(t_disc))

    # shared random VGG weights across frameworks (as in the G-step test)
    vgg = TruncatedVGG19(i=2, j=1, before_act=True, dtype=jnp.float32)
    vgg_params = vgg.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 24, 3)))["params"]
    t_vgg = torch.nn.Sequential(
        torch.nn.Conv2d(3, 64, 3, padding=1), torch.nn.ReLU(),
        torch.nn.Conv2d(64, 64, 3, padding=1), torch.nn.ReLU(),
        torch.nn.MaxPool2d(2),
        torch.nn.Conv2d(64, 128, 3, padding=1),
    )
    with torch.no_grad():
        for conv_name, t_layer in (("conv0", t_vgg[0]), ("conv1", t_vgg[2]),
                                   ("conv2", t_vgg[5])):
            k = np.asarray(vgg_params[conv_name]["kernel"])
            t_layer.weight.copy_(torch.from_numpy(k.transpose(3, 2, 0, 1).copy()))
            t_layer.bias.copy_(
                torch.from_numpy(np.asarray(vgg_params[conv_name]["bias"])))

    rng = np.random.default_rng(43)
    batches_u8 = rng.integers(0, 256, (n_steps, batch, hr_px, hr_px, 3),
                              dtype=np.uint8)
    batch_fn = jax.jit(make_sr_batch_fn(2, "norm", mean, std, DegradeConfig()))
    pairs = [jax.device_get(batch_fn(jnp.asarray(b))) for b in batches_u8]

    # ---- torch loop: train_srgan verbatim (train.py:91-127) ---------------
    from torch.optim.lr_scheduler import LinearLR

    opt_g = torch.optim.Adam(t_gen.parameters(), lr=1e-4, betas=(0.9, 0.999))
    opt_d = torch.optim.Adam(t_disc.parameters(), lr=1e-4, betas=(0.9, 0.999))
    sch_g = LinearLR(opt_g, start_factor=1, end_factor=0.01, total_iters=n_steps)
    sch_d = LinearLR(opt_d, start_factor=1, end_factor=0.01, total_iters=n_steps)
    t_ema = ref_models.ModelEMA(t_gen, tau=n_steps)
    bce = torch.nn.BCEWithLogitsLoss()
    t_mean = torch.tensor(mean).view(1, 3, 1, 1)
    t_std = torch.tensor(std).view(1, 3, 1, 1)
    t_curves = {"content": [], "adv": [], "dis": []}
    for k in range(n_steps):
        hr_norm, lr_img = pairs[k]
        t_lr = torch.from_numpy(lr_img.transpose(0, 3, 1, 2).copy())
        t_hr = torch.from_numpy(hr_norm.transpose(0, 3, 1, 2).copy())
        sr = t_gen(t_lr)
        sr = ((sr + 1.0) / 2.0 - t_mean) / t_std
        logits = t_disc(sr)
        content = torch.nn.L1Loss()(t_vgg(sr), t_vgg(t_hr).detach())
        adv = bce(logits, torch.ones_like(logits))
        perceptual = content + 1e-3 * adv
        opt_g.zero_grad()
        perceptual.backward()
        torch.nn.utils.clip_grad_norm_(t_gen.parameters(), 10)
        opt_g.step()
        sch_g.step()
        t_ema.update(t_gen)
        sr_logits = t_disc(sr.detach())
        hr_logits = t_disc(t_hr)
        d_loss = bce(sr_logits, torch.zeros_like(sr_logits)) + bce(
            hr_logits, torch.ones_like(hr_logits))
        opt_d.zero_grad()
        d_loss.backward()
        torch.nn.utils.clip_grad_norm_(t_disc.parameters(), 10)
        opt_d.step()
        sch_d.step()
        t_curves["content"].append(float(content.detach()))
        t_curves["adv"].append(float(adv.detach()))
        t_curves["dis"].append(float(d_loss.detach()))

    # ---- JAX loop: our jitted GAN step -------------------------------------
    g_model = SRGenerator(depth=1, add_rate=0.2, scale=2, enchant=True,
                          dtype=jnp.float32)
    d_model = Discriminator(3, 8, 4, 16, dtype=jnp.float32)
    g_state = create_train_state(g_model, (1, hr_px // 2, hr_px // 2, 3),
                                 build_optimizer(total_steps=n_steps),
                                 jax.random.PRNGKey(1), ema_tau=float(n_steps))
    g_state = g_state.replace(
        params=jax.tree_util.tree_map(jnp.asarray, g_params))
    g_state = g_state.replace(ema=g_state.ema.replace(
        params=jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), g_state.params)))
    d_state = create_train_state(d_model, (1, hr_px, hr_px, 3),
                                 build_optimizer(total_steps=n_steps),
                                 jax.random.PRNGKey(2), with_ema=False)
    d_state = d_state.replace(
        params=jax.tree_util.tree_map(jnp.asarray, d_params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, d_stats))
    ploss = PerceptualLoss(vgg_params, vgg_i=2, vgg_j=1, before_act=True,
                           dtype=jnp.float32)
    step = make_gan_train_step(2, ploss, mean, std)

    j_curves = {"content": [], "adv": [], "dis": []}
    for b in batches_u8:
        g_state, d_state, m = step(g_state, d_state, jnp.asarray(b))
        j_curves["content"].append(float(m["loss/content"]))
        j_curves["adv"].append(float(m["loss/adv"]))
        j_curves["dis"].append(float(m["loss/dis"]))

    # First step to fp-forward precision; full curves within 2% (torch-vs-XLA
    # conv fp differences compound per step through TWO Adam optimizers and a
    # BN discriminator; the single-step tests above pin the semantics, this
    # asserts the composition tracks as a curve).
    for key in ("content", "adv", "dis"):
        np.testing.assert_allclose(
            j_curves[key][0], t_curves[key][0], rtol=5e-4,
            err_msg=f"GAN {key} loss differs at step 0 — semantic mismatch")
        np.testing.assert_allclose(
            j_curves[key], t_curves[key], rtol=2e-2, atol=1e-5,
            err_msg=f"GAN {key} loss curve diverged over {n_steps} steps")

    # Norm-level param tracking (see the pixel test for why not per-element).
    for got_tree, want_sd, export, tag in (
        (g_state.params, _sd(t_gen), export_generator_state, "G"),
        (g_state.ema.params, _sd(t_ema.ema), export_generator_state, "G-ema"),
        (d_state.params, _sd(t_disc), export_discriminator_state, "D"),
    ):
        sd = export(jax.device_get(got_tree), {})
        compared = 0
        for k, tv in want_sd.items():
            # BN running stats are excluded: the G-step documented deviation
            # (train/steps.py — D's stat updates from the G forward are not
            # kept) makes them differ by design, and train-mode BN never
            # reads them, so the TRAJECTORY is unaffected.
            if k not in sd or "running_" in k or "num_batches" in k:
                continue
            rel = np.linalg.norm(sd[k] - tv) / (np.linalg.norm(tv) + 1e-12)
            assert rel < 2e-2, (
                f"{tag} param drift at {k} after {n_steps} GAN steps: "
                f"relative Frobenius {rel:.4f}"
            )
            compared += 1
        assert compared > 8
