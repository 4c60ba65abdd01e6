"""Training layer tests: EMA parity, loss parity vs torch, train steps learn,
checkpoint round trip, tolerant resume, GAN warm start, DP sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_super_resolution_tpu.losses import (
    bce_with_logits,
    discriminator_loss,
    generator_adversarial_loss,
)
from image_super_resolution_tpu.models import Denoiser, Discriminator, SRGenerator
from image_super_resolution_tpu.train import (
    build_optimizer,
    create_train_state,
    ema_decay,
    load_checkpoint,
    make_gan_train_step,
    make_pixel_train_step,
    resume_state,
    save_checkpoint,
    warm_start_generator,
)


def tiny_gen(scale=2, **kw):
    return SRGenerator(depth=1, width=8, scale=scale, **kw)


def make_state(model=None, shape=(1, 16, 16, 3), total_steps=100, ema_tau=100.0):
    model = model or tiny_gen()
    tx = build_optimizer(lr=1e-3, total_steps=total_steps)
    return create_train_state(model, shape, tx, jax.random.PRNGKey(0), ema_tau=ema_tau)


def test_ema_decay_matches_reference_formula():
    # reference: decay(x) = 0.9999 * (1 - exp(-x / tau))  (utils/models.py:27)
    import math

    for updates, tau in [(1, 2000.0), (100, 2000.0), (5000, 300.0)]:
        got = float(ema_decay(jnp.asarray(updates), tau))
        want = 0.9999 * (1 - math.exp(-updates / tau))
        assert abs(got - want) < 1e-6


def test_bce_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((8, 1)).astype(np.float32)
    targets = rng.integers(0, 2, (8, 1)).astype(np.float32)
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ).item()
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(got - want) < 1e-6
    # composite refs
    hr = rng.standard_normal((8, 1)).astype(np.float32)
    want_d = (
        torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.zeros(8, 1)
        )
        + torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(hr), torch.ones(8, 1)
        )
    ).item()
    got_d = float(discriminator_loss(jnp.asarray(logits), jnp.asarray(hr)))
    assert abs(got_d - want_d) < 1e-6
    got_g = float(generator_adversarial_loss(jnp.asarray(logits)))
    want_g = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.ones(8, 1)
    ).item()
    assert abs(got_g - want_g) < 1e-6


def test_pixel_step_reduces_loss_and_updates_ema():
    state = make_state(total_steps=60)
    step = make_pixel_train_step(scale=2, hr_mode="tanh", pixel_loss="mse")
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8))
    first = None
    for i in range(30):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.9, (first, last)
    assert int(state.ema.updates) == 30
    # early EMA must track params loosely but not equal init
    d = float(ema_decay(state.ema.updates, state.ema_tau))
    assert 0.0 < d < 0.9999


def test_checkpoint_roundtrip_and_tolerant_resume(tmp_path):
    state = make_state()
    step = make_pixel_train_step(scale=2)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 16, 16, 3), dtype=np.uint8)
    )
    for _ in range(3):
        state, _ = step(state, batch)
    path = tmp_path / "res_test_1_0.2.ckpt"
    save_checkpoint(path, state, epoch=4, mean=[0.5] * 3, std=[0.25] * 3,
                    loss_history=[1.0, 0.5])
    ckpt = load_checkpoint(path)
    assert ckpt["meta"]["epoch"] == 4 and ckpt["meta"]["mean"] == [0.5] * 3

    fresh = make_state()
    resumed, start_epoch = resume_state(fresh, ckpt)
    assert start_epoch == 5  # full match -> optimizer + epoch restored
    # fp16 storage: params match to half precision
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(resumed.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)

    # architecture change -> partial load, no optimizer restore
    bigger = make_state(SRGenerator(depth=2, width=8, scale=2))
    partial, start_epoch = resume_state(bigger, ckpt, verbose=False)
    assert start_epoch == 0


def test_final_epoch_drops_optimizer(tmp_path):
    state = make_state()
    path = tmp_path / "ck.ckpt"
    save_checkpoint(path, state, epoch=9, mean=[0] * 3, std=[1] * 3, final=True)
    assert "opt_state" not in load_checkpoint(path)


def test_resume_epoch_policy_matches_reference_phases(tmp_path):
    """The reference continues the epoch counter differently per phase when
    resuming an optimizer-dropped (final-epoch) checkpoint: pixel continues
    on a full param match (train.py:282-285), GAN continues unconditionally
    (train.py:337-346), denoise restarts at 0 (train.py:217-219).
    resume_state's epoch_policy pins all three rules."""
    state = make_state()
    path = tmp_path / "ck.ckpt"
    save_checkpoint(path, state, epoch=7, mean=[0] * 3, std=[1] * 3,
                    final=True)
    ckpt = load_checkpoint(path)
    assert "opt_state" not in ckpt

    # denoise rule (the default): no optimizer -> epochs restart
    assert resume_state(make_state(), ckpt, verbose=False)[1] == 0
    # pixel rule: full match -> continue past the final checkpoint with a
    # fresh optimizer (resume of a completed run = no-op / pure top-up)
    assert resume_state(make_state(), ckpt, verbose=False,
                        epoch_policy="matched")[1] == 8
    # pixel rule under an architecture change: partial match -> restart
    bigger = make_state(SRGenerator(depth=2, width=8, scale=2))
    assert resume_state(bigger, ckpt, verbose=False,
                        epoch_policy="matched")[1] == 0
    # GAN rule: continue even on a partial match
    assert resume_state(bigger, ckpt, verbose=False,
                        epoch_policy="always")[1] == 8


def test_gan_warm_start_from_pretrain(tmp_path):
    state = make_state()
    path = tmp_path / "res.ckpt"
    save_checkpoint(path, state, epoch=0, mean=[0.5] * 3, std=[0.5] * 3)
    g_state = make_state()
    warmed = warm_start_generator(g_state, path, verbose=False)
    a = jax.tree_util.tree_leaves(state.ema.params)[0]
    b = jax.tree_util.tree_leaves(warmed.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    missing = warm_start_generator(g_state, tmp_path / "nope.ckpt", verbose=False)
    assert missing is g_state


def test_gan_step_runs_and_produces_reference_metrics():
    from image_super_resolution_tpu.losses.perceptual import PerceptualLoss
    from image_super_resolution_tpu.models.vgg import TruncatedVGG19, init_vgg_params

    g_state = make_state(tiny_gen(), ema_tau=50.0)
    d_model = Discriminator(channels=8, n_blocks=4, fc_size=16, dtype=jnp.float32)
    d_tx = build_optimizer(lr=1e-3, total_steps=50)
    d_state = create_train_state(d_model, (1, 32, 32, 3), d_tx, jax.random.PRNGKey(1))

    vgg = TruncatedVGG19(i=2, j=1, dtype=jnp.float32)
    vgg_params = vgg.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)))["params"]
    perceptual = PerceptualLoss(vgg_params, vgg_i=2, vgg_j=1, dtype=jnp.float32)

    step = make_gan_train_step(scale=2, perceptual=perceptual)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    )
    g2, d2, metrics = step(g_state, d_state, batch)
    assert set(metrics) == {"loss/content", "loss/adv", "loss/dis"}
    for v in metrics.values():
        assert np.isfinite(float(v))
    assert int(g2.step) == 1 and int(d2.step) == 1
    assert int(g2.ema.updates) == 1
    # generator params actually moved
    a = jax.tree_util.tree_leaves(g_state.params)[0]
    b = jax.tree_util.tree_leaves(g2.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_pixel_step_data_parallel_8_devices():
    """Same step under an 8-device data mesh: batch sharded, states replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from image_super_resolution_tpu.core.mesh import batch_sharding, make_mesh

    assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
    mesh = make_mesh()
    state = make_state(total_steps=20)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = make_pixel_train_step(scale=2)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (16, 16, 16, 3), dtype=np.uint8)
    )
    batch = jax.device_put(batch, batch_sharding(mesh))
    first = None
    for _ in range(10):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    # params stay replicated across the mesh
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from image_super_resolution_tpu.train.orbax_io import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    state = make_state()
    # GAN saves carry the discriminator through ``extra`` — round-trip the
    # same keys cli/train.py writes (d_params restored to fp32 like params).
    extra = {
        "d_params": {"Dense_0": {"kernel": np.ones((4, 4), np.float16)}},
        "d_batch_stats": {},
        "d_step": 7,
    }
    save_checkpoint_orbax(tmp_path / "ckpt", state, epoch=3, mean=[0.5] * 3,
                          std=[0.2] * 3, loss_history=[1.0], extra=extra)
    ckpt = load_checkpoint_orbax(tmp_path / "ckpt")
    assert ckpt["meta"]["epoch"] == 3
    assert int(ckpt["d_step"]) == 7
    d_kernel = ckpt["d_params"]["Dense_0"]["kernel"]
    assert np.asarray(d_kernel).dtype == np.float32
    np.testing.assert_array_equal(np.asarray(d_kernel), np.ones((4, 4)))
    fresh = make_state()
    resumed, start_epoch = resume_state(fresh, ckpt, verbose=False)
    assert start_epoch == 4
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(resumed.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_orbax_overwrite_is_crash_safe(tmp_path):
    """Per-epoch overwrite semantics without the orbax force=True hazard
    (which rmtree's the ONLY checkpoint before writing the new one): the
    save goes to a sibling tmp dir and swaps in with renames, leaving no
    .tmp/.old debris; and a crash between the two renames (old checkpoint
    parked at .old, target missing) is recovered by the loader."""
    pytest.importorskip("orbax.checkpoint")
    from image_super_resolution_tpu.train.orbax_io import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    state = make_state()
    ckpt = tmp_path / "ckpt"
    save_checkpoint_orbax(ckpt, state, epoch=0, mean=[0.5] * 3,
                          std=[0.2] * 3, loss_history=[1.0])
    save_checkpoint_orbax(ckpt, state, epoch=1, mean=[0.5] * 3,
                          std=[0.2] * 3, loss_history=[1.0, 0.5])
    assert load_checkpoint_orbax(ckpt)["meta"]["epoch"] == 1
    assert not (tmp_path / "ckpt.tmp").exists()
    assert not (tmp_path / "ckpt.old").exists()

    # simulate a crash between the two renames — recovery must be reachable
    # through the REAL entry points (the CLI resume gate and the
    # backend-agnostic loader), not just the orbax-specific function
    from image_super_resolution_tpu.train import (
        checkpoint_exists,
        load_any_checkpoint,
    )

    ckpt.rename(tmp_path / "ckpt.old")
    assert checkpoint_exists(ckpt)  # the cli/train.py --resume gate
    # loads read the survivor IN PLACE — no disk mutation (a load-path
    # rename races concurrent loaders and an in-flight save's swap window)
    assert load_any_checkpoint(ckpt)["meta"]["epoch"] == 1
    assert not ckpt.exists() and (tmp_path / "ckpt.old").is_dir()
    assert load_checkpoint_orbax(ckpt)["meta"]["epoch"] == 1
    assert not ckpt.exists() and (tmp_path / "ckpt.old").is_dir()

    # ...the next SAVE owns the recovery: it promotes .old back (instead of
    # rmtree'ing the only surviving checkpoint as a stale leftover) and
    # finishes with exactly one checkpoint on disk
    save_checkpoint_orbax(ckpt, state, epoch=2, mean=[0.5] * 3,
                          std=[0.2] * 3, loss_history=[1.0, 0.5, 0.3])
    assert load_checkpoint_orbax(ckpt)["meta"]["epoch"] == 2
    assert not (tmp_path / "ckpt.old").exists()
    assert not (tmp_path / "ckpt.tmp").exists()


def test_checkpoint_backend_switch_over_existing(tmp_path):
    """Re-running a phase with the OTHER --ckpt_backend must survive its
    first save: each backend's per-epoch overwrite handles the other
    format's artifact at its target name (msgpack FILE under the orbax
    swap's rmtree, orbax DIRECTORY under msgpack's os.replace)."""
    pytest.importorskip("orbax.checkpoint")
    from image_super_resolution_tpu.train import load_any_checkpoint
    from image_super_resolution_tpu.train.checkpoint import save_checkpoint
    from image_super_resolution_tpu.train.orbax_io import save_checkpoint_orbax

    state = make_state()
    ckpt = tmp_path / "ckpt"
    save_checkpoint(ckpt, state, epoch=0, mean=[0.5] * 3, std=[0.2] * 3)
    assert ckpt.is_file()
    save_checkpoint_orbax(ckpt, state, epoch=1, mean=[0.5] * 3, std=[0.2] * 3)
    assert ckpt.is_dir()
    assert load_any_checkpoint(ckpt)["meta"]["epoch"] == 1
    save_checkpoint(ckpt, state, epoch=2, mean=[0.5] * 3, std=[0.2] * 3)
    assert ckpt.is_file()
    assert load_any_checkpoint(ckpt)["meta"]["epoch"] == 2
    assert not (tmp_path / "ckpt.old").exists()
    assert not (tmp_path / "ckpt.tmp").exists()


def test_tensor_parallel_conv_matches_single_device():
    from image_super_resolution_tpu.core.mesh import make_mesh
    from image_super_resolution_tpu.parallel.tensor import tp_conv

    mesh = make_mesh(n_data=1, n_tile=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 32)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((32,)).astype(np.float32))

    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    got = tp_conv(mesh)(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_optimizer_step_parity_with_torch():
    """build_optimizer (clip 10 -> coupled-L2 Adam -> LinearLR 1 -> lr2)
    reproduces the reference's torch.optim.Adam + clip_grad_norm_ + LinearLR
    parameter trajectory step for step (reference train.py:59-62, 265-269),
    including a step whose gradient norm exceeds the clip threshold and a
    non-zero --weight_decay (which torch couples into the gradient, NOT
    AdamW-style)."""
    import pytest

    torch = pytest.importorskip("torch")

    from image_super_resolution_tpu.train import build_optimizer

    rng = np.random.default_rng(23)
    w0 = rng.standard_normal((6, 5)).astype(np.float32)
    grads = [rng.standard_normal((6, 5)).astype(np.float32) for _ in range(4)]
    grads[1] *= 50.0  # norm >> 10: exercises the clip leg
    lr, lr2, wd, total = 1e-2, 0.01, 0.05, 10

    # torch trajectory
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=lr, betas=(0.9, 0.999), weight_decay=wd)
    tsched = torch.optim.lr_scheduler.LinearLR(
        topt, start_factor=1, end_factor=lr2, total_iters=total
    )
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([tw], 10.0)
        topt.step()
        tsched.step()

    # optax trajectory
    tx = build_optimizer(lr=lr, lr2=lr2, total_steps=total, weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-7
    )


def test_resume_tolerates_incompatible_opt_state():
    """A checkpoint whose serialized optimizer chain no longer matches the
    current optimizer (e.g. saved before the coupled-L2 weight-decay fix
    changed the optax chain length) must resume WEIGHTS tolerantly — like a
    final-epoch checkpoint — not crash in from_state_dict."""
    import optax
    from flax import serialization as ser

    from image_super_resolution_tpu.models import SRGenerator
    from image_super_resolution_tpu.train import (
        build_optimizer,
        create_train_state,
    )
    from image_super_resolution_tpu.train.checkpoint import resume_state

    model = SRGenerator(depth=1, width=8, scale=2, dtype=jnp.float32)
    state = create_train_state(
        model, (1, 16, 16, 3), build_optimizer(total_steps=4, weight_decay=0.05),
        jax.random.PRNGKey(0),
    )
    # the OLD wd>0 optimizer: chain(clip, adamw) — a 2-element chain
    old_tx = optax.chain(
        optax.clip_by_global_norm(10.0), optax.adamw(1e-4, weight_decay=0.05)
    )
    ckpt = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(
            ser.to_state_dict(old_tx.init(state.params))
        ),
        "meta": {"epoch": 3, "step": 40,
                 "mean": [0.5] * 3, "std": [0.2] * 3, "loss": [0.1]},
    }
    resumed, start_epoch = resume_state(state, ckpt)
    assert start_epoch == 0  # optimizer restarted; weights still loaded
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(resumed.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


def test_mesh_shrink_largest_divisor():
    """The DP mesh-shrink rule keeps the most chips that divide the batch."""
    from image_super_resolution_tpu.core.mesh import (
        largest_divisible_device_count as f,
    )

    assert f(16, 8) == 8   # clean fit
    assert f(6, 8) == 6    # NOT gcd(6, 8) == 2
    assert f(7, 8) == 7
    assert f(5, 4) == 1    # prime batch larger than devices
    assert f(2, 8) == 2
