"""Exactness tests for the MXU-optimized inference graph (scatter RDB +
folded tail) against the standard fused generator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_super_resolution_tpu.models import SRGenerator
from image_super_resolution_tpu.models.deploy import DeployedModel, DeploySpec
from image_super_resolution_tpu.models.optimized import (
    OptimizedSRGenerator,
    optimize_generator_params,
)
from image_super_resolution_tpu.ops.fold_tail import fold_tail_kernel
from image_super_resolution_tpu.ops.scatter import ScatterRDB, rdb_params_to_scatter
from image_super_resolution_tpu.ops.blocks import RDB
from image_super_resolution_tpu.ops.pixel_shuffle import pixel_shuffle


def test_scatter_rdb_matches_standard():
    rdb = RDB(growth=16, act=("leaky_relu", 0.01), add_rate=0.2, use_bn=False,
              dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 12, 32))
    params = rdb.init(jax.random.PRNGKey(1), x)["params"]
    want = rdb.apply({"params": params}, x)

    scatter = ScatterRDB(features=32, act=("leaky_relu", 0.01), add_rate=0.2,
                         dtype=jnp.float32)
    s_params = rdb_params_to_scatter(params)
    got = scatter.apply({"params": s_params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fold_tail_kernel_exact():
    """tanh(conv9(d2s(u))) == d2s(tanh(conv5'(u))) for random u and K."""
    rng = np.random.default_rng(0)
    c = 8
    u = jnp.asarray(rng.standard_normal((1, 6, 7, c * 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((9, 9, c, 3)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((3,)).astype(np.float32))

    def conv(x, w, bias, pad):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias

    hr = pixel_shuffle(u, 2)
    want = jnp.tanh(conv(hr, k, b, 4))

    kf, bf = fold_tail_kernel(k, b)
    got = pixel_shuffle(jnp.tanh(conv(u, kf, bf, kf.shape[0] // 2)), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scale", [2, 4])
def test_optimized_generator_matches_fused(scale):
    std = SRGenerator(depth=2, width=32, scale=scale, fused=True, dtype=jnp.float32)
    variables = std.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, 3)) * 0.5
    want = std.apply(variables, x)

    opt = OptimizedSRGenerator(depth=2, width=32, scale=scale, dtype=jnp.float32)
    opt_params = optimize_generator_params(variables["params"])
    got = opt.apply({"params": opt_params}, x)
    assert got.shape == want.shape == (2, 12 * scale, 12 * scale, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_deployed_model_optimized_end_to_end():
    """uint8->uint8 parity between optimized and plain deployment graphs."""
    spec = DeploySpec(family="sr", depth=1, width=32, scale=4)
    std_model = spec.build_model(dtype=jnp.float32)
    variables = std_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))
    params = variables["params"]

    plain = DeployedModel(spec, params, dtype=jnp.float32, optimize=False)
    fast = DeployedModel(spec, params, dtype=jnp.float32, optimize=True)
    assert fast.optimized and not plain.optimized

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 12, 12, 3), dtype=np.uint8)
    )
    a = np.asarray(plain(x)).astype(np.int32)
    b = np.asarray(fast(x)).astype(np.int32)
    assert np.abs(a - b).max() <= 1  # float reassociation can flip a rounding
    assert (a != b).mean() < 0.02


def test_winograd_optimized_generator_bit_exact_fp32():
    """wino_m=2 (Winograd trunk convs) through the FULL optimized deployment
    graph is bit-identical to the direct-conv optimized graph in fp32 after
    uint8 decode."""
    spec = DeploySpec(family="sr", depth=2, width=64, scale=4)
    model = spec.build_model(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 24, 24, 3), dtype=np.uint8)
    )
    base = np.asarray(
        DeployedModel(spec, variables["params"], dtype=jnp.float32)(x)
    ).astype(np.int32)
    wino = np.asarray(
        DeployedModel(spec, variables["params"], dtype=jnp.float32, wino_m=2)(x)
    ).astype(np.int32)
    assert int(np.abs(base - wino).max()) == 0


def test_tail_fold2_generator_matches_fused():
    """Double-folded x4 tail (6x6 stride-2 quarter-res conv) == standard."""
    std = SRGenerator(depth=2, width=32, scale=4, fused=True, dtype=jnp.float32)
    variables = std.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, 3)) * 0.5
    want = std.apply(variables, x)

    opt = OptimizedSRGenerator(depth=2, width=32, scale=4, tail_fold=2,
                               dtype=jnp.float32)
    opt_params = optimize_generator_params(variables["params"], tail_fold=2)
    got = opt.apply({"params": opt_params}, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_tail_fold2_odd_spatial_size():
    """Odd LR inputs are safe: the stride-2 folded tail runs on the up1
    pre-shuffle grid (2*H, always even), so no floor-division size drift."""
    std = SRGenerator(depth=1, width=32, scale=4, fused=True, dtype=jnp.float32)
    variables = std.init(jax.random.PRNGKey(0), jnp.zeros((1, 13, 11, 3)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 13, 11, 3)) * 0.5
    want = std.apply(variables, x)
    opt = OptimizedSRGenerator(depth=1, width=32, scale=4, tail_fold=2,
                               dtype=jnp.float32)
    got = opt.apply(
        {"params": optimize_generator_params(variables["params"], tail_fold=2)}, x
    )
    assert got.shape == want.shape == (2, 52, 44, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_tail_fold_modes_agree_uint8():
    """tail_fold=1 and tail_fold=2 deployment graphs agree to 1 LSB."""
    spec = DeploySpec(family="sr", depth=1, width=32, scale=4)
    model = spec.build_model(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 3)))
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 12, 12, 3), dtype=np.uint8)
    )
    f1 = np.asarray(
        DeployedModel(spec, variables["params"], dtype=jnp.float32, tail_fold=1)(x)
    ).astype(np.int32)
    f2 = np.asarray(
        DeployedModel(spec, variables["params"], dtype=jnp.float32, tail_fold=2)(x)
    ).astype(np.int32)
    assert np.abs(f1 - f2).max() <= 1
    assert (f1 != f2).mean() < 0.02
