"""Tensor parallelism on the flagship family (parallel/tensor.py).

Runs on the virtual 8-device CPU mesh (tests/conftest.py). The contract: the
channel-sharded forward equals the single-device deployed graph (uint8
within 1 LSB; bit-equal in fp32 on CPU), through both the raw apply and the
full TiledUpscaler serving path rs.py's --tp_devices uses.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_super_resolution_tpu.core.mesh import make_mesh
from image_super_resolution_tpu.infer.engine import TiledUpscaler
from image_super_resolution_tpu.models.deploy import DeployedModel, DeploySpec
from image_super_resolution_tpu.parallel.tensor import (
    TPFastUpscaler,
    tp_fast_param_specs,
)


def _deployed(depth=2, width=16, scale=2, dtype=jnp.float32):
    spec = DeploySpec(family="fast", depth=depth, width=width, scale=scale)
    m = spec.build_model(dtype=dtype)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    return DeployedModel(spec, v["params"], dtype=dtype)


@pytest.mark.parametrize("n_tp", [2, 8])
def test_tp_flagship_matches_single_device(n_tp):
    dep = _deployed(scale=4)
    tp = TPFastUpscaler(dep, make_mesh(n_data=1, n_tile=n_tp),
                        dtype=jnp.float32)
    u8 = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (2, 12, 12, 3), dtype=np.uint8))
    a = np.asarray(dep(u8))
    b = np.asarray(tp(u8))
    assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1


def test_tp_through_tiled_engine():
    """rs.py --tp_devices path: the TP wrapper drops into TiledUpscaler and
    the tiled output equals the single-device tiled output."""
    dep = _deployed(scale=2)
    tp = TPFastUpscaler(dep, make_mesh(n_data=1, n_tile=4),
                        dtype=jnp.float32)
    img = np.random.default_rng(1).integers(0, 255, (40, 56, 3),
                                            dtype=np.uint8)
    single = TiledUpscaler(dep, window=16, overlap=4, batch_size=4)
    sharded = TiledUpscaler(tp, window=16, overlap=4, batch_size=4)
    a = single.upscale_image(img)
    b = sharded.upscale_image(img)
    assert a.shape == b.shape == (80, 112, 3)
    assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1


def test_tp_rejects_sr_family_and_bad_width():
    spec = DeploySpec(family="sr", depth=1, width=8, scale=2)
    m = spec.build_model(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    dep = DeployedModel(spec, v["params"], dtype=jnp.float32)
    with pytest.raises(ValueError, match="fast families"):
        TPFastUpscaler(dep, make_mesh(n_data=1, n_tile=2))

    with pytest.raises(ValueError, match="divide"):
        TPFastUpscaler(_deployed(width=12), make_mesh(n_data=1, n_tile=8))


def _deployed_spec(spec, init_hw=8, dtype=jnp.float32):
    m = spec.build_model(dtype=dtype)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, init_hw, init_hw, 3)))
    return DeployedModel(spec, v["params"], dtype=dtype)


def test_tp_refine_tail_matches_single_device():
    """The full-res refinement tail (models/fast.py refine_blocks — the
    quality-gated x1 throughput config) shards: row-parallel projection,
    col/row refine blocks, replicated 3-channel tail."""
    dep = _deployed_spec(DeploySpec(family="fast", depth=2, width=16, scale=2,
                                    refine_blocks=2, refine_width=8))
    tp = TPFastUpscaler(dep, make_mesh(n_data=1, n_tile=4),
                        dtype=jnp.float32)
    u8 = jnp.asarray(np.random.default_rng(3).integers(
        0, 255, (2, 12, 12, 3), dtype=np.uint8))
    a = np.asarray(dep(u8))
    b = np.asarray(tp(u8))
    assert a.shape == b.shape
    assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1


def test_tp_denoise_fast_downshuffle_matches_single_device():
    """The denoise_fast x1 graph with the sub-pixel front (downshuffle 2)
    TP-serves, including the edge-pad path (input not a multiple of f)."""
    dep = _deployed_spec(DeploySpec(family="denoise_fast", depth=2, width=16,
                                    scale=1, downshuffle=2))
    tp = TPFastUpscaler(dep, make_mesh(n_data=1, n_tile=4),
                        dtype=jnp.float32)
    u8 = jnp.asarray(np.random.default_rng(4).integers(
        0, 255, (2, 13, 11, 3), dtype=np.uint8))  # odd: exercises edge-pad
    a = np.asarray(dep(u8))
    b = np.asarray(tp(u8))
    assert a.shape == b.shape == (2, 13, 11, 3)
    assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1


def test_tp_denoise_fast_refine_matches_single_device():
    """The quality-gated x1 config (downshuffle 2 + refine tail) — the
    exact preset PERF.md steers throughput users toward — TP-serves."""
    dep = _deployed_spec(DeploySpec(family="denoise_fast", depth=2, width=16,
                                    scale=1, downshuffle=2,
                                    refine_blocks=2, refine_width=8))
    tp = TPFastUpscaler(dep, make_mesh(n_data=1, n_tile=2),
                        dtype=jnp.float32)
    u8 = jnp.asarray(np.random.default_rng(5).integers(
        0, 255, (1, 16, 16, 3), dtype=np.uint8))
    a = np.asarray(dep(u8))
    b = np.asarray(tp(u8))
    assert a.shape == b.shape
    assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1


def test_tp_rejects_indivisible_refine_width():
    spec = DeploySpec(family="fast", depth=1, width=16, scale=2,
                      refine_blocks=1, refine_width=6)
    dep = _deployed_spec(spec)
    with pytest.raises(ValueError, match="refine width"):
        TPFastUpscaler(dep, make_mesh(n_data=1, n_tile=4))


def test_tp_param_specs_cover_param_tree():
    """The spec tree must mirror the fused param tree leaf-for-leaf (a
    missing entry would silently replicate a kernel that should be
    sharded, or fail the device_put with an opaque structure error)."""
    from jax.sharding import PartitionSpec as P

    dep = _deployed(depth=3)
    specs = tp_fast_param_specs(3)
    assert jax.tree_util.tree_structure(dep.params) == \
        jax.tree_util.tree_structure(
            specs, is_leaf=lambda v: isinstance(v, P))


def test_tp_bf16_matches_bf16_deployed():
    """The production dtype: TP in bf16 agrees with the bf16 deployed graph
    within 1 uint8 LSB."""
    dep = _deployed(scale=2, dtype=jnp.bfloat16)
    tp = TPFastUpscaler(dep, make_mesh(n_data=1, n_tile=4))
    u8 = jnp.asarray(np.random.default_rng(2).integers(
        0, 255, (1, 16, 16, 3), dtype=np.uint8))
    a = np.asarray(dep(u8))
    b = np.asarray(tp(u8))
    assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1
