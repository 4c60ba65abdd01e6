"""Inference engine tests: tiling exactness, deploy artifact round trip,
spatial halo-exchange sharding, StableHLO export."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_super_resolution_tpu.data.transforms import normalize, tanh_to_uint8
from image_super_resolution_tpu.infer.tiling import plan_tiles, upscale_tiled
from image_super_resolution_tpu.models import SRGenerator
from image_super_resolution_tpu.models.deploy import (
    DeployedModel,
    DeploySpec,
    build_deployed,
    load_artifact,
    save_artifact,
)


def small_deployed(scale=2, depth=1, width=8):
    spec = DeploySpec(family="sr", depth=depth, width=width, scale=scale)
    model = spec.build_model(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    return DeployedModel(spec, variables["params"], dtype=jnp.float32)


def test_plan_tiles_covers_image():
    positions, stride, ph, pw = plan_tiles(100, 70, window=48, overlap=8)
    assert stride == 32
    ys = {y for y, _ in positions}
    xs = {x for _, x in positions}
    assert max(ys) + 48 <= ph and max(xs) + 48 <= pw
    assert ph >= 100 + 16 and pw >= 70 + 16


def test_tiled_equals_whole_image_given_enough_overlap():
    """With overlap >= receptive field, tiled == whole away from borders."""
    deployed = small_deployed(scale=2, depth=1, width=8)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (72, 88, 3), dtype=np.uint8)

    whole = np.asarray(deployed(jnp.asarray(image[None])))[0]
    # depth-1 receptive field radius ~23 px; use overlap 24.
    tiled = upscale_tiled(deployed, image, window=64, overlap=24, batch_size=4)
    assert tiled.shape == whole.shape == (144, 176, 3)
    r = 24 * 2  # crop the border where padding policies differ (reflect vs zero)
    np.testing.assert_array_equal(tiled[r:-r, r:-r], whole[r:-r, r:-r])


def denoise_fast_deployed(depth=1, width=8, downshuffle=2):
    spec = DeploySpec(family="denoise_fast", depth=depth, width=width,
                      downshuffle=downshuffle)
    model = spec.build_model(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    return DeployedModel(spec, variables["params"], dtype=jnp.float32)


def test_denoise_fast_tiled_equals_whole_image_when_grid_aligned():
    """The downshuffle model is translation-variant with period f; the
    engine's geometry rule (window/overlap multiples of f) keeps every tile
    on phase 0 of the space_to_depth grid, so tiled == whole away from
    borders — exactly like the shift-invariant families."""
    deployed = denoise_fast_deployed()
    rng = np.random.default_rng(5)
    image = rng.integers(0, 255, (72, 88, 3), dtype=np.uint8)
    whole = np.asarray(deployed(jnp.asarray(image[None])))[0]
    # depth-1 half-res receptive radius ~5 => 10 full-res px; overlap 12
    tiled = upscale_tiled(deployed, image, window=32, overlap=12,
                          batch_size=4, grid=2)
    assert tiled.shape == whole.shape == (72, 88, 3)
    r = 24
    np.testing.assert_array_equal(tiled[r:-r, r:-r], whole[r:-r, r:-r])


def test_denoise_fast_engine_rejects_grid_misaligned_geometry():
    """Odd window/overlap would compute adjacent tiles on different
    space_to_depth phases (visible seams); spatial band sharding cannot hold
    the grid at all. The ENGINE enforces all of it (library callers too)."""
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    deployed = denoise_fast_deployed()
    with pytest.raises(ValueError, match="downshuffle"):
        TiledUpscaler(deployed, window=47, overlap=4)
    with pytest.raises(ValueError, match="downshuffle"):
        TiledUpscaler(deployed, window=48, overlap=13)
    with pytest.raises(ValueError, match="downshuffle"):
        TiledUpscaler(deployed, spatial_devices=2)
    with pytest.raises(ValueError, match="downshuffle"):
        TiledUpscaler(deployed, spatial_grid=(2, 1))
    # aligned geometry constructs fine, small-image window shrink included
    eng = TiledUpscaler(deployed, window=48, overlap=12)
    img = np.random.default_rng(6).integers(0, 255, (9, 9, 3), np.uint8)
    out = eng.upscale_image(img)  # window shrink rounds back onto the grid
    assert out.shape == (9, 9, 3)


def test_denoise_fast_stablehlo_polymorphic_export(tmp_path):
    """Polymorphic export of a downshuffle artifact: dims are constrained
    to multiples of f (the internal odd-size pad cannot stay symbolic), and
    the exported program matches the native one on divisible shapes."""
    from jax import export as jax_export

    from image_super_resolution_tpu.models.deploy import export_stablehlo

    deployed = denoise_fast_deployed()
    path = tmp_path / "dn_dyn.hlo"
    export_stablehlo(deployed, 1, 16, 16, path, polymorphic=True)
    rebuilt = jax_export.deserialize(path.read_bytes())
    rng = np.random.default_rng(7)
    for shape in [(1, 16, 16, 3), (2, 24, 20, 3)]:
        x = jnp.asarray(rng.integers(0, 255, shape, dtype=np.uint8))
        np.testing.assert_array_equal(np.asarray(rebuilt.call(x)),
                                      np.asarray(deployed(x)))


def test_tiled_zero_overlap_reference_mode():
    deployed = small_deployed(scale=2)
    image = np.random.default_rng(1).integers(0, 255, (50, 60, 3), dtype=np.uint8)
    out = upscale_tiled(deployed, image, window=32, overlap=0, batch_size=4)
    assert out.shape == (100, 120, 3)
    whole = np.asarray(deployed(jnp.asarray(image[None])))[0]
    # interior of the first tile must match exactly (same computation)
    np.testing.assert_array_equal(out[20:40, 20:40], whole[20:40, 20:40])


def test_scale_autodetect_x1():
    """x1 (denoise-like) artifacts keep working, as rs.py:98-102 intended."""
    deployed = small_deployed(scale=1)
    image = np.random.default_rng(2).integers(0, 255, (40, 40, 3), dtype=np.uint8)
    out = upscale_tiled(deployed, image, window=32, overlap=4, batch_size=2)
    assert out.shape == image.shape


def test_deploy_artifact_roundtrip(tmp_path):
    from image_super_resolution_tpu.train import build_optimizer, create_train_state
    from image_super_resolution_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    model = SRGenerator(depth=1, width=8, scale=2, dtype=jnp.float32)
    tx = build_optimizer(total_steps=10)
    state = create_train_state(model, (1, 16, 16, 3), tx, jax.random.PRNGKey(0))
    ck = tmp_path / "res.ckpt"
    save_checkpoint(ck, state, 0, mean=[0.4, 0.5, 0.6], std=[0.2, 0.25, 0.3])

    spec = DeploySpec(family="sr", depth=1, width=8, scale=2)
    deployed, fused = build_deployed(load_checkpoint(ck), spec, dtype=jnp.float32)
    assert deployed.spec.mean == (0.4, 0.5, 0.6)  # baked from checkpoint meta

    x = jnp.asarray(np.random.default_rng(0).integers(0, 255, (1, 16, 16, 3),
                                                      dtype=np.uint8))
    out1 = deployed(x)
    assert out1.dtype == jnp.uint8 and out1.shape == (1, 32, 32, 3)

    path = tmp_path / "model.isr"
    save_artifact(path, deployed.spec, fused)
    reloaded = load_artifact(path, dtype=jnp.float32)
    out2 = reloaded(x)
    # fp16 storage quantization can flip borderline pixels by 1.
    diff = np.abs(out1.astype(np.int32) - out2.astype(np.int32))
    assert int(diff.max()) <= 1


def test_spatial_apply_matches_single_device():
    from image_super_resolution_tpu.core.mesh import make_mesh
    from image_super_resolution_tpu.parallel.spatial import spatial_apply

    model = SRGenerator(depth=1, width=8, scale=2, enchant=True, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = variables["params"]

    def net_apply(p, x):
        return model.apply({"params": p}, x)

    mesh = make_mesh(n_data=1, n_tile=4)
    rng = np.random.default_rng(3)
    image = jnp.asarray(rng.uniform(-1, 1, (1, 80, 32, 3)).astype(np.float32))

    out_sp = np.asarray(spatial_apply(net_apply, params, image, mesh, halo=16, scale=2))
    out_single = np.asarray(net_apply(params, image))
    assert out_sp.shape == out_single.shape == (1, 160, 64, 3)
    # identical away from the top/bottom borders (reflect halo vs conv zero-pad)
    r = 16 * 2
    np.testing.assert_allclose(
        out_sp[:, r:-r], out_single[:, r:-r], rtol=1e-5, atol=1e-5
    )


def test_spatial_reflect_matches_whole_image_reflect_pad():
    """Unified border convention (VERDICT #8): with halo >= the receptive
    field, spatial_apply is equivalent to running the net once on the
    np.pad(mode='reflect')-padded whole image and cropping — i.e. the spatial
    path's mesh-edge halos now use true numpy reflect semantics."""
    from image_super_resolution_tpu.core.mesh import make_mesh
    from image_super_resolution_tpu.parallel.spatial import spatial_apply

    model = SRGenerator(depth=1, width=8, scale=2, enchant=True, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = variables["params"]

    def net_apply(p, x):
        return model.apply({"params": p}, x)

    halo = 28  # > ~23 px receptive-field radius of the depth-1 net
    mesh = make_mesh(n_data=1, n_tile=4)
    rng = np.random.default_rng(7)
    image = rng.uniform(-1, 1, (1, 120, 24, 3)).astype(np.float32)

    out_sp = np.asarray(
        spatial_apply(net_apply, params, jnp.asarray(image), mesh,
                      halo=halo, scale=2)
    )
    padded = np.pad(image, ((0, 0), (halo, halo), (0, 0), (0, 0)),
                    mode="reflect")
    whole = np.asarray(net_apply(params, jnp.asarray(padded)))
    want = whole[:, halo * 2 : (halo + 120) * 2]
    np.testing.assert_allclose(out_sp, want, rtol=0, atol=1e-5)


def test_spatial_engine_runs_optimized_artifact():
    """Round-1 bug: TiledUpscaler's spatial path rebuilt the STANDARD graph
    but applied the OPTIMIZED params (default export), crashing with
    ScopeParamNotFoundError. It must use deployed.model and agree with
    whole-image inference away from borders."""
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    deployed = small_deployed(scale=2, depth=1, width=8)
    assert deployed.optimized  # the default export path — the one that broke
    rng = np.random.default_rng(11)
    image = rng.integers(0, 255, (96, 40, 3), dtype=np.uint8)

    whole = TiledUpscaler(deployed, window=0).upscale_image(image)
    sp = TiledUpscaler(deployed, overlap=28, spatial_devices=4).upscale_image(image)
    assert sp.shape == whole.shape == (192, 80, 3)
    r = 28 * 2  # borders differ: reflect halo vs conv zero-pad
    diff = np.abs(sp[r:-r].astype(np.int32) - whole[r:-r].astype(np.int32))
    assert int(diff.max()) <= 1


def test_stablehlo_export_roundtrip(tmp_path):
    from jax import export as jax_export

    from image_super_resolution_tpu.models.deploy import export_stablehlo

    deployed = small_deployed(scale=2)
    path = tmp_path / "model.hlo"
    export_stablehlo(deployed, 1, 16, 16, path)
    rebuilt = jax_export.deserialize(path.read_bytes())
    x = jnp.asarray(np.random.default_rng(0).integers(0, 255, (1, 16, 16, 3),
                                                      dtype=np.uint8))
    want = np.asarray(deployed(x))
    got = np.asarray(rebuilt.call(x))
    np.testing.assert_array_equal(got, want)


def test_stablehlo_polymorphic_export_serves_any_shape(tmp_path):
    """Dynamic-axis export (the reference's ONNX {2:'x',3:'x'} analog,
    utils/models.py:803-812): one serialized program, any N/H/W."""
    from jax import export as jax_export

    from image_super_resolution_tpu.models.deploy import export_stablehlo

    deployed = small_deployed(scale=2)
    path = tmp_path / "model_dyn.hlo"
    export_stablehlo(deployed, 1, 16, 16, path, polymorphic=True)
    rebuilt = jax_export.deserialize(path.read_bytes())
    rng = np.random.default_rng(0)
    for shape in [(1, 16, 16, 3), (2, 24, 20, 3)]:
        x = jnp.asarray(rng.integers(0, 255, shape, dtype=np.uint8))
        got = np.asarray(rebuilt.call(x))
        want = np.asarray(deployed(x))
        assert got.shape == (shape[0], shape[1] * 2, shape[2] * 2, 3)
        np.testing.assert_array_equal(got, want)


def test_tf_saved_model_export_bit_exact(tmp_path):
    """jax2tf SavedModel export (the non-JAX consumer path, gated on TF):
    dynamic dims, bit-exact vs the native deployed artifact."""
    tf = pytest.importorskip("tensorflow")

    from image_super_resolution_tpu.models.deploy import export_tf_saved_model

    deployed = small_deployed(scale=2)
    out = tmp_path / "savedmodel"
    export_tf_saved_model(deployed, out)
    reloaded = tf.saved_model.load(str(out))
    rng = np.random.default_rng(0)
    for shape in [(1, 16, 16, 3), (2, 20, 24, 3)]:
        x = rng.integers(0, 256, shape, dtype=np.uint8)
        got = reloaded.f(tf.constant(x)).numpy()
        want = np.asarray(deployed(jnp.asarray(x)))
        np.testing.assert_array_equal(got, want)


def test_tf_saved_model_export_widens_bf16_params_to_fp32(tmp_path):
    """DeployedModel commits its params in the bf16 compute dtype for the
    non-optimized families (serving speed); the SavedModel export must
    widen them back to fp32 — tf2onnx→onnxruntime-CPU and TFLite have no
    bf16 Conv kernels, so a bf16 SavedModel is unusable downstream. The
    graph casts to bf16 internally either way, so outputs are unchanged."""
    tf = pytest.importorskip("tensorflow")

    from image_super_resolution_tpu.models.deploy import (
        DeployedModel,
        DeploySpec,
        export_tf_saved_model,
    )

    spec = DeploySpec(family="fast", depth=2, width=16, scale=2)
    model = spec.build_model()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    deployed = DeployedModel(spec, variables["params"])
    # precondition: the committed serving params really are bf16 (otherwise
    # this test no longer guards anything)
    assert any(
        leaf.dtype == jnp.bfloat16
        for leaf in jax.tree_util.tree_leaves(deployed.params)
    )
    out = tmp_path / "savedmodel_fast"
    export_tf_saved_model(deployed, out)
    reloaded = tf.saved_model.load(str(out))

    bf16_enum = tf.bfloat16.as_datatype_enum
    for cf in reloaded.f.concrete_functions:
        assert not any(t.dtype == tf.bfloat16 for t in cf.captured_inputs)
        for node in cf.graph.as_graph_def().node:
            for attr in node.attr.values():
                assert attr.type != bf16_enum
                assert bf16_enum not in attr.list.type

    x = np.random.default_rng(0).integers(0, 256, (1, 12, 12, 3), np.uint8)
    got = reloaded.f(tf.constant(x)).numpy()
    want = np.asarray(deployed(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_whole_image_oom_falls_back_to_tiling():
    """window=0 on an image too large for HBM degrades to overlap tiling
    instead of crashing (observed: 2048^2 x4 16-RRDB exhausts a 16 GB chip)."""
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    deployed = small_deployed(scale=2)

    class OOMOnce:
        def __init__(self, inner):
            self._inner = inner
            self.calls = 0
            self.spec = inner.spec

        def __call__(self, x):
            self.calls += 1
            if self.calls == 1:
                from image_super_resolution_tpu.infer.engine import (
                    _xla_runtime_errors,
                )

                raise _xla_runtime_errors()[0](
                    "RESOURCE_EXHAUSTED: Out of memory in HBM"
                )
            return self._inner(x)

    wrapped = OOMOnce(deployed)
    up = TiledUpscaler(wrapped, window=0, overlap=8, batch_size=4)
    img = np.random.default_rng(0).integers(0, 255, (100, 80, 3), dtype=np.uint8)
    out = up.upscale_image(img)
    assert out.shape == (200, 160, 3)
    assert wrapped.calls > 1  # fallback actually tiled


def test_whole_image_non_xla_error_is_not_misread_as_oom():
    """A generic Python error that merely QUOTES the OOM strings must
    propagate, not silently latch the engine into tiling mode."""
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    deployed = small_deployed(scale=2)

    class Broken:
        spec = deployed.spec

        def __call__(self, x):
            raise RuntimeError("config parse failed near 'Out of memory'")

    up = TiledUpscaler(Broken(), window=0, overlap=8, batch_size=4)
    img = np.zeros((32, 32, 3), np.uint8)
    with pytest.raises(RuntimeError, match="config parse failed"):
        up.upscale_image(img)
    assert up.window == 0  # fallback NOT latched


def test_data_axis_sharded_serving_matches_single_device():
    """Multi-chip serving (--data_devices): tile batches (upscale_image) and
    frame batches (upscale_batch, incl. the non-divisible padding path) split
    over the data mesh axis must be bitwise identical to single-device."""
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    deployed = small_deployed(scale=2)
    rng = np.random.default_rng(7)
    image = rng.integers(0, 255, (72, 88, 3), dtype=np.uint8)
    single = TiledUpscaler(deployed, window=32, overlap=4, batch_size=8)
    multi = TiledUpscaler(deployed, window=32, overlap=4, batch_size=8,
                          data_devices=8)
    assert multi._data_sharding is not None and multi.batch_size == 8
    np.testing.assert_array_equal(
        multi.upscale_image(image), single.upscale_image(image)
    )
    frames = rng.integers(0, 255, (9, 24, 24, 3), dtype=np.uint8)  # 9 % 8 != 0
    np.testing.assert_array_equal(
        multi.upscale_batch(frames), single.upscale_batch(frames)
    )


def test_data_axis_rounds_batch_and_rejects_spatial_combo():
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    deployed = small_deployed(scale=2)
    eng = TiledUpscaler(deployed, batch_size=6, data_devices=4)
    assert eng.batch_size == 8  # rounded up to a multiple of data_devices
    with pytest.raises(ValueError, match="mutually exclusive"):
        TiledUpscaler(deployed, spatial_devices=2, data_devices=2)


def test_data_axis_zero_means_all_local_devices():
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    deployed = small_deployed(scale=2)
    eng = TiledUpscaler(deployed, batch_size=8, data_devices=0)
    assert eng.data_devices == jax.local_device_count()


def test_spatial_2d_matches_whole_image_reflect_pad():
    """2-D (tile_y, tile_x) spatial parallelism: with halo >= the receptive
    field, the 2x4-grid sharded output (row AND column halo exchange, corner
    halos via exchange ordering) equals the whole-image reflect-padded run."""
    from image_super_resolution_tpu.core.mesh import make_spatial_mesh
    from image_super_resolution_tpu.parallel.spatial import spatial_apply_2d

    model = SRGenerator(depth=1, width=8, scale=2, enchant=True, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = variables["params"]

    def net_apply(p, x):
        return model.apply({"params": p}, x)

    halo = 28  # > ~23 px receptive-field radius of the depth-1 net
    mesh = make_spatial_mesh(2, 4)
    rng = np.random.default_rng(9)
    image = rng.uniform(-1, 1, (1, 64, 128, 3)).astype(np.float32)

    out_sp = np.asarray(
        spatial_apply_2d(net_apply, params, jnp.asarray(image), mesh,
                         halo=halo, scale=2)
    )
    padded = np.pad(image, ((0, 0), (halo, halo), (halo, halo), (0, 0)),
                    mode="reflect")
    whole = np.asarray(net_apply(params, jnp.asarray(padded)))
    want = whole[:, halo * 2 : (halo + 64) * 2, halo * 2 : (halo + 128) * 2]
    assert out_sp.shape == want.shape == (1, 128, 256, 3)
    np.testing.assert_allclose(out_sp, want, rtol=0, atol=1e-5)


def test_spatial_2d_engine_runs_optimized_artifact():
    """--spatial_grid on a default-exported (optimized) SR artifact agrees
    with whole-image inference away from borders."""
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    deployed = small_deployed(scale=2, depth=1, width=8)
    assert deployed.optimized
    rng = np.random.default_rng(13)
    image = rng.integers(0, 255, (96, 88, 3), dtype=np.uint8)

    whole = TiledUpscaler(deployed, window=0).upscale_image(image)
    sp = TiledUpscaler(deployed, overlap=28,
                       spatial_grid=(2, 4)).upscale_image(image)
    assert sp.shape == whole.shape == (192, 176, 3)
    r = 28 * 2  # borders differ: reflect halo vs conv zero-pad
    diff = np.abs(sp[r:-r, r:-r].astype(np.int32)
                  - whole[r:-r, r:-r].astype(np.int32))
    assert int(diff.max()) <= 1


def test_spatial_small_image_raises_clear_error():
    """Images too small for the grid+halo must fail with a clear message,
    not a deep np.pad reflect crash (silently skipped in folder mode)."""
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    deployed = small_deployed(scale=2)
    eng = TiledUpscaler(deployed, overlap=8, spatial_grid=(2, 2))
    with pytest.raises(ValueError, match="too small"):
        eng.upscale_image(np.zeros((8, 8, 3), np.uint8))
    eng1d = TiledUpscaler(deployed, overlap=8, spatial_devices=4)
    with pytest.raises(ValueError, match="too small"):
        eng1d.upscale_image(np.zeros((8, 200, 3), np.uint8))


def test_spatial_grid_rejects_nonpositive():
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    deployed = small_deployed(scale=2)
    with pytest.raises(ValueError, match=">= 1"):
        TiledUpscaler(deployed, spatial_grid=(0, 2))
    with pytest.raises(ValueError, match=">= 1"):
        TiledUpscaler(deployed, spatial_grid=(-2, -2))
    # (1, 1) is a no-op grid -> plain single-device path
    assert TiledUpscaler(deployed, spatial_grid=(1, 1)).spatial_grid is None


def test_tiling_fuzz_shapes():
    """Random (h, w, window, overlap, batch) combinations must produce the
    right output geometry without crashing — guards the padded-grid
    arithmetic against off-by-ones that only bite at unusual sizes (pixel
    correctness vs the whole image is covered separately by
    test_tiled_equals_whole_image_given_enough_overlap)."""
    deployed = small_deployed(scale=2)
    rng = np.random.default_rng(41)
    for _ in range(8):
        h = int(rng.integers(20, 90))
        w = int(rng.integers(20, 90))
        window = int(rng.integers(16, 56))
        overlap = int(rng.integers(0, (window - 1) // 2))
        batch = int(rng.integers(1, 6))
        image = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        out = upscale_tiled(deployed, image, window=window, overlap=overlap,
                            batch_size=batch)
        assert out.shape == (2 * h, 2 * w, 3), (h, w, window, overlap, batch)


def test_build_deployed_no_ema_checkpoint_folds_real_bn_stats():
    """EMA fallbacks move together: a checkpoint with only params +
    batch_stats (no EMA) must fold its REAL running stats under the
    default use_ema=True, not crash or fold empty stats."""
    spec = DeploySpec(family="sr", depth=1, width=8, scale=2)
    model = SRGenerator(depth=1, width=8, scale=2, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    # perturb the BN running stats away from init so folding them matters
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) + jnp.asarray(
            rng.uniform(0.1, 0.5, a.shape), a.dtype),
        v["batch_stats"],
    )
    ckpt = {"params": jax.device_get(v["params"]),
            "batch_stats": jax.device_get(stats), "meta": {}}
    deployed, _ = build_deployed(ckpt, spec, use_ema=True, dtype=jnp.float32)
    u8 = jnp.asarray(rng.integers(0, 255, (1, 8, 8, 3), dtype=np.uint8))
    got = np.asarray(deployed(u8))
    # ground truth: run the UNFUSED model with those stats
    want_tanh = model.apply(
        {"params": v["params"], "batch_stats": stats},
        __import__("image_super_resolution_tpu.data.transforms",
                   fromlist=["normalize"]).normalize(
            u8, spec.mean, spec.std),
    )
    from image_super_resolution_tpu.data.transforms import tanh_to_uint8

    want = np.asarray(tanh_to_uint8(want_tanh))
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1


def test_engine_rejects_bad_overlap_geometry_at_construction():
    """overlap >= window/2 (and negative overlap) must fail when the engine
    is built — folder-batch mode would otherwise downgrade the plan_tiles
    error to a per-image 'skipping' warning."""
    from image_super_resolution_tpu.infer.engine import TiledUpscaler

    deployed = small_deployed(scale=2)
    with pytest.raises(ValueError, match="overlap"):
        TiledUpscaler(deployed, window=16, overlap=8)
    with pytest.raises(ValueError, match="overlap"):
        TiledUpscaler(deployed, window=16, overlap=-1)
    TiledUpscaler(deployed, window=16, overlap=7)  # fine
    TiledUpscaler(deployed, window=0, overlap=8)   # whole-image: no window
