"""Frozen deployment artifact: the TorchScript ``model.pt`` equivalent.

The reference export path (utils/models.py:764-813) loads the training
checkpoint's EMA weights into a ``Model`` wrapper whose graph bakes in the
dataset normalization and the tanh->uint8 decode (Normalize -> net ->
TanhToArrayImage, utils/models.py:731-732), folds BN into convs, and traces to
TorchScript + ONNX. The contract: **uint8 image in -> uint8 image out**, no
client-side pre/post-processing.

TPU-native equivalent:
- ``build_deployed`` takes a training checkpoint, picks the EMA weights,
  folds BN (ops/fuse.py), and returns a jitted uint8 NHWC -> uint8 NHWC
  apply function with normalization baked into the compiled program.
- ``save_artifact``/``load_artifact`` persist {spec JSON + fused fp16 params}
  as one msgpack file.
- ``export_stablehlo`` serializes the whole program with ``jax.export`` —
  the XLA-native analog of the TorchScript/ONNX artifact (runs under any
  PJRT runtime without this package's Python code).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from pathlib import Path
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD, normalize, tanh_to_uint8
from ..ops.fuse import fuse_conv_bn
from .denoiser import Denoiser
from .generator import SRGenerator


def family_defaults(family: str, rs_deep=None, width=None) -> Tuple[int, int]:
    """Resolve (depth, width) CLI defaults per model family.

    The reference CLI default ``--rs_deep 16`` / width 64 applies to the
    reference families; the "fast" flagship preset (and its "denoise_fast"
    sibling) is depth 14 / width 128 — the MXU-aligned configuration benched
    in PERF.md. Explicit flags always win.
    """
    fast = family in ("fast", "denoise_fast")
    if rs_deep is None:
        rs_deep = 14 if fast else 16
    if width is None:
        width = 128 if fast else 64
    return rs_deep, width


def infer_family_dims(params, family: str):
    """(depth, width) read from a checkpoint's param TREE, or (None, None).

    Exporting a non-default checkpoint without repeating --rs_deep/--width
    used to build a mismatched spec that failed deep inside the param
    restructure; the tree itself states both dims (trunk block count + head
    conv output channels), so the export CLI infers them when the flags are
    absent. Explicit flags always win."""
    # (prefix, blocks-per-depth-unit): Denoiser builds depth//2 res0_ blocks
    # (denoiser.py), so its key count is HALF the depth; LegacyDenoiser names
    # its depth blocks res0..res{d-1} ("res" would also match res0_/res1_/
    # res2_, but those never coexist with the legacy layout).
    prefixes = {"sr": ("rrdb", 1), "fast": ("block", 1),
                "denoise_fast": ("block", 1),
                "denoise": ("res0_", 2), "denoise_legacy": ("res", 1)}
    try:
        prefix, per_unit = prefixes[family]
        depth = per_unit * sum(1 for k in params
                               if str(k).startswith(prefix))
        width = int(params["head"]["conv"]["kernel"].shape[-1])
    except Exception:
        return None, None
    return (depth, width) if depth > 0 and width > 0 else (None, None)


def infer_downshuffle(params) -> int | None:
    """The fast graph's sub-pixel front factor, read from the checkpoint:
    the head conv sees 3*f^2 input channels (models/fast.py), so the tree
    itself states f. None when the tree doesn't look like a fast family."""
    try:
        cin = int(params["head"]["conv"]["kernel"].shape[2])
    except Exception:
        return None
    if cin % 3:
        return None
    f = round((cin // 3) ** 0.5)
    return f if 3 * f * f == cin else None


def infer_refine(params) -> Tuple[int, int]:
    """(refine_blocks, refine_width) read from a fast-family checkpoint.

    The refinement tail (models/fast.py) leaves its own fingerprint in the
    tree: a ``refine_proj`` conv plus ``refine0..refine{k-1}`` blocks, and a
    tail conv whose INPUT width is the refine width. (0, 32) — the spec
    defaults — when the tree has no refinement stage."""
    if not isinstance(params, dict) or "refine_proj" not in params:
        return 0, 32
    blocks = sum(1 for k in params
                 if str(k).startswith("refine") and str(k)[6:].isdigit())
    width = int(params["tail"]["conv"]["kernel"].shape[2])
    return blocks, width


@dataclass(frozen=True)
class DeploySpec:
    """Everything needed to rebuild the inference graph."""

    family: str = "sr"  # "sr" | "fast" | "denoise" | "denoise_fast" | "denoise_legacy"
    depth: int = 16
    width: int = 64
    add_rate: float = 0.2
    scale: int = 2
    enchant: bool = False
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD
    hidden: int = 0  # denoise_legacy residual bottleneck width (0 = 32)
    downshuffle: int = 1  # fast-family sub-pixel front factor (denoise_fast: 2)
    # fast-family full-res refinement tail (models/fast.py): block count and
    # width. 0 blocks = the born-folded tail (every artifact before the
    # field existed); old .isr files deserialize to these defaults.
    refine_blocks: int = 0
    refine_width: int = 32

    def build_model(self, dtype=jnp.bfloat16):
        if self.family == "denoise":
            return Denoiser(depth=self.depth, width=self.width, fused=True, dtype=dtype)
        if self.family == "denoise_legacy":
            from .denoiser import LegacyDenoiser

            return LegacyDenoiser(
                depth=self.depth, width=self.width, hidden=self.hidden or 32,
                fused=True, dtype=dtype,
            )
        if self.family in ("fast", "denoise_fast"):
            # TPU-first flagship (models/fast.py): BN-free, born-folded tail
            # — the training graph is already the optimal serving graph, so
            # DeployedModel skips the optimize rewrite for these families.
            # denoise_fast is the same graph at 1/downshuffle internal
            # resolution with x1 output (output_scale).
            from .fast import FastSRGenerator

            return FastSRGenerator(
                depth=self.depth, add_rate=self.add_rate,
                scale=self.output_scale, width=self.width,
                # `or 1`, matching every other consumer of this field (the
                # export CLI infers the real factor from the checkpoint's
                # head conv, so artifacts always carry an explicit value)
                downshuffle=self.downshuffle or 1,
                refine_blocks=self.refine_blocks or 0,
                refine_width=self.refine_width or 32,
                fused=True, dtype=dtype,
            )
        return SRGenerator(
            depth=self.depth,
            add_rate=self.add_rate,
            scale=self.scale,
            width=self.width,
            enchant=self.enchant,
            fused=True,
            dtype=dtype,
        )

    @property
    def output_scale(self) -> int:
        return 1 if self.family.startswith("denoise") else self.scale


class DeployedModel:
    """uint8 NHWC -> uint8 NHWC compiled super-resolver.

    ``optimize=True`` (default for the SR family) rebuilds the graph in the
    MXU-efficient form — scatter-form dense blocks + tail folded through the
    final pixel shuffle (models/optimized.py) — an exact rewrite, ~2x faster
    on v5e. Artifacts always store the standard fused layout; the transform
    happens at construction.
    """

    def __init__(
        self,
        spec: DeploySpec,
        fused_params: Dict[str, Any],
        dtype=jnp.bfloat16,
        optimize: bool = True,
        wino_m: int = 0,
        tail_fold: int = 0,  # 0 = auto (2 for x4, 1 for x2)
    ):
        self.spec = spec
        self.optimized = bool(optimize and spec.family == "sr" and spec.scale in (2, 4))
        if self.optimized:
            from .optimized import OptimizedSRGenerator, optimize_generator_params

            if tail_fold == 0:
                tail_fold = 2 if spec.scale == 4 else 1
            self.params = optimize_generator_params(
                fused_params, wino_m=wino_m, tail_fold=tail_fold
            )
            self._model = OptimizedSRGenerator(
                depth=spec.depth, add_rate=spec.add_rate, scale=spec.scale,
                width=spec.width, enchant=spec.enchant, wino_m=wino_m,
                tail_fold=tail_fold, dtype=dtype,
            )
        else:
            self.params = fused_params
            self._model = spec.build_model(dtype)
        # Commit params to device once (numpy args would re-transfer every
        # call), pre-cast to the compute dtype for the non-optimized
        # families: measured +2% on the fast flagship (no per-call
        # round-to-bf16 of the params). The OPTIMIZED sr graph keeps fp32
        # inputs: its bf16-input variant measured 8% SLOWER (XLA loses the
        # convert fusion it was using to re-layout the scatter kernels and
        # inserts per-call copies instead — PERF.md, round-4 gap probes).
        commit_dtype = None if self.optimized else dtype
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, commit_dtype)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else
            jnp.asarray(x),
            self.params,
        )
        mean = tuple(float(v) for v in spec.mean)
        std = tuple(float(v) for v in spec.std)

        def apply(params, u8: jnp.ndarray) -> jnp.ndarray:
            x = normalize(u8, mean, std)
            y = self._model.apply({"params": params}, x)
            return tanh_to_uint8(y)

        self._apply = jax.jit(apply)

    def __call__(self, u8_batch: jnp.ndarray) -> jnp.ndarray:
        return self._apply(self.params, u8_batch)

    @property
    def model(self):
        """The flax module whose layout matches ``self.params`` — the
        OptimizedSRGenerator when ``optimize=True``, else the standard fused
        graph. Use this (never ``spec.build_model()``) to apply
        ``self.params`` manually, e.g. under a custom sharding."""
        return self._model

    @property
    def raw_apply(self) -> Callable:
        """(params, uint8) -> uint8, un-curried (for AOT export / sharding)."""
        return self._apply


# ------------------------------------------------------------ persistence --

def _to_fp16(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(np.float16)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else np.asarray(x),
        tree,
    )


def _to_fp32(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32)
        if getattr(x, "dtype", None) == np.float16
        else jnp.asarray(x),
        tree,
    )


def save_artifact(path: str | Path, spec: DeploySpec, fused_params: Dict[str, Any]) -> None:
    payload = {
        "spec": json.dumps(asdict(spec)),
        "params": _to_fp16(jax.device_get(fused_params)),
        "format_version": 1,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.msgpack_serialize(payload))


def load_artifact(path: str | Path, dtype=jnp.bfloat16) -> DeployedModel:
    payload = serialization.msgpack_restore(Path(path).read_bytes())
    spec_dict = json.loads(payload["spec"])
    spec_dict["mean"] = tuple(spec_dict["mean"])
    spec_dict["std"] = tuple(spec_dict["std"])
    spec = DeploySpec(**spec_dict)
    return DeployedModel(spec, _to_fp32(payload["params"]), dtype)


# ------------------------------------------------------------- building ----

def build_deployed(
    ckpt: Dict[str, Any],
    spec: DeploySpec,
    use_ema: bool = True,
    dtype=jnp.bfloat16,
) -> Tuple[DeployedModel, Dict[str, Any]]:
    """Training checkpoint -> fused DeployedModel (+ fused params).

    Mirrors the reference export: EMA weights preferred (utils/models.py:780),
    dataset mean/std baked from the checkpoint (781), BN folded (784).
    """
    # Chained fallbacks move TOGETHER: a no-EMA checkpoint that falls back
    # to raw params must also fall back to raw batch_stats, or every BN
    # folds with missing/empty running stats (same rule as the export CLI's
    # torch_state_dict path).
    use = use_ema and bool(ckpt.get("ema_params"))
    params = ckpt["ema_params"] if use else ckpt["params"]
    stats = (ckpt.get("ema_batch_stats") if use
             else ckpt.get("batch_stats", {})) or {}
    fused = fuse_conv_bn(params, stats)
    meta = ckpt.get("meta", {})
    if meta.get("mean") and meta.get("std"):
        spec = DeploySpec(**{**asdict(spec), "mean": tuple(meta["mean"]), "std": tuple(meta["std"])})
    model = DeployedModel(spec, jax.tree_util.tree_map(jnp.asarray, fused), dtype)
    return model, fused


def export_stablehlo(
    deployed: DeployedModel,
    batch: int,
    height: int,
    width: int,
    out_path: str | Path,
    polymorphic: bool = False,
) -> None:
    """Serialize the compiled program (StableHLO bytes) via jax.export.

    ``polymorphic=True`` exports with symbolic batch/height/width dims — the
    jax.export analog of the reference's dynamic-H/W ONNX axes
    (utils/models.py:803-812): one artifact serves any input size on any PJRT
    runtime. Static shapes compile ahead-of-time and skip per-shape
    specialization at load; pick per deployment.

    downshuffle>1 artifacts (denoise_fast) export with H/W constrained to
    multiples of the factor (symbolic ``f*h``): the internal edge-pad for
    odd sizes is data-dependent shape arithmetic jax.export cannot keep
    symbolic. Clients pad indivisible inputs (static-shape export accepts
    any size as before).
    """
    from jax import export as jax_export

    fn = jax.jit(lambda u8: deployed(u8))
    f = getattr(deployed.spec, "downshuffle", 1) or 1
    if polymorphic:
        dims = f"b, {f}*h, {f}*w" if f > 1 else "b, h, w"
        b, h, w = jax_export.symbolic_shape(dims)
        spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
    else:
        spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.uint8)
    exported = jax_export.export(fn)(spec)
    Path(out_path).write_bytes(exported.serialize())


def export_tf_saved_model(deployed: DeployedModel, out_dir: str | Path) -> None:
    """Export a TensorFlow SavedModel (uint8 [B,H,W,3] -> uint8, dynamic
    dims) via jax2tf — the non-JAX consumer story matching the reference's
    ONNX export (utils/models.py:803-812): a SavedModel feeds TF Serving,
    TFLite, and tf2onnx without any JAX at load time. Gated on tensorflow
    being importable; numerically bit-exact vs the native artifact
    (tests/test_infer.py).
    """
    import tensorflow as tf  # gated: raise cleanly if absent
    from jax.experimental import jax2tf

    # downshuffle>1 artifacts trace with H/W constrained to multiples of the
    # factor (same reason as export_stablehlo): indivisible inputs fail the
    # jax2tf shape assertion at TF runtime and must be padded by the client.
    f = getattr(deployed.spec, "downshuffle", 1) or 1
    img_shape = f"(b, {f}*h, {f}*w, 3)" if f > 1 else "(b, h, w, 3)"
    fn = jax2tf.convert(
        deployed.raw_apply,
        polymorphic_shapes=[None, img_shape],
        with_gradient=False,
    )
    def _const(a):
        a = np.asarray(a)
        # DeployedModel commits its params in the bf16 compute dtype for the
        # non-optimized families; SavedModel consumers (tf2onnx→onnxruntime
        # CPU, TFLite) have no bf16 Conv kernels, so widen the stored
        # weights back to fp32 — the traced graph casts to the compute
        # dtype internally either way, so the exported math is unchanged.
        if jnp.issubdtype(a.dtype, jnp.floating) and a.dtype != np.float32:
            a = a.astype(np.float32)
        return tf.constant(a)

    module = tf.Module()
    params_tf = jax.tree_util.tree_map(_const, deployed.params)
    module.f = tf.function(
        lambda x: fn(params_tf, x),
        input_signature=[tf.TensorSpec([None, None, None, 3], tf.uint8)],
        autograph=False,
    )
    tf.saved_model.save(module, str(out_dir))
