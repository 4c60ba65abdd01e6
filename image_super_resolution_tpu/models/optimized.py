"""MXU-optimized inference-only generator (exact rewrite of SRGenerator).

Two transformations over the fused (BN-folded) deployment graph, both exact
up to float reassociation — verified against the standard graph in tests:

1. every RDB in scatter form (ops/scatter.py): ~1.5x on the trunk;
2. the 9x9 HR tail conv folded through the final pixel shuffle into a
   5x5 conv with 12 output channels at pre-shuffle resolution
   (ops/fold_tail.py): ~3.4x on the tail.

The last Upsampler's act commutes with depth_to_space, so its shuffle is
deferred: ... -> up_conv -> act -> folded_tail -> tanh -> d2s.

Training always uses models/generator.py (reference-layout checkpoints);
``optimize_generator_params`` converts fused standard params to this layout
at export/load time.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import apply_act
from ..ops.conv import ConvBlock
from ..ops.fold_tail import fold_tail_params
from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.scatter import ScatterRDB, rdb_params_to_scatter
from ..ops.blocks import Upsampler


class ScatterRRDB(nn.Module):
    """3 x ScatterRDB with the RRDB residual scale-add (utils/models.py:316-317)."""

    features: int = 64
    add_rate: float = 0.2
    wino_m: int = 0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for j in range(3):
            h = ScatterRDB(
                self.features, ("leaky_relu", 0.01), self.add_rate,
                wino_m=self.wino_m, dtype=self.dtype, name=f"rdb{j}",
            )(h)
        return h * jnp.asarray(self.add_rate, x.dtype) + x


class _DeferredShuffleUp(nn.Module):
    """Last x2 stage with its shuffle deferred past the tail: conv + act only.

    Param layout matches ops/blocks.Upsampler (``conv`` ConvBlock child) so
    no weight change is needed."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ConvBlock(self.features * 4, 3, act=None, use_bn=False,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name="conv")(x)
        return apply_act(x, ("leaky_relu", 0.01))


class _StridedTail(nn.Module):
    """6x6 stride-2 conv — the double-folded x4 tail (ops/fold_tail.py)."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            features=self.features, kernel_size=(6, 6), strides=(2, 2),
            padding=((2, 2), (2, 2)), dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv",
        )(x)


class OptimizedSRGenerator(nn.Module):
    """Fused, scatter-form, tail-folded generator. Inference only."""

    depth: int = 16
    add_rate: float = 0.2
    scale: int = 2
    width: int = 64
    enchant: bool = False
    wino_m: int = 0  # 0 = direct conv; 2 = Winograd F(2,3) trunk convs
    tail_fold: int = 1  # 1 = fold through last shuffle; 2 = both (x4 only)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.scale not in (2, 4):
            raise ValueError("optimized generator supports scale 2 or 4")
        head_act = ("leaky_relu", 0.01 if self.enchant else 0.2)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        x = ConvBlock(self.width, 9, act=head_act, use_bn=False, name="head", **kw)(x)
        h = x
        for i in range(self.depth):
            h = ScatterRRDB(self.width, self.add_rate, wino_m=self.wino_m,
                            dtype=self.dtype, name=f"rrdb{i}")(h)
        h = ConvBlock(self.width, 3, act=None, use_bn=False, name="trunk_conv", **kw)(h)
        x = x + h
        # all but the last x2 stage run in full (conv -> d2s -> act)
        n_stages = self.scale // 2
        for i in range(n_stages - 1):
            x = Upsampler(self.width, 2, 3, act=("leaky_relu", 0.01),
                          name=f"up{i}", **kw)(x)
        # last stage: conv + act at pre-shuffle resolution (act commutes w/ d2s)
        x = _DeferredShuffleUp(self.width, name=f"up{n_stages - 1}", **kw)(x)
        if self.tail_fold == 2:
            if self.scale != 4:
                raise ValueError("tail_fold=2 needs two x2 stages (scale 4)")
            # tail folded through BOTH shuffles: 6x6 stride-2 at quarter
            # resolution, 48 outputs (ops/fold_tail.fold_tail_params_x4)
            x = _StridedTail(48, name="tail_folded2", **kw)(x)
            x = apply_act(x, "tanh")
            return pixel_shuffle(pixel_shuffle(x, 2), 2).astype(jnp.float32)
        # folded tail: 5x5, width*4 -> 12, then tanh, then the deferred shuffle
        x = ConvBlock(12, 5, act="tanh", use_bn=False, name="tail_folded", **kw)(x)
        return pixel_shuffle(x, 2).astype(jnp.float32)


def optimize_generator_params(
    fused: Dict[str, Any], wino_m: int = 0, tail_fold: int = 1
) -> Dict[str, Any]:
    """Fused standard SRGenerator params -> OptimizedSRGenerator params."""
    from ..ops.fold_tail import fold_tail_params_x4

    out: Dict[str, Any] = {}
    for name, node in fused.items():
        if name.startswith("rrdb"):
            out[name] = {
                rdb_name: rdb_params_to_scatter(rdb_node, wino_m=wino_m)
                for rdb_name, rdb_node in node.items()
            }
        elif name == "tail":
            if tail_fold == 2:
                out["tail_folded2"] = fold_tail_params_x4(node)
            else:
                out["tail_folded"] = fold_tail_params(node)
        else:
            out[name] = node
    return out
