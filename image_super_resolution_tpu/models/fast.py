"""TPU-first flagship generator (``family="fast"``).

The reference topology (utils/models.py:592-618 — 16 RRDBs = 48 residual
dense blocks of 32-channel growth convs, two staged x2 sub-pixel upsamplers,
and a 9x9 tail conv at FULL output resolution) costs 1.57 MFLOP per output
pixel and keeps the MXU's 128 lanes 38-68% empty on every dense-block conv
(PERF.md's channel-tiling table). Measured on a v5e that caps the x4 model at
~74 MPix/s — 37% of the 200 MPix/s BASELINE.json north star, with Winograd
and int8 both measured dead as escapes.

This family is the architecture the hardware wants, re-designed rather than
translated:

- **128-wide trunk of plain residual blocks.** Every trunk conv is a 3x3
  128->128 contraction — zero padding waste on the 128x128 systolic array,
  and exactly the shape XLA's conv emitter was measured running at 128.5
  TFLOP/s (68% of matmul peak, scripts/bench_scan_trunk.py). No BN (BN-free
  residual trunks train better for SR — EDSR, arXiv:1707.02921 — and the
  training graph IS the deployment graph: nothing to fold).
- **~0.54 MFLOP per output pixel** (x4, depth 14): 3x fewer FLOPs than the
  reference at equal receptive-field budget, spent at full MXU utilization
  instead of 59%.
- **Born-folded tail.** One 3x3 conv to 3*scale^2 channels, tanh, then a
  single depth_to_space(scale) — the form ops/fold_tail.py has to REWRITE
  the reference tail into is this family's native training graph. No conv
  ever runs above LR resolution.

Same IO contract as SRGenerator (normalized float in, tanh [-1,1] out), so
the whole surrounding framework — pixel/GAN training, EMA, checkpointing,
export, tiled/spatial/data-parallel serving, eval — works unchanged.

Quality gate: scripts/flagship_quality_experiment.py trains this family and
the reference topology through the real CLI at an equal step budget on the
synthetic convergence benchmark; the table in PERF.md shows PSNR-Y parity is
met before the speed is claimed.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import ActSpec
from ..ops.conv import ConvBlock
from ..ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle


class FastResBlock(nn.Module):
    """conv3x3 -> act -> conv3x3, residual-scaled: x + add_rate * h.

    Both convs are features->features (128->128 at flagship width): the MXU
    sees only full-lane contractions. Residual scaling (EDSR-style) keeps the
    deep BN-free trunk stable at init.
    """

    features: int
    act: ActSpec = ("leaky_relu", 0.01)
    add_rate: float = 0.2
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(use_bn=False, dtype=self.dtype, param_dtype=self.param_dtype)
        h = ConvBlock(self.features, 3, act=self.act, name="conv0", **kw)(x, train)
        h = ConvBlock(self.features, 3, act=None, name="conv1", **kw)(h, train)
        return x + h * jnp.asarray(self.add_rate, h.dtype)


class FastSRGenerator(nn.Module):
    """MXU-aligned SR generator: head -> depth x FastResBlock -> global skip
    -> single sub-pixel tail. Training graph == deployment graph.

    ``fused`` is accepted for DeploySpec API parity with SRGenerator and is a
    no-op (there is no BN to fold).
    """

    depth: int = 14
    add_rate: float = 0.2
    scale: int = 4
    width: int = 128
    downshuffle: int = 1  # run the trunk at 1/downshuffle resolution
    # Full-resolution refinement stage (measured quality lever for the
    # downshuffled denoiser, PERF.md): the half-res trunk hands every output
    # pixel only width/f^2 effective features at reconstruction (128/4 = 32
    # vs the reference denoiser's 64 at full res), which caps fidelity at
    # x1 where the mapping is near-identity. With ``refine_blocks`` > 0 the
    # tail becomes: project width -> refine_width*(scale*f)^2 at trunk
    # resolution, ONE shuffle to full output resolution, ``refine_blocks``
    # narrow full-res residual blocks, then a 3-channel tanh conv. The
    # refine convs run below full lane utilization and full-res convs are
    # never cheap (~20% of model FLOPs at the gate-passing
    # refine_blocks=2/refine_width=64 config; measured cost in PERF.md) —
    # but they put neighborhood processing where the noise statistics
    # actually live, which is what passes the x1 quality gate.
    refine_blocks: int = 0
    refine_width: int = 32
    fused: bool = False  # no-op: the graph is BN-free by construction
    remat: bool = False  # rematerialize each block's activations in backward
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.scale not in (1, 2, 4, 8):
            raise ValueError(f"scale must be in (1, 2, 4, 8), got {self.scale}")
        if self.downshuffle < 1:
            raise ValueError(f"downshuffle must be >= 1, got {self.downshuffle}")
        if self.refine_blocks < 0:
            raise ValueError(
                f"refine_blocks must be >= 0, got {self.refine_blocks}")
        if self.refine_blocks and self.refine_width < 1:
            raise ValueError(
                f"refine_width must be >= 1, got {self.refine_width}")
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        # Sub-pixel front (``downshuffle`` f > 1): edge-pad H/W to multiples
        # of f, then space_to_depth so the WHOLE trunk runs at 1/f resolution
        # on 3*f^2 input channels — lossless (every pixel is still seen), and
        # the tail's single shuffle factor becomes scale*f, restoring full
        # output resolution. This is how the denoise_fast family spends its
        # FLOPs at MXU-friendly shapes instead of full-res narrow convs.
        h_in, w_in = x.shape[1], x.shape[2]
        f = self.downshuffle
        pad_h = -h_in % f
        pad_w = -w_in % f
        if f > 1:
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                            mode="edge")
            x = pixel_unshuffle(x, f)
        x = ConvBlock(self.width, 3, act=("leaky_relu", 0.01), use_bn=False,
                      name="head", **kw)(x, train)
        block_cls = (
            nn.remat(FastResBlock, static_argnums=(2,)) if self.remat
            else FastResBlock
        )
        h = x
        for i in range(self.depth):
            h = block_cls(self.width, ("leaky_relu", 0.01), self.add_rate,
                          name=f"block{i}", **kw)(h, train)
        h = ConvBlock(self.width, 3, act=None, use_bn=False,
                      name="trunk_conv", **kw)(h, train)
        x = x + h  # global residual, same role as SRGenerator's
        r = self.scale * f
        if self.refine_blocks:
            # Full-res refinement tail (see field docstring): one shuffle to
            # output resolution with refine_width live channels, narrow
            # residual blocks there, then the 3-channel tanh conv.
            x = ConvBlock(self.refine_width * r ** 2, 3,
                          act=("leaky_relu", 0.01), use_bn=False,
                          name="refine_proj", **kw)(x, train)
            if r > 1:
                x = pixel_shuffle(x, r)
            for i in range(self.refine_blocks):
                x = block_cls(self.refine_width, ("leaky_relu", 0.01),
                              self.add_rate, name=f"refine{i}", **kw)(x, train)
            x = ConvBlock(3, 3, act="tanh", use_bn=False,
                          name="tail", **kw)(x, train)
        else:
            # Born-folded tail: project to 3*(scale*f)^2 channels at trunk
            # resolution, tanh BEFORE the shuffle (elementwise ops commute
            # with depth_to_space), one shuffle straight to the output scale.
            x = ConvBlock(3 * r ** 2, 3, act="tanh", use_bn=False,
                          name="tail", **kw)(x, train)
            if r > 1:
                x = pixel_shuffle(x, r)
        if pad_h or pad_w:  # undo the front padding at output scale
            x = x[:, : h_in * self.scale, : w_in * self.scale, :]
        return x.astype(jnp.float32)


def FastDenoiser(
    depth: int = 14,
    add_rate: float = 0.2,
    width: int = 128,
    downshuffle: int = 2,
    **kw,
) -> FastSRGenerator:
    """TPU-first denoiser (``family="denoise_fast"``): the fast trunk run at
    1/``downshuffle`` resolution with x1 output.

    The reference ``Denoise`` (utils/models.py:672-706, rebuilt as
    models/denoiser.Denoiser) spends ~3.75 MFLOP per pixel, 2/3 of it in
    64-wide convs at FULL resolution — half the MXU's 128 lanes idle on every
    one of them. This family space_to_depths the input once (lossless) and
    runs the SAME MXU-aligned width-128 trunk as the SR flagship at half
    resolution: ~2.15 MFLOP/px at full lane utilization, identical param
    names/shapes to ``family="fast"`` so every surrounding subsystem (EMA,
    checkpointing, export, tiled/data-parallel serving, int8 PTQ) carries
    over unchanged. Quality-gated against the reference topology by
    scripts/denoise_quality_experiment.py (table in PERF.md).
    """
    return FastSRGenerator(depth=depth, add_rate=add_rate, scale=1,
                           width=width, downshuffle=downshuffle, **kw)
