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

The dense-concat reference topology (family "sr") is deliberately NOT
tensor-sharded: its 32-channel growth convs would need a collective per
conv (5 per RDB, 240 per model) at <=25% lane utilization per shard — the
measured MXU channel-tiling analysis in PERF.md makes that strictly worse
than the data/spatial axes that family already has. TP targets the family
whose 128-wide trunk divides evenly across a mesh axis.
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


def tp_fast_param_specs(depth: int, axis: str = TILE_AXIS) -> Dict[str, Any]:
    """PartitionSpec tree for FastSRGenerator params under TP.

    conv0 / trunk_conv are column-parallel (kernel sharded on C_out, bias
    sharded); conv1 / tail are row-parallel (kernel sharded on C_in, bias
    replicated and added once after the psum); the tiny head is replicated.
    """
    col = {"conv": {"kernel": P(None, None, None, axis), "bias": P(axis)}}
    row = {"conv": {"kernel": P(None, None, axis, None), "bias": P()}}
    repl = {"conv": {"kernel": P(), "bias": P()}}
    specs: Dict[str, Any] = {"head": repl, "trunk_conv": col, "tail": row}
    for i in range(depth):
        specs[f"block{i}"] = {"conv0": col, "conv1": row}
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
        if spec.family != "fast":
            raise ValueError(
                "tensor parallelism is implemented for the fast family "
                "(width-128 MXU-aligned trunk); the dense-concat reference "
                f"topology is served via data/spatial axes (got family="
                f"{spec.family!r})"
            )
        if (getattr(spec, "downshuffle", 1) or 1) > 1:
            # this wrapper re-implements the fast forward; it has no
            # sub-pixel front, so a downshuffle spec would feed the head
            # conv 3 channels where it expects 3*f^2
            raise ValueError(
                "tensor parallelism does not implement the downshuffle "
                "sub-pixel front; serve downshuffle artifacts via "
                "data_devices"
            )
        if getattr(spec, "refine_blocks", 0):
            # likewise no full-res refinement tail here: the param tree
            # would not match tp_fast_param_specs and the forward would
            # silently skip the refinement stage
            raise ValueError(
                "tensor parallelism does not implement the full-res "
                "refinement tail (refine_blocks > 0); serve refine "
                "artifacts via data_devices"
            )
        n = int(mesh.shape[axis])
        if spec.width % n:
            raise ValueError(
                f"trunk width {spec.width} must divide over {n} '{axis}' "
                f"devices"
            )
        self.spec = spec
        self.mesh = mesh
        self.axis = axis
        self._dtype = dtype if dtype is not None else jnp.bfloat16
        specs = tp_fast_param_specs(spec.depth, axis)
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
        depth, width, scale, add_rate = (
            spec.depth, spec.width, spec.scale, spec.add_rate,
        )
        c_local = width // n
        dtype_ = self._dtype

        def local_forward(p, u8):
            from ..data.transforms import normalize, tanh_to_uint8
            from ..ops.pixel_shuffle import pixel_shuffle

            cast = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(dtype_), t
            )
            x = normalize(u8, mean, std).astype(dtype_)
            hc = cast(p["head"]["conv"])
            x = jax.nn.leaky_relu(_conv_same(x, hc["kernel"], hc["bias"]),
                                  negative_slope=0.01)
            h = x
            for i in range(depth):
                c0 = cast(p[f"block{i}"]["conv0"]["conv"])
                c1 = cast(p[f"block{i}"]["conv1"]["conv"])
                t = jax.nn.leaky_relu(_conv_same(h, c0["kernel"], c0["bias"]),
                                      negative_slope=0.01)
                t = _conv_same(t, c1["kernel"])  # partial over C_in shard
                t = jax.lax.psum(t, axis) + c1["bias"]
                h = h + t * jnp.asarray(add_rate, t.dtype)
            tc = cast(p["trunk_conv"]["conv"])
            hs = _conv_same(h, tc["kernel"], tc["bias"])  # C_out-sharded
            idx = jax.lax.axis_index(axis)
            x_shard = jax.lax.dynamic_slice_in_dim(x, idx * c_local, c_local,
                                                   axis=3)
            hs = hs + x_shard  # global residual, sharded slice-wise
            tl = cast(p["tail"]["conv"])
            y = _conv_same(hs, tl["kernel"])  # partial over trunk shard
            y = jnp.tanh(jax.lax.psum(y, axis) + tl["bias"])
            if scale > 1:
                y = pixel_shuffle(y, scale)
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
