"""Scatter-form residual dense block — an MXU-efficient exact rewrite.

The reference RDB (utils/models.py:245-271) computes each growth conv over a
dense concatenation:  y_i = act(W_i @ [x, y_0..y_{i-1}]).  Every W_i has only
32 output channels, so each conv uses 32 of the MXU's 128 lanes (~25%
utilization) — the dominant cost of the whole generator.

The scatter form reassociates the same arithmetic BY SOURCE instead of by
destination: for each already-available tensor, ONE wide conv computes its
contributions to every future consumer (y_0..y_3 and the fusion conv):

    from x  : 64 -> 192   (y0|y1|y2|y3|fuse slices)
    from y0 : 32 -> 160   (y1|y2|y3|fuse)
    from y1 : 32 -> 128   (y2|y3|fuse)
    from y2 : 32 ->  96   (y3|fuse)
    from y3 : 32 ->  64   (fuse)

Identical FLOPs and results (floating-point reassociation only), but each
conv now fills 64-192 lanes. Measured 1.5x on the 48-RDB trunk on v5e.

Used for DEPLOYMENT only (training keeps the reference layout so checkpoints
stay interchangeable); ``rdb_params_to_scatter`` converts fused (BN-folded,
biased) standard RDB params.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .activations import ActSpec, apply_act

_G = 32  # growth channels at width 64 (filters // 2, utils/models.py:304)


def _conv(x: jnp.ndarray, kernel: jnp.ndarray, bias=None) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


class ScatterRDB(nn.Module):
    """Inference-only scatter-form RDB. Params: sx/s0/s1/s2/s3 kernels + bias.

    ``wino_m > 0`` switches the five convs to Winograd F(wino_m, 3)
    (ops/winograd.py); the kernels are then stored in the Winograd domain
    (shape (t, t, Cin, Cout)), transformed once by
    ``rdb_params_to_scatter(wino_m=...)``.
    """

    features: int = 64
    act: ActSpec = ("leaky_relu", 0.01)
    add_rate: float = 0.2
    wino_m: int = 0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.features
        g = c // 2
        init = nn.initializers.normal(0.02)
        if self.wino_m:
            from .winograd import winograd_conv3x3

            t = self.wino_m + 2
            kshape = lambda ci, co: (t, t, ci, co)
            conv = lambda v, k, b=None: winograd_conv3x3(
                v, k, b, m=self.wino_m, dtype=self.dtype
            )
        else:
            kshape = lambda ci, co: (3, 3, ci, co)
            conv = _conv
        sx = self.param("sx", init, kshape(c, 4 * g + c))
        s0 = self.param("s0", init, kshape(g, 3 * g + c))
        s1 = self.param("s1", init, kshape(g, 2 * g + c))
        s2 = self.param("s2", init, kshape(g, g + c))
        s3 = self.param("s3", init, kshape(g, c))
        bias = self.param("bias", nn.initializers.zeros, (4 * g + c,))

        cx = conv(x, sx, bias)
        y0 = apply_act(cx[..., :g], self.act)
        c0 = conv(y0, s0)
        y1 = apply_act(cx[..., g:2 * g] + c0[..., :g], self.act)
        c1 = conv(y1, s1)
        y2 = apply_act(cx[..., 2 * g:3 * g] + c0[..., g:2 * g] + c1[..., :g], self.act)
        c2 = conv(y2, s2)
        y3 = apply_act(
            cx[..., 3 * g:4 * g] + c0[..., 2 * g:3 * g] + c1[..., g:2 * g]
            + c2[..., :g],
            self.act,
        )
        c3 = conv(y3, s3)
        fuse = (
            cx[..., 4 * g:] + c0[..., 3 * g:] + c1[..., 2 * g:] + c2[..., g:] + c3
        )
        return fuse * jnp.asarray(self.add_rate, x.dtype) + x


def rdb_params_to_scatter(rdb: Dict[str, Any], wino_m: int = 0) -> Dict[str, Any]:
    """Fused standard-RDB params -> ScatterRDB params.

    Input layout (ops/blocks.RDB with use_bn folded away):
      conv{i}/conv/{kernel,bias} for i in 0..3 (Cin = c + i*g, Cout = g)
      conv_fuse/conv/{kernel,bias}            (Cin = c + 4*g, Cout = c)
    Dense concat order is [x, y0, y1, y2, y3] (utils/models.py:265-270), so
    kernel input-rows slice by source: x rows [0:c], y_j rows [c+j*g : c+(j+1)*g].
    """
    k = [rdb[f"conv{i}"]["conv"]["kernel"] for i in range(4)]
    b = [rdb[f"conv{i}"]["conv"]["bias"] for i in range(4)]
    kf = rdb["conv_fuse"]["conv"]["kernel"]
    bf = rdb["conv_fuse"]["conv"]["bias"]
    c = k[0].shape[2]
    g = k[0].shape[3]

    def rows(kernel, src):  # src: -1 for x, j for y_j
        if src < 0:
            return kernel[:, :, :c, :]
        lo = c + src * g
        return kernel[:, :, lo:lo + g, :]

    sx = jnp.concatenate([rows(k[0], -1), rows(k[1], -1), rows(k[2], -1),
                          rows(k[3], -1), rows(kf, -1)], axis=3)
    s0 = jnp.concatenate([rows(k[1], 0), rows(k[2], 0), rows(k[3], 0),
                          rows(kf, 0)], axis=3)
    s1 = jnp.concatenate([rows(k[2], 1), rows(k[3], 1), rows(kf, 1)], axis=3)
    s2 = jnp.concatenate([rows(k[3], 2), rows(kf, 2)], axis=3)
    s3 = rows(kf, 3)
    bias = jnp.concatenate([b[0], b[1], b[2], b[3], bf])
    out = {"sx": sx, "s0": s0, "s1": s1, "s2": s2, "s3": s3, "bias": bias}
    if wino_m:
        from .winograd import transform_kernel

        out = {
            k: transform_kernel(v, wino_m) if k != "bias" else v
            for k, v in out.items()
        }
    return out
