"""Fused scatter-RDB Pallas kernel (whole dense block in VMEM).

One kernel computes an entire scatter-form RDB (ops/scatter.py) for a block
of independent tiles: explicit im2col into VMEM scratch + five MXU matmuls,
with zero HBM traffic between the five convolutions.

MEASURED RESULT (v5e, batch=256 tile=24x24x64, bf16): this kernel runs at
~1.6 ms/RDB vs ~0.6 ms/RDB for the XLA lowering of the same scatter form.
XLA's conv emitter streams the im2col implicitly into the MXU; materializing
it through VMEM scratch (~16 MB of VPU copies per RDB) costs more than the
HBM round-trips it saves. The kernel is therefore NOT on the default path —
it is kept as a correctness-tested building block for cases where more of
the network gets fused into one kernel (amortizing the im2col) and as the
scaffold for an int8 variant. Default deployment uses the XLA scatter form
(models/optimized.py), measured at 63% of the chip's attainable bf16 peak.

Layout notes (see /opt/skills/guides/pallas_guide.md):
- weights are passed pre-reshaped to (9*Cin, Cout) matmul form, matching the
  kernel-major (dy, dx, cin) im2col column order of HWIO kernels;
- bias is (1, Cout) fp32 (2-D, as SMEM/VMEM scalars must be);
- accumulation in fp32 via preferred_element_type, activations bf16.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _leaky(x: jnp.ndarray, slope: float = 0.01) -> jnp.ndarray:
    return jnp.where(x > 0, x, slope * x)


def _make_kernel(tb: int, t: int, c: int, g: int, add_rate: float, slope: float):
    rows = tb * t * t

    def kernel(x_ref, sx_ref, s0_ref, s1_ref, s2_ref, s3_ref, b_ref, out_ref,
               xp_ref, ax_ref, ag_ref):
        xp_ref[...] = jnp.zeros_like(xp_ref)
        xp_ref[:, 1:t + 1, 1:t + 1, :] = x_ref[...]
        for k in range(9):
            dy, dx = divmod(k, 3)
            ax_ref[:, k * c:(k + 1) * c] = (
                xp_ref[:, dy:dy + t, dx:dx + t, :].reshape(rows, c)
            )
        cx = jnp.dot(ax_ref[...], sx_ref[...], preferred_element_type=jnp.float32)
        cx = cx + b_ref[...]

        def gcol(y2d):
            ypad = jnp.pad(y2d.reshape(tb, t, t, g), ((0, 0), (1, 1), (1, 1), (0, 0)))
            for k in range(9):
                dy, dx = divmod(k, 3)
                ag_ref[:, k * g:(k + 1) * g] = (
                    ypad[:, dy:dy + t, dx:dx + t, :].reshape(rows, g)
                )
            return ag_ref[...]

        y0 = _leaky(cx[:, :g], slope).astype(jnp.bfloat16)
        c0 = jnp.dot(gcol(y0), s0_ref[...], preferred_element_type=jnp.float32)
        y1 = _leaky(cx[:, g:2 * g] + c0[:, :g], slope).astype(jnp.bfloat16)
        c1 = jnp.dot(gcol(y1), s1_ref[...], preferred_element_type=jnp.float32)
        y2 = _leaky(
            cx[:, 2 * g:3 * g] + c0[:, g:2 * g] + c1[:, :g], slope
        ).astype(jnp.bfloat16)
        c2 = jnp.dot(gcol(y2), s2_ref[...], preferred_element_type=jnp.float32)
        y3 = _leaky(
            cx[:, 3 * g:4 * g] + c0[:, 2 * g:3 * g] + c1[:, g:2 * g] + c2[:, :g],
            slope,
        ).astype(jnp.bfloat16)
        c3 = jnp.dot(gcol(y3), s3_ref[...], preferred_element_type=jnp.float32)
        fuse = cx[:, 4 * g:] + c0[:, 3 * g:] + c1[:, 2 * g:] + c2[:, g:] + c3
        out = fuse.reshape(tb, t, t, c) * add_rate + x_ref[...].astype(jnp.float32)
        out_ref[...] = out.astype(jnp.bfloat16)

    return kernel


@partial(jax.jit, static_argnames=("add_rate", "slope", "tiles_per_block"))
def scatter_rdb_pallas(
    x: jnp.ndarray,
    sx: jnp.ndarray,
    s0: jnp.ndarray,
    s1: jnp.ndarray,
    s2: jnp.ndarray,
    s3: jnp.ndarray,
    bias: jnp.ndarray,
    add_rate: float = 0.2,
    slope: float = 0.01,
    tiles_per_block: int = 2,  # 4 exceeds the 16 MB scoped-VMEM limit at T=24
) -> jnp.ndarray:
    """x: (B, T, T, C) bf16 independent tiles; weights in (9*Cin, Cout) form;
    bias (1, 4g+c) fp32. Returns (B, T, T, C) bf16."""
    b, t, _, c = x.shape
    g = c // 2
    tb = min(tiles_per_block, b)
    if b % tb:
        raise ValueError(f"batch {b} not divisible by tiles_per_block {tb}")
    rows = tb * t * t
    kernel = _make_kernel(tb, t, c, g, add_rate, slope)
    weights = (sx, s0, s1, s2, s3, bias)
    return pl.pallas_call(
        kernel,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, t, t, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[
                pl.BlockSpec(w.shape, (lambda nd: (lambda i: (0,) * nd))(w.ndim),
                             memory_space=pltpu.VMEM)
                for w in weights
            ],
        ],
        out_specs=pl.BlockSpec((tb, t, t, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((tb, t + 2, t + 2, c), jnp.bfloat16),
            pltpu.VMEM((rows, 9 * c), jnp.bfloat16),
            pltpu.VMEM((rows, 9 * g), jnp.bfloat16),
        ],
    )(x, *weights)


def scatter_params_to_matmul(scatter: dict) -> Tuple[jnp.ndarray, ...]:
    """ScatterRDB params (HWIO kernels) -> the (9*Cin, Cout) matmul forms."""
    def flat(k):
        kh, kw, cin, cout = k.shape
        return k.reshape(kh * kw * cin, cout).astype(jnp.bfloat16)

    return (
        flat(scatter["sx"]), flat(scatter["s0"]), flat(scatter["s1"]),
        flat(scatter["s2"]), flat(scatter["s3"]),
        scatter["bias"].reshape(1, -1).astype(jnp.float32),
    )
