#!/usr/bin/env python
"""Close or structurally attribute the reference-topology serving gap.

VERDICT r3 item 3: the b256/t24 x4 sr serving graph runs ~73.5 MPix/s
(~114 eff TFLOP/s) vs ~82 MPix/s if the trunk hit the 128.5 TFLOP/s
isolated aligned-conv ceiling. This probes the two suggested levers plus
the quantities needed for the attribution paragraph in PERF.md:

1. one ScatterRDB as deployed (the unit 48 of which make the trunk);
2. the same RDB with every conv's OUTPUT channels lane-padded to multiples
   of 128 at "deploy time" (pad kernels/biases with zeros, slice after) —
   if the idle MXU lanes were free, this costs nothing and aligns N;
3. the same RDB with the add_rate-scale/residual epilogue stripped — if
   XLA already fuses the elementwise chain into the conv epilogue, the
   delta is ~0 and there is nothing to hand-fuse;
4. a 128->128 aligned conv (the emitter ceiling reference) and the
   FLOP-weighted channel-tiling bound for the RDB's five convs.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/bench_sr_gap.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from _bench_util import pick_iters, timed_chain_pool  # noqa: E402


def _conv(x, k, b=None):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + b.astype(x.dtype)


def _lrelu(x):
    return jnp.where(x >= 0, x, x * jnp.asarray(0.01, x.dtype))


def _pad_cout(k, b, mult=128):
    n = k.shape[-1]
    pad = (-n) % mult
    if pad == 0:
        return k, b, n
    k2 = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad)))
    b2 = jnp.pad(b, ((0, pad),))
    return k2, b2, n


def make_rdb(params, epilogue=True, pad=False):
    """Scatter-form RDB forward from raw param dict (sx/s0..s3 + biases)."""
    g = 32

    def conv(x, name):
        k, b = params[name], params[name + "_b"]
        if pad:
            k, b, n = _pad_cout(k, b)
            return _conv(x, k, b)[..., :n]
        return _conv(x, k, b)

    def fwd(x):
        sx = conv(x, "sx")                       # 64 -> 192
        y0 = _lrelu(sx[..., :g])
        s0 = conv(y0, "s0")                      # 32 -> 160
        y1 = _lrelu(sx[..., g:2 * g] + s0[..., :g])
        s1 = conv(y1, "s1")                      # 32 -> 128
        y2 = _lrelu(sx[..., 2 * g:3 * g] + s0[..., g:2 * g] + s1[..., :g])
        s2 = conv(y2, "s2")                      # 32 -> 96
        y3 = _lrelu(sx[..., 3 * g:4 * g] + s0[..., 2 * g:3 * g]
                    + s1[..., g:2 * g] + s2[..., :g])
        s3 = conv(y3, "s3")                      # 32 -> 64
        fuse = (sx[..., 4 * g:] + s0[..., 3 * g:] + s1[..., 2 * g:]
                + s2[..., g:] + s3)
        if not epilogue:
            return fuse
        return x + fuse * jnp.asarray(0.2, x.dtype)

    return fwd


def main():
    B, T, P = 256, 24, 4
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((P, B, T, T, 64)) * 0.3, jnp.bfloat16)

    g = 32
    shapes = {"sx": (3, 3, 64, 192), "s0": (3, 3, g, 160),
              "s1": (3, 3, g, 128), "s2": (3, 3, g, 96), "s3": (3, 3, g, 64)}
    params = {}
    for name, shp in shapes.items():
        params[name] = jnp.asarray(rng.standard_normal(shp) * 0.02, jnp.float32)
        params[name + "_b"] = jnp.asarray(rng.standard_normal(shp[-1]) * 0.01,
                                          jnp.float32)

    it = pick_iters(0.6)
    px = B * T * T
    rdb_flops = 2 * 9 * px * sum(shp[2] * shp[3] for shp in shapes.values())

    results = {}
    for tag, fn in (
        ("rdb_deployed", make_rdb(params)),
        ("rdb_lane_padded", make_rdb(params, pad=True)),
        ("rdb_no_epilogue", make_rdb(params, epilogue=False)),
    ):
        s = timed_chain_pool(fn, xs, it)
        results[tag] = s
        print(f"{tag:>18}: {s * 1e3:7.3f} ms  "
              f"({rdb_flops / s / 1e12:6.1f} eff TFLOP/s)")

    # aligned 128->128 conv, same spatial shape: the emitter ceiling probe
    xs128 = jnp.asarray(rng.standard_normal((P, B, T, T, 128)) * 0.3,
                        jnp.bfloat16)
    k128 = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.02,
                       jnp.float32)
    b128 = jnp.asarray(rng.standard_normal(128) * 0.01, jnp.float32)
    s = timed_chain_pool(lambda x: _lrelu(_conv(x, k128, b128)), xs128, it)
    aligned_flops = 2 * 9 * px * 128 * 128
    print(f"{'conv128_aligned':>18}: {s * 1e3:7.3f} ms  "
          f"({aligned_flops / s / 1e12:6.1f} eff TFLOP/s)")

    # FLOP-weighted naive channel-tiling bound for the five convs
    def util(ci, co):
        k = 9 * ci
        kt = -(-k // 128) * 128
        ct = -(-co // 128) * 128
        return (k / kt) * (co / ct)

    w = {n: shp[2] * shp[3] for n, shp in shapes.items()}
    bound = (sum(w[n] * util(shp[2], shp[3]) for n, shp in shapes.items())
             / sum(w.values()))
    print(f"FLOP-weighted channel-tiling bound: {bound:.3f} of peak")
    print(f"rdb_deployed fraction of 189.5 TFLOP/s peak: "
          f"{rdb_flops / results['rdb_deployed'] / 189.5e12:.3f}")


if __name__ == "__main__":
    main()
