#!/usr/bin/env python
"""Probe: does int8 pay on the FAST family's conv shapes?

The int8 verdict for the reference topology was measured dead (PERF.md):
at its serving GEMM shapes (K=288-576, N=32-192) XLA int8 convs run 0.97x
bf16 and the best int8 GEMM engine collapses to 0.19x. The fast flagship
changes the shapes — every trunk conv is 3x3 128->128 (GEMM K=1152,
N=128) — so the question is re-opened ONCE, on the same long-chain
harness, for exactly these shapes:

  1. lax.conv bf16 128->128 b256 t24   (the deployed baseline)
  2. lax.conv int8 (int32 accum)       same shape
  3. whole fast trunk block (conv-act-conv-residual) bf16 vs int8
  4. the hand Pallas int8 GEMM (round 3) on the conv's im2col shape
     (M=147456, K=1152, N=128) with columns charged for free — the
     upper bound a custom int8 conv kernel could reach.

The PTQ serving path is already built (models/quantized.py, rs.py
--int8); this probe decides whether it becomes the headline
(PERF.md decision rule: block-level >= ~1.4x) or stays an opt-in
measured negative like Winograd.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/bench_int8_fast.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from _bench_util import pick_iters, timed_chain_pool  # noqa: E402


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else None,
    )


def main():
    B, T, P, C = 256, 24, 4, 128
    rng = np.random.default_rng(0)
    it = pick_iters(0.6)
    px = B * T * T
    conv_flops = 2 * 9 * px * C * C

    # operands generated ON DEVICE: the relay uploads at ~4-5 MB/s, and the
    # Pallas GEMM pool below is ~680 MB
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    x_bf = (jax.random.normal(ks[0], (P, B, T, T, C), jnp.bfloat16)
            * jnp.bfloat16(0.3))
    x_i8 = jax.random.randint(ks[1], (P, B, T, T, C), -127, 127, jnp.int8)
    w_bf = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.02, jnp.bfloat16)
    w_i8 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)

    s = timed_chain_pool(lambda x: conv(x, w_bf), x_bf, it)
    print(f"conv128 bf16: {s * 1e3:7.3f} ms  ({conv_flops / s / 1e12:6.1f} TFLOP/s)")
    bf16 = s
    s = timed_chain_pool(lambda x: conv(x, w_i8), x_i8, it)
    print(f"conv128 int8: {s * 1e3:7.3f} ms  ({conv_flops / s / 1e12:6.1f} TOP/s) "
          f"-> {bf16 / s:.2f}x bf16")

    # whole fast residual block, the deployed unit: conv-act-conv + residual
    w2_bf = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.02, jnp.bfloat16)
    w2_i8 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)

    def block_bf16(x):
        h = conv(x, w_bf)
        h = jnp.where(h >= 0, h, h * jnp.asarray(0.01, h.dtype))
        return x + conv(h, w2_bf) * jnp.asarray(0.2, x.dtype)

    def block_int8(x):
        # int8 conv -> int32 -> requant to int8 between convs (the PTQ
        # dataflow a real int8 deployment would run), residual in int32
        h = conv(x, w_i8)
        h = jnp.where(h >= 0, h, h // 100)  # stand-in act at int32
        h8 = jnp.clip(h >> 7, -127, 127).astype(jnp.int8)  # requant
        y = conv(h8, w2_i8)
        return x.astype(jnp.int32) + (y >> 3)

    s = timed_chain_pool(block_bf16, x_bf, it)
    blk = s
    print(f"fast block bf16: {s * 1e3:7.3f} ms  "
          f"({2 * conv_flops / s / 1e12:6.1f} TFLOP/s)")
    s = timed_chain_pool(block_int8, x_i8, it)
    print(f"fast block int8: {s * 1e3:7.3f} ms  "
          f"({2 * conv_flops / s / 1e12:6.1f} TOP/s) -> {blk / s:.2f}x bf16")

    # 4. custom-kernel upper bound: the round-3 Pallas int8 matmul on the
    # conv's im2col GEMM shape, columns already materialized (free lunch).
    # K=1152 amortizes the int32 accumulator 2-4x deeper than the K=288-576
    # shapes where this same kernel collapsed to 16-35 TOP/s.
    from bench_int8_pallas import pallas_matmul

    M, K, N = px, 9 * C, C
    a8 = jax.random.randint(ks[2], (2, M, K), -127, 127, jnp.int8)
    b8 = jax.random.randint(ks[3], (K, N), -127, 127, jnp.int8)
    # tk must be a multiple of 128 (Pallas TPU block constraint); 384 and
    # the full-K 1152 both divide K evenly.
    for tk in (384, 1152):
        fn = lambda x: pallas_matmul(x, b8, tm=512, tk=tk, tn=128)
        s = timed_chain_pool(fn, a8, pick_iters(0.5))
        print(f"pallas int8 im2col GEMM (M={M}, K={K}, N={N}, tk={tk}): "
              f"{s * 1e3:7.3f} ms  ({conv_flops / s / 1e12:6.1f} TOP/s) "
              f"-> {bf16 / s:.2f}x bf16 direct conv")


if __name__ == "__main__":
    main()
