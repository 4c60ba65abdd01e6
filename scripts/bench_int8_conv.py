#!/usr/bin/env python
"""Probe: does int8 beat bf16 on this chip, and in which CONV formulation?

Round 1 recorded "XLA int8 is 0.89x bf16" from short-chain timings that are
now known to be jitter-dominated (PERF.md, harness note). This probe re-runs
the question on the long-chain pool harness (scripts/_bench_util.py):

  A. raw matmul TOP/s, int8 vs bf16, at 2048/4096/8192
  B. serving-shape scatter-RDB 3x3 convs (b256 t24) as
       1. lax.conv int8            3. im2col int8 matmul
       2. tap-sum int8 matmuls     4. lax.conv bf16 (baseline)

Decides whether an int8 serving path is built. Results go to PERF.md.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/bench_int8_conv.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from _bench_util import pick_iters, timed_chain_pool  # noqa: E402


def conv_direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else jnp.float32,
    )


def conv_tapsum(x, w):
    """3x3 SAME conv as 9 shifted matmuls accumulated in int32/fp32."""
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    acc_t = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((n, h, ww, cout), acc_t)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, ww, cin))
            acc = acc + jax.lax.dot_general(
                xs.reshape(-1, cin), w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            ).reshape(n, h, ww, cout)
    return acc


def conv_im2col(x, w):
    """3x3 SAME conv as one (NHW, 9Cin) @ (9Cin, Cout) matmul."""
    n, h, ww, cin = x.shape
    cout = w.shape[-1]
    acc_t = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, ww, cin))
         for dy in range(3) for dx in range(3)], axis=-1)
    y = jax.lax.dot_general(
        cols.reshape(-1, 9 * cin), w.reshape(9 * cin, cout),
        (((1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    )
    return y.reshape(n, h, ww, cout)


def main():
    rng = np.random.default_rng(0)
    P = 4  # input pool size

    print("== raw matmul, long-chain harness ==")
    for size, rough_ms in ((2048, 0.1), (4096, 0.5), (8192, 4.0)):
        b8 = jnp.asarray(rng.integers(-127, 128, (size, size)), jnp.int8)
        b16 = jnp.asarray(rng.standard_normal((size, size)), jnp.bfloat16)
        a8 = jnp.asarray(rng.integers(-127, 128, (P, size, size)), jnp.int8)
        a16 = jnp.asarray(rng.standard_normal((P, size, size)), jnp.bfloat16)
        it = pick_iters(rough_ms)
        f8 = lambda x: jax.lax.dot_general(
            x, b8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        f16 = lambda x: jax.lax.dot_general(
            x, b16, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        t8 = timed_chain_pool(f8, a8, it)
        t16 = timed_chain_pool(f16, a16, it)
        fl = 2 * size**3
        print(f"  {size}^3: bf16 {t16*1e3:7.3f} ms ({fl/t16/1e12:5.1f} TFLOP/s)  "
              f"int8 {t8*1e3:7.3f} ms ({fl/t8/1e12:5.1f} TOP/s)  "
              f"int8/bf16 speedup {t16/t8:4.2f}x  [{it} iters]")

    B, T = 256, 24
    shapes = [(64, 192), (32, 160), (32, 128), (32, 96), (32, 64)]
    print(f"== serving-shape 3x3 convs (b{B} t{T}) ==")
    print(f"{'shape':>12} {'bf16 ms':>9} {'i8 conv':>9} {'i8 tap':>9} "
          f"{'i8 im2col':>10} {'best spd':>9}")
    tot = dict.fromkeys(("bf16", "i8conv", "i8tap", "i8col"), 0.0)
    for cin, cout in shapes:
        x8 = jnp.asarray(rng.integers(-127, 128, (P, B, T, T, cin)), jnp.int8)
        x16 = jnp.asarray(rng.standard_normal((P, B, T, T, cin)), jnp.bfloat16)
        w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
        w16 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                          jnp.bfloat16)
        it = pick_iters(0.2)
        res = {
            "bf16": timed_chain_pool(lambda x: conv_direct(x, w16), x16, it),
            "i8conv": timed_chain_pool(lambda x: conv_direct(x, w8), x8, it),
            "i8tap": timed_chain_pool(lambda x: conv_tapsum(x, w8), x8, it),
            "i8col": timed_chain_pool(lambda x: conv_im2col(x, w8), x8, it),
        }
        for k_, v in res.items():
            tot[k_] += v
        best = min(res["i8conv"], res["i8tap"], res["i8col"])
        print(f"{cin:>5}->{cout:<5} {res['bf16']*1e3:>9.3f} "
              f"{res['i8conv']*1e3:>9.3f} {res['i8tap']*1e3:>9.3f} "
              f"{res['i8col']*1e3:>10.3f} {res['bf16']/best:>9.2f}")
    best_t = min(tot["i8conv"], tot["i8tap"], tot["i8col"])
    print(f"{'TOTAL':>12} {tot['bf16']*1e3:>9.3f} {tot['i8conv']*1e3:>9.3f} "
          f"{tot['i8tap']*1e3:>9.3f} {tot['i8col']*1e3:>10.3f} "
          f"{tot['bf16']/best_t:>9.2f}")


if __name__ == "__main__":
    main()
