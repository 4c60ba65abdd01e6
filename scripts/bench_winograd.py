#!/usr/bin/env python
"""Microbench: Winograd F(2,3)/F(4,3) vs XLA direct conv at serving shapes.

Methodology per PERF.md: chain K iterations in one jitted lax.scan over K
DISTINCT inputs with a carried checksum (prevents LICM hoisting), fetch the
scalar, difference two chain lengths to cancel the relay round trip.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from image_super_resolution_tpu.ops.winograd import (
    direct_conv3x3,
    transform_kernel,
    winograd_conv3x3,
)


def timed_chain(fn, xs, k):
    """fn(x) -> array; xs: (K, ...) distinct inputs. Returns seconds for k iters."""

    @jax.jit
    def run(xs):
        def body(acc, x):
            y = fn(x)
            return acc + jnp.sum(y.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs[:k])
        return acc

    run(xs)  # compile+warm
    float(run(xs))
    t0 = time.perf_counter()
    s = float(run(xs))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return dt


def bench(fn, xs, k1=8, k2=24):
    t1 = timed_chain(fn, xs, k1)
    t2 = timed_chain(fn, xs, k2)
    return (t2 - t1) / (k2 - k1)


def main():
    rng = np.random.default_rng(0)
    B, T = 256, 24
    shapes = [(64, 192), (32, 160), (32, 128), (32, 96), (32, 64)]
    print(f"batch {B}, tile {T}x{T}, dtype bf16 (fp32 accum)")
    print(f"{'shape':>12} {'direct ms':>10} {'F(2,3) ms':>10} {'F(4,3) ms':>10} "
          f"{'spd2':>6} {'spd4':>6}")
    total_d = total_w2 = total_w4 = 0.0
    for cin, cout in shapes:
        xs = jnp.asarray(
            rng.standard_normal((24, B, T, T, cin)), jnp.bfloat16
        )
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        w2 = transform_kernel(w, 2)
        w4 = transform_kernel(w, 4)

        td = bench(lambda x: direct_conv3x3(x, w, b), xs)
        t2 = bench(lambda x: winograd_conv3x3(x, w2, b, m=2), xs)
        t4 = bench(lambda x: winograd_conv3x3(x, w4, b, m=4), xs)
        total_d += td
        total_w2 += t2
        total_w4 += t4
        print(f"{cin:>5}->{cout:<5} {td*1e3:>10.3f} {t2*1e3:>10.3f} {t4*1e3:>10.3f} "
              f"{td/t2:>6.2f} {td/t4:>6.2f}")
    print(f"{'TOTAL':>12} {total_d*1e3:>10.3f} {total_w2*1e3:>10.3f} "
          f"{total_w4*1e3:>10.3f} {total_d/total_w2:>6.2f} {total_d/total_w4:>6.2f}")


if __name__ == "__main__":
    main()
