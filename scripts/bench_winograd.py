#!/usr/bin/env python
"""Microbench: Winograd F(2,3)/F(4,3) vs XLA direct conv at serving shapes.

Uses the long-chain pool harness (scripts/_bench_util.py) — early short-chain
timings were jitter-dominated through the PJRT relay.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/bench_winograd.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from _bench_util import pick_iters, timed_chain_pool  # noqa: E402

from image_super_resolution_tpu.ops.winograd import (
    direct_conv3x3,
    transform_kernel,
    winograd_conv3x3,
)


def main():
    rng = np.random.default_rng(0)
    B, T, P = 256, 24, 4
    shapes = [(64, 192), (32, 160), (32, 128), (32, 96), (32, 64)]
    print(f"batch {B}, tile {T}x{T}, dtype bf16 (fp32 accum)")
    print(f"{'shape':>12} {'direct ms':>10} {'F(2,3) ms':>10} {'F(4,3) ms':>10} "
          f"{'spd2':>6} {'spd4':>6}")
    total_d = total_w2 = total_w4 = 0.0
    for cin, cout in shapes:
        xs = jnp.asarray(
            rng.standard_normal((P, B, T, T, cin)), jnp.bfloat16
        )
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
        b = jnp.zeros((cout,), jnp.float32)
        w2 = transform_kernel(w, 2)
        w4 = transform_kernel(w, 4)

        it = pick_iters(0.3)
        td = timed_chain_pool(lambda x: direct_conv3x3(x, w, b), xs, it)
        t2 = timed_chain_pool(lambda x: winograd_conv3x3(x, w2, b, m=2), xs, it)
        t4 = timed_chain_pool(lambda x: winograd_conv3x3(x, w4, b, m=4), xs, it)
        total_d += td
        total_w2 += t2
        total_w4 += t4
        print(f"{cin:>5}->{cout:<5} {td*1e3:>10.3f} {t2*1e3:>10.3f} {t4*1e3:>10.3f} "
              f"{td/t2:>6.2f} {td/t4:>6.2f}")
    print(f"{'TOTAL':>12} {total_d*1e3:>10.3f} {total_w2*1e3:>10.3f} "
          f"{total_w4*1e3:>10.3f} {total_d/total_w2:>6.2f} {total_d/total_w4:>6.2f}")


if __name__ == "__main__":
    main()
