#!/usr/bin/env python
"""Decisive int8 probe at SERVING shapes (VERDICT r3 follow-up to the
reconciliation run).

bench_int8_reconcile.py showed the hand Pallas int8 matmul sustains ~277
TOP/s at 4096^3 — 1.45x XLA's int8 emitter — under the trustworthy pool
harness. The remaining question for the north-star verdict: can int8 beat
bf16 where it matters, the five scatter-RDB serving convs (b256 t24)?

This times the Pallas int8 kernel on each conv's im2col GEMM shape
(M = 256*24*24 = 147456; K = 9*Cin; N = Cout padded to the int8 lane tile),
with the im2col'd input ALREADY MATERIALIZED — i.e. an optimistic upper
bound that charges int8 nothing for building the 9-tap columns or for the
padding waste. Compare the total against the measured bf16 direct-conv
total (0.493 ms, PERF.md int8 table). If even this free-lunch bound loses,
int8 serving is dead on arrival for this architecture.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_int8_serving_gemm.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from _bench_util import pick_iters, timed_chain_pool  # noqa: E402
from bench_int8_pallas import pallas_matmul  # noqa: E402

M = 256 * 24 * 24  # b256 t24 serving batch
SHAPES = [(64, 192), (32, 160), (32, 128), (32, 96), (32, 64)]  # (Cin, Cout)


def pad_to(v: int, m: int) -> int:
    return -(-v // m) * m


def main():
    rng = np.random.default_rng(0)
    total = 0.0
    total_real_flops = 0
    print(f"{'conv':>10} {'GEMM (M,K,N_pad)':>22} {'ms':>8} {'TOP/s(real)':>12}")
    for cin, cout in SHAPES:
        k = 9 * cin
        n = pad_to(cout, 128)  # int8 lane tile; padding charged to bf16's side
        a = jnp.asarray(rng.integers(-127, 127, (2, M, k)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        tm = 512
        tk = k  # K fits one block (multiple of 32 for int8 sublane tiling)
        tn = n
        fn = lambda x: pallas_matmul(x, b, tm=tm, tk=tk, tn=tn)
        it = pick_iters(0.15)
        dt = timed_chain_pool(fn, a, it)
        real_flops = 2 * M * k * cout
        total += dt
        total_real_flops += real_flops
        print(f"{cin:>4}->{cout:<5} {f'({M},{k},{n})':>22} {dt*1e3:>8.3f} "
              f"{real_flops/dt/1e12:>12.1f}")
    print(f"{'TOTAL':>10} {'':>22} {total*1e3:>8.3f} "
          f"{total_real_flops/total/1e12:>12.1f}")
    print(f"bf16 direct conv total (PERF.md, same shapes): 0.493 ms "
          f"-> int8 GEMM-only bound is {0.493/ (total*1e3):.2f}x bf16")


if __name__ == "__main__":
    main()
