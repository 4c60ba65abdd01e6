#!/usr/bin/env python
"""Reconcile the round-2 int8 contradiction (VERDICT r2 weak #3).

PERF.md carried two incompatible numbers for XLA int8 @ 4096^3:
  - 191.4 TOP/s  (scripts/bench_int8_conv.py, long-chain POOL harness)
  - 428.7 TOP/s  (scripts/bench_int8_pallas.py `timed`, short differenced
                  chain: 2-vs-10 iterations, ONE repeat each)

The second harness is the exact methodology _bench_util.py's header calls
jitter-broken in this environment (the axon relay adds ~34 ms RTT with ~ms
jitter per fetch; differencing ~2.6 ms of on-device work across two single
measurements is noise). This script times the SAME four computations (XLA
bf16 / XLA int8 / Pallas bf16 / Pallas int8, 4096^3) under BOTH harnesses,
several times each, so PERF.md can stand on one consistent set and show the
other harness's spread.

Run on the real chip: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_int8_reconcile.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from _bench_util import pick_iters, timed_chain_pool  # noqa: E402
from bench_int8_pallas import pallas_matmul, timed as timed_short  # noqa: E402

SIZE = 4096
FLOPS = 2 * SIZE**3


def main():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (4, SIZE, SIZE)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (SIZE, SIZE)), jnp.int8)
    a16 = jnp.asarray(rng.standard_normal((4, SIZE, SIZE)), jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((SIZE, SIZE)), jnp.bfloat16)

    cases = [
        ("XLA bf16", lambda x: jnp.dot(x, b16, preferred_element_type=jnp.float32), a16,
         lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32), b16),
        ("XLA int8", lambda x: jnp.dot(x, b8, preferred_element_type=jnp.int32), a8,
         lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.int32), b8),
        ("Pallas bf16", lambda x: pallas_matmul(x, b16), a16, pallas_matmul, b16),
        ("Pallas int8", lambda x: pallas_matmul(x, b8), a8, pallas_matmul, b8),
    ]

    it = pick_iters(0.5)
    print(f"4096^3 matmul, both harnesses ({it}-iter pool chain vs "
          f"2-vs-10 short differenced chain, 3 runs each)")
    print(f"{'case':>12} | {'pool harness T(FL)OP/s (3 runs)':>34} | "
          f"{'short harness T(FL)OP/s (3 runs)':>34}")
    for name, pool_fn, pool, short_fn, b in cases:
        pool_rates = []
        for _ in range(3):
            dt = timed_chain_pool(pool_fn, pool, it)
            pool_rates.append(FLOPS / dt / 1e12)
        short_rates = []
        for _ in range(3):
            dt = timed_short(short_fn, pool[0], b)
            short_rates.append(FLOPS / dt / 1e12 if dt > 0 else float("nan"))
        fmt = lambda rs: " ".join(f"{r:7.1f}" for r in rs)
        print(f"{name:>12} | {fmt(pool_rates):>34} | {fmt(short_rates):>34}")


if __name__ == "__main__":
    main()
