"""Shared microbenchmark harness for the TPU probes.

Methodology (PERF.md): the axon PJRT relay acks dispatches asynchronously and
adds ~34 ms RTT with ~ms jitter to every fetch, so (a) every timing must force
a scalar fetch, and (b) the measured on-device span must DWARF the jitter.
Early probes differenced ~10-iteration chains of sub-ms ops and produced
negative times; this harness chains HUNDREDS of iterations.

To keep memory bounded while defeating loop-invariant hoisting, the chain
scans over an index sequence into a small pool of distinct inputs — each
iteration's operand is data-dependent on the scanned index, so XLA cannot
hoist or CSE the body.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_chain_pool(fn, pool, iters: int, repeats: int = 5) -> float:
    """Seconds per fn(x) call, measured over an `iters`-long on-device chain.

    pool: (P, ...) array of distinct inputs; fn: x -> array.
    Differences two chain lengths (iters//4, iters) to cancel fixed overhead,
    taking the min of `repeats` timings of each.
    """
    p = pool.shape[0]

    @jax.jit
    def run(pool, idx):
        def body(acc, i):
            x = jax.lax.dynamic_index_in_dim(pool, i, 0, keepdims=False)
            y = fn(x)
            # Full-output reduction: slicing the output would let XLA shrink
            # the op itself (y[0] of a matmul needs one row). The sum fuses
            # into the producer's epilogue.
            return acc + jnp.sum(y).astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), idx)
        return acc

    def measure(k: int) -> float:
        idx = jnp.asarray(np.arange(k) % p, jnp.int32)
        float(run(pool, idx))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(pool, idx))
            best = min(best, time.perf_counter() - t0)
        return best

    k1 = max(4, iters // 4)
    t1, t2 = measure(k1), measure(iters)
    return (t2 - t1) / (iters - k1)


def pick_iters(rough_ms: float, target_ms: float = 400.0) -> int:
    """Chain length so the long chain spans ~target_ms on device."""
    return max(16, int(target_ms / max(rough_ms, 1e-3)))
