#!/usr/bin/env python
"""Two deployment-graph questions, measured on chip:

1. Tiling-bound validation: the same 3x3 conv at 128-aligned widths
   (128->128) should run near the chip's matmul peak if PERF.md's MXU
   channel-tiling bound explains the trunk's ~61% utilization.
2. Scan-form trunk: lax.scan over 16 stacked RRDB param sets compiles ONE
   block body instead of unrolling 48 RDBs — if runtime matches the
   unrolled form, cold-start compile time drops ~an order of magnitude.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _bench_util import pick_iters, timed_chain_pool  # noqa: E402

from image_super_resolution_tpu.models.optimized import ScatterRRDB  # noqa: E402
from image_super_resolution_tpu.ops.scatter import rdb_params_to_scatter  # noqa: E402


def time_fn(fn, x, rough_ms=1.0):
    pool = jnp.stack([x, x + x.dtype.type(0.01)])
    return timed_chain_pool(fn, pool, pick_iters(rough_ms)) * 1e3


def tiling_bound_probe():
    """3x3 conv, 128 -> 128 channels (K=1152, N=128: zero padding waste)."""
    b, t = 256, 24
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, t, 128), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128), jnp.bfloat16) * 0.05

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    ms = time_fn(conv, x, rough_ms=0.3)
    flops = 2 * 9 * 128 * 128 * b * t * t
    print(f"aligned 128->128 conv: {ms:.3f} ms = {flops / ms / 1e9:.1f} TFLOP/s "
          f"(tiling-bound check: near-peak here => trunk's 61% is channel padding)",
          flush=True)


def scan_trunk_probe():
    b, t, depth, width = 256, 24, 16, 64
    block = ScatterRRDB(width, 0.2)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, t, width), jnp.bfloat16)

    # one RRDB's scatter params, replicated+stacked along a leading depth axis
    from image_super_resolution_tpu.models.generator import SRGenerator

    gen = SRGenerator(depth=1, width=width, scale=4, fused=True)
    variables = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))
    rrdb = {
        name: rdb_params_to_scatter(node)
        for name, node in variables["params"]["rrdb0"].items()
    }
    stacked = jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * depth), rrdb
    )

    def unrolled(x):
        h = x
        for _ in range(depth):
            h = block.apply({"params": rrdb}, h)
        return h

    def scanned(x):
        def body(h, params):
            return block.apply({"params": params}, h), None

        h, _ = jax.lax.scan(body, x, stacked)
        return h

    for name, fn in (("unrolled", unrolled), ("scan", scanned)):
        t0 = time.perf_counter()
        c = jax.jit(fn).lower(x).compile()
        compile_s = time.perf_counter() - t0
        ms = time_fn(fn, x, rough_ms=10.0)
        print(f"{name:9s} 16-RRDB trunk: compile {compile_s:6.1f} s, "
              f"run {ms:7.3f} ms/iter", flush=True)
        del c


if __name__ == "__main__":
    tiling_bound_probe()
    scan_trunk_probe()
