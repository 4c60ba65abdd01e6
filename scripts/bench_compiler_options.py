#!/usr/bin/env python
"""Probe TPU compiler options for the headline serving kernel.

Client-side XLA_FLAGS cannot carry TPU compiler flags through this
environment's PJRT relay (the client XLA rejects them: 'Unknown flag'),
but per-compile ``compiler_options`` propagate to the server-side TPU
compiler. This sweeps a few options that plausibly move conv-emitter
fusion/tiling decisions and times the bench chain under each, vs the
default compile. Unknown/rejected options are reported, not fatal.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_compiler_options.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from image_super_resolution_tpu.models.deploy import DeployedModel, DeploySpec


def make_chain(deployed):
    def chain(params, xs):
        def body(carry, x):
            out = deployed.raw_apply(params, x)
            return carry + jnp.sum(out[..., 0].astype(jnp.int32)), ()

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), xs)
        return total

    return chain


def timed(compiled, params, xs) -> float:
    int(compiled(params, xs))  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(compiled(params, xs))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    batch, tile, scale, depth = 256, 24, 4, 16
    k_short, k_long = 1, 6
    spec = DeploySpec(family="sr", depth=depth, scale=scale)
    model = spec.build_model()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    deployed = DeployedModel(spec, variables["params"])
    xs = jax.random.randint(
        jax.random.PRNGKey(1), (k_long, batch, tile, tile, 3), 0, 256, jnp.uint8
    )
    chain = make_chain(deployed)
    out_mpix = batch * (tile * scale) ** 2 / 1e6

    variants = [
        ("default", None),
        ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
        ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
        ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
        ("lhs_sched", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
        ("no_multi_level", {"xla_tpu_use_repeated_tiling": "false"}),
    ]
    for name, opts in variants:
        try:
            results = []
            for k in (k_short, k_long):
                lowered = jax.jit(chain).lower(deployed.params, xs[:k])
                c = (lowered.compile() if opts is None
                     else lowered.compile(compiler_options=opts))
                results.append(timed(c, deployed.params, xs[:k]))
            per_iter = (results[1] - results[0]) / (k_long - k_short)
            print(f"{name:>16}: {per_iter*1e3:7.2f} ms/iter "
                  f"-> {out_mpix/per_iter:6.2f} MPix/s", flush=True)
        except Exception as e:
            print(f"{name:>16}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
