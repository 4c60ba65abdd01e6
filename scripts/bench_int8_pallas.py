#!/usr/bin/env python
"""Pallas int8 matmul probe (VERDICT round-1 next #5b).

Round 1 measured XLA's int8 path at 162 TOP/s — no faster than bf16's 173
TFLOP/s — despite v5e silicon nominally offering ~2x int8 MXU throughput.
This probe hand-writes the matmul in Pallas (int8 operands, int32
accumulation, K-looped VMEM accumulator) to test whether a custom kernel can
reach the int8 path XLA misses. The answer decides whether int8 serving is
worth building. Results recorded in PERF.md.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, acc_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=acc_dtype)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _out():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tm", "tk", "tn"))
def pallas_matmul(a, b, tm=512, tk=1024, tn=512):
    m, k = a.shape
    _, n = b.shape
    acc_dtype = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc_dtype=acc_dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), acc_dtype),
        grid=(m // tm, n // tn, k // tk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((tm, tn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(a, b)


def timed(fn, a, b, iters=8):
    """Chain iters matmuls with a carried checksum; difference two lengths."""

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(a, b, k):
        def body(carry, _):
            # Perturb an operand cheaply so LICM can't hoist the matmul.
            a2 = a + carry.astype(a.dtype)
            out = fn(a2, b)
            return (carry + 1) % 7, jnp.sum(out, dtype=jnp.float32)

        _, sums = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=k)
        return jnp.sum(sums)

    float(run(a, b, 2))  # compile + warm
    t0 = time.perf_counter()
    float(run(a, b, 2))
    t2 = time.perf_counter() - t0
    float(run(a, b, 2 + iters))  # compile second length
    t0 = time.perf_counter()
    float(run(a, b, 2 + iters))
    tk = time.perf_counter() - t0
    return (tk - t2) / iters


def main():
    rng = np.random.default_rng(0)
    size = 4096
    flops = 2 * size**3

    a8 = jnp.asarray(rng.integers(-127, 127, (size, size)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (size, size)), jnp.int8)
    a16 = jnp.asarray(rng.standard_normal((size, size)), jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((size, size)), jnp.bfloat16)

    # Correctness sanity of the kernel before timing it.
    small_a = a8[:1024, :2048]
    small_b = b8[:2048, :1024]
    want = jnp.dot(
        small_a.astype(jnp.int32), small_b.astype(jnp.int32)
    )
    got = pallas_matmul(small_a, small_b, tm=512, tk=1024, tn=512)
    assert bool(jnp.all(got == want)), "pallas int8 matmul mismatch"
    print("pallas int8 matmul: exact vs XLA int32 reference")

    for name, fn, a, b in [
        ("XLA bf16", lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32), a16, b16),
        ("XLA int8", lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.int32), a8, b8),
        ("Pallas bf16", pallas_matmul, a16, b16),
        ("Pallas int8", pallas_matmul, a8, b8),
    ]:
        try:
            dt = timed(fn, a, b)
            print(f"{name:>12}: {dt*1e3:8.3f} ms -> {flops/dt/1e12:7.1f} T(FL)OP/s")
        except Exception as e:
            print(f"{name:>12}: FAILED {str(e)[:200]}")


if __name__ == "__main__":
    main()
