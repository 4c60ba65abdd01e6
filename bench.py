#!/usr/bin/env python
"""Headline benchmark: x4 SR inference throughput per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures the flagship deployment path — uint8 -> normalize -> x4 generator ->
uint8 — in output megapixels per second on one chip, against the
BASELINE.json north-star of 200 MPix/s/chip (the reference publishes no
numbers of its own; see BASELINE.md).

The headline model is the TPU-first "fast" family (models/fast.py: width-128
MXU-aligned trunk, ~0.54 MFLOP/output-px, quality-gated against the
reference topology in PERF.md). The reference topology (16-RRDB, 11.9M
params, 1.57 MFLOP/output-px — architecturally capped at ~120 MPix/s on a
v5e even at 100% MXU utilization, PERF.md) is additionally measured and
reported on stderr each run; select it explicitly with --family sr.

Methodology: K forwards are chained inside ONE jitted lax.scan with a carried
checksum, and a scalar is fetched at the end — this forces real execution and
amortizes host<->device round-trip latency (in this environment the PJRT
relay acks dispatches asynchronously, so naive block_until_ready timing
measures nothing). Two chain lengths are timed and differenced to cancel the
per-call latency exactly.

Extra diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def _timed_chain(deployed, xs, k: int) -> float:
    """Seconds for one call running k chained forwards + checksum fetch.

    Scans over k DISTINCT inputs — a loop-invariant body would be hoisted out
    of the scan by XLA and time k iterations as one.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(params, xs):
        def body(carry, x):
            out = deployed.raw_apply(params, x)
            # fold a data-dependent scalar into the carry so no iteration
            # can be dead-code-eliminated
            return carry + jnp.sum(out[..., 0].astype(jnp.int32)), ()

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), xs)
        return total

    xs_k = xs[:k]
    chain(deployed.params, xs_k).block_until_ready()  # compile
    int(chain(deployed.params, xs_k))  # warm pass
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(chain(deployed.params, xs_k))  # int() forces the fetch
        best = min(best, time.perf_counter() - t0)
    return best


def bench(
    family: str = "sr",
    depth: int = 16,
    width: int = 64,
    scale: int = 4,
    batch: int = 256,
    tile: int = 24,
    k_short: int = 1,
    k_long: int = 6,
    int8: bool = False,
    refine_blocks: int = 0,
    refine_width: int = 64,
    downshuffle: int | None = None,
) -> dict:
    import jax
    import jax.numpy as jnp

    from image_super_resolution_tpu.models.deploy import DeployedModel, DeploySpec

    denoise = family.startswith("denoise")
    if downshuffle is None:
        downshuffle = 2 if family == "denoise_fast" else 1
    spec = DeploySpec(
        family=family, depth=depth, width=width,
        scale=1 if denoise else scale,
        downshuffle=downshuffle,
        refine_blocks=refine_blocks, refine_width=refine_width,
    )
    scale = spec.output_scale
    model = spec.build_model()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    deployed = DeployedModel(spec, variables["params"])

    xs = jax.random.randint(
        jax.random.PRNGKey(1), (k_long, batch, tile, tile, 3), 0, 256, jnp.uint8
    )
    if int8:
        # PTQ trunk (models/quantized.py) calibrated on the bench inputs —
        # the same self-calibration rs.py --int8 performs on real inputs.
        from image_super_resolution_tpu.models.quantized import (
            quantize_deployed,
        )

        deployed = quantize_deployed(deployed, [xs[0]])
    print(
        f"bench config: {family} depth={depth} width={width} x{scale}, "
        f"batch={batch}, tile={tile}, int8={int8}, "
        f"refine={refine_blocks}x{refine_width if refine_blocks else 0}, "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )
    t_short = _timed_chain(deployed, xs, k_short)
    t_long = _timed_chain(deployed, xs, k_long)
    per_iter = (t_long - t_short) / (k_long - k_short)
    out_mpix = batch * (tile * scale) ** 2 / 1e6
    mpix_per_s = out_mpix / per_iter
    print(
        f"per-iter {per_iter * 1e3:.2f} ms ({out_mpix:.2f} MPix/iter); "
        f"t_short={t_short * 1e3:.1f} ms t_long={t_long * 1e3:.1f} ms",
        file=sys.stderr,
    )
    kind = "denoise" if denoise else "sr"
    # BASELINE.json's 200 MPix/s north star is defined for x4 SR throughput
    # only; dividing an x1-denoise number by it would be meaningless, so
    # those metrics carry vs_baseline=null.
    vs = round(mpix_per_s / 200.0, 4) if (kind == "sr" and scale == 4) else None
    return {
        "metric": f"x{scale}_{kind}_output_megapixels_per_sec_per_chip"
                  + ("_int8" if int8 else ""),
        "value": round(mpix_per_s, 2),
        "unit": "MPix/s",
        "vs_baseline": vs,
    }


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--family", default=None,
                        choices=["sr", "fast", "denoise", "denoise_fast"],
                        help="default: fast flagship, then the reference "
                             "topology as a diagnostic second line on stderr; "
                             "denoise families measure x1 restoration "
                             "throughput")
    parser.add_argument("--scale", type=int, default=4,
                        help="SR output scale (2 or 4; x4 is the headline "
                             "and the only scale BASELINE.json's north star "
                             "is defined for)")
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--tile", type=int, default=None,
                        help="input tile size (default 24 for the SR "
                             "families, 96 for x1 denoise — equal output "
                             "MPix per iteration either way)")
    parser.add_argument("--int8", action="store_true",
                        help="bench the fast family's int8 PTQ trunk "
                             "(models/quantized.py); errors on families "
                             "whose shapes measured int8-dead")
    parser.add_argument("--refine_blocks", type=int, default=0,
                        help="fast families: bench with the full-res "
                             "refinement tail (models/fast.py) — the "
                             "quality-gated denoise_fast configuration "
                             "(PERF.md)")
    parser.add_argument("--refine_width", type=int, default=64)
    parser.add_argument("--depth", type=int, default=None,
                        help="override the family's preset trunk depth "
                             "(e.g. the full-resolution denoise_fast W "
                             "configuration: --depth 6 --downshuffle 1)")
    parser.add_argument("--downshuffle", type=int, default=None,
                        help="denoise_fast: trunk resolution factor "
                             "(default 2; 1 = full-resolution trunk)")
    parser.add_argument("--preset", type=str, default=None,
                        choices=["denoise_fullres"],
                        help="named configuration shortcut: denoise_fullres "
                             "= the x1 fidelity preset (denoise_fast, "
                             "depth 6, full-resolution trunk — PERF.md "
                             "round-5 gate). Explicit flags override")
    opt = parser.parse_args()

    if opt.preset == "denoise_fullres":
        if opt.family is None:
            opt.family = "denoise_fast"
        if opt.depth is None:
            opt.depth = 6
        if opt.downshuffle is None:
            opt.downshuffle = 1

    if opt.downshuffle is not None and opt.family != "denoise_fast":
        parser.error("--downshuffle applies to --family denoise_fast only")
    if opt.depth is not None and opt.family is None:
        parser.error("--depth requires an explicit --family")

    from image_super_resolution_tpu.models.deploy import family_defaults

    if opt.family is not None:
        depth, width = family_defaults(opt.family)
        if opt.depth is not None:
            depth = opt.depth
        tile = opt.tile if opt.tile is not None else (
            96 if opt.family.startswith("denoise") else 24)
        result = bench(family=opt.family, depth=depth, width=width,
                       scale=opt.scale,
                       batch=opt.batch, tile=tile, int8=opt.int8,
                       refine_blocks=opt.refine_blocks,
                       refine_width=opt.refine_width,
                       downshuffle=opt.downshuffle)
    else:
        # Headline = the TPU-first flagship (quality-gated vs the reference
        # topology in PERF.md); the reference-topology number follows on
        # stderr so both are recorded every round. Presets resolve through
        # family_defaults so this always benches the shipped configuration.
        tile = opt.tile if opt.tile is not None else 24
        depth, width = family_defaults("fast")
        result = bench(family="fast", depth=depth, width=width,
                       scale=opt.scale,
                       batch=opt.batch, tile=tile, int8=opt.int8,
                       refine_blocks=opt.refine_blocks,
                       refine_width=opt.refine_width)
        depth, width = family_defaults("sr")
        ref = bench(family="sr", depth=depth, width=width,
                    scale=opt.scale, batch=opt.batch, tile=tile)
        print(f"reference-topology diagnostic: {json.dumps(ref)}",
              file=sys.stderr)
    print(json.dumps(result))
