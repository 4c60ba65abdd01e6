#!/usr/bin/env python
"""Per-stage time breakdown of the optimized x4 deployment graph.

Locates where the gap between the conv-only ceiling (~20 ms/iter at measured
peak) and the end-to-end time goes: head / trunk (48 scatter RDBs) /
upsample stages / folded tail / normalize+decode. Long-chain pool harness.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/bench_breakdown.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from _bench_util import pick_iters, timed_chain_pool  # noqa: E402

from image_super_resolution_tpu.models.deploy import DeployedModel, DeploySpec


def main():
    B, T, P = 256, 24, 4
    spec = DeploySpec(family="sr", depth=16, scale=4)
    std_model = spec.build_model()
    variables = std_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    deployed = DeployedModel(spec, variables["params"])
    params = deployed.params
    model = deployed.model

    rng = np.random.default_rng(0)
    xs8 = jnp.asarray(rng.integers(0, 256, (P, B, T, T, 3)), jnp.uint8)
    xs64 = jnp.asarray(rng.standard_normal((P, B, T, T, 64)) * 0.3, jnp.bfloat16)

    from image_super_resolution_tpu.ops.scatter import ScatterRDB

    rdb = ScatterRDB(64, ("leaky_relu", 0.01), 0.2)
    rdb_params = params["rrdb0"]["rdb0"]

    # Measure by nested-prefix differences instead of reconstructing stages:
    #   full        = normalize + head + trunk + ups + tail + decode
    #   one RDB     = ScatterRDB alone at (B,T,T,64)
    #   full model  = deployed.raw_apply
    cases = {}

    it = pick_iters(0.6)
    cases["one_scatter_rdb"] = timed_chain_pool(
        lambda x: rdb.apply({"params": rdb_params}, x), xs64, it)

    it = pick_iters(35.0)
    cases["full_model"] = timed_chain_pool(
        lambda x: deployed.raw_apply(params, x), xs8, it)

    # trunk-only: run the 48 RDBs + rrdb scale-adds on a 64-ch input
    from image_super_resolution_tpu.models.optimized import ScatterRRDB

    def trunk(x):
        h = x
        for i in range(16):
            h = ScatterRRDB(64, 0.2).apply({"params": params[f"rrdb{i}"]}, h)
        return h

    it = pick_iters(30.0)
    cases["trunk_48rdb"] = timed_chain_pool(trunk, xs64, it)

    print(f"b{B} t{T} x4 16-RRDB breakdown (ms/iter):")
    for k, v in cases.items():
        print(f"  {k:>18}: {v * 1e3:8.3f}")
    print(f"  trunk - 48x(one rdb): {cases['trunk_48rdb']*1e3 - 48*cases['one_scatter_rdb']*1e3:8.3f}"
          "  (RRDB scale-add + inter-block overhead)")
    print(f"  full - trunk        : {cases['full_model']*1e3 - cases['trunk_48rdb']*1e3:8.3f}"
          "  (normalize/head/ups/tail/decode)")


if __name__ == "__main__":
    main()
