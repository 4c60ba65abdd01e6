"""Pallas kernel correctness (interpret mode on CPU; compiled path is
exercised on real hardware — measurements in ops/pallas/fused_rdb.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from image_super_resolution_tpu.ops.blocks import RDB
from image_super_resolution_tpu.ops.pallas.fused_rdb import (
    scatter_params_to_matmul,
    scatter_rdb_pallas,
)
from image_super_resolution_tpu.ops.scatter import ScatterRDB, rdb_params_to_scatter


def test_fused_rdb_kernel_matches_reference_rdb():
    c, g, t, b = 32, 16, 8, 4
    rdb = RDB(growth=g, act=("leaky_relu", 0.01), add_rate=0.2, use_bn=False,
              dtype=jnp.float32)
    x32 = jax.random.normal(jax.random.PRNGKey(0), (b, t, t, c)) * 0.5
    params = rdb.init(jax.random.PRNGKey(1), x32)["params"]
    want = np.asarray(rdb.apply({"params": params}, x32))

    scatter = rdb_params_to_scatter(params)
    mats = scatter_params_to_matmul(scatter)
    x16 = x32.astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = scatter_rdb_pallas(x16, *mats, tiles_per_block=2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want, rtol=0.1, atol=0.05
    )  # bf16 kernel vs fp32 reference
