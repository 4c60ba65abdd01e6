"""Winograd fast convolution for the 3x3 trunk convs.

PERF.md round 1 showed the optimized graph sits at the *direct-conv* bf16
FLOP ceiling (~105 eff TFLOP/s of 173 peak). The only way past it is to do
fewer multiplies: Winograd F(m, 3) computes an m x m output tile of a 3x3
convolution with (m+2)^2 multiplies instead of 9 m^2 —

    F(2,3): 16/36  = 2.25x fewer MXU multiplies
    F(4,3): 36/144 = 4.00x fewer (with larger, less-accurate transforms)

Expressed in pure XLA (not Pallas): the input transform is 16 (or 36)
strided slices combined with +/- adds (VPU work that XLA fuses), the heart is
ONE batched matmul einsum over the tile positions — exactly the MXU shape XLA
schedules best — and the inverse transform is another fused add network.
Round-1 Pallas lesson (PERF.md): beat XLA by changing the math, not by
re-scheduling its convs.

Numerics: transforms and accumulation run in fp32 (the 4.0/-5.0 coefficients
of F(4,3) amplify bf16 rounding); the matmul operands are cast to ``dtype``
(bf16 on TPU) with fp32 accumulation — the same precision contract as the
direct-conv path. Validated <= 1 uint8 LSB end to end (tests/test_winograd.py).

Reference: Lavin & Gray, "Fast Algorithms for Convolutional Neural Networks"
(arXiv:1509.09308). The reference repo (utils/models.py Conv) uses plain
direct conv everywhere — this is a TPU-side speed rewrite with identical
results, applied by models/optimized.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# F(2x2, 3x3) transforms: Y = A^T [ (G g G^T) .* (B^T d B) ] A
_BT2 = np.array([
    [1, 0, -1, 0],
    [0, 1, 1, 0],
    [0, -1, 1, 0],
    [0, 1, 0, -1],
], np.float32)
_G2 = np.array([
    [1, 0, 0],
    [0.5, 0.5, 0.5],
    [0.5, -0.5, 0.5],
    [0, 0, 1],
], np.float32)
_AT2 = np.array([
    [1, 1, 1, 0],
    [0, 1, -1, -1],
], np.float32)

# F(4x4, 3x3) transforms (Lavin & Gray / NNPACK coefficients).
_BT4 = np.array([
    [4, 0, -5, 0, 1, 0],
    [0, -4, -4, 1, 1, 0],
    [0, 4, -4, -1, 1, 0],
    [0, -2, -1, 2, 1, 0],
    [0, 2, -1, -2, 1, 0],
    [0, 4, 0, -5, 0, 1],
], np.float32)
_G4 = np.array([
    [1 / 4, 0, 0],
    [-1 / 6, -1 / 6, -1 / 6],
    [-1 / 6, 1 / 6, -1 / 6],
    [1 / 24, 1 / 12, 1 / 6],
    [1 / 24, -1 / 12, 1 / 6],
    [0, 0, 1],
], np.float32)
_AT4 = np.array([
    [1, 1, 1, 1, 1, 0],
    [0, 1, -1, 2, -2, 0],
    [0, 1, 1, 4, 4, 0],
    [0, 1, -1, 8, -8, 1],
], np.float32)

_TRANSFORMS = {2: (_BT2, _G2, _AT2), 4: (_BT4, _G4, _AT4)}


def transform_kernel(w_hwio: jnp.ndarray, m: int = 2) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (t, t, Cin, Cout) Winograd-domain kernel, fp32.

    Pure param transform — do it once at deploy time (models/optimized.py)
    so the per-step cost is zero.
    """
    _, g, _ = _TRANSFORMS[m]
    g = jnp.asarray(g)
    w = w_hwio.astype(jnp.float32)
    return jnp.einsum("ui,vj,ijck->uvck", g, g, w)


@partial(jax.jit, static_argnames=("m", "dtype"))
def winograd_conv3x3(
    x: jnp.ndarray,
    w_wino: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    m: int = 2,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """'SAME' 3x3 convolution of NHWC ``x`` with a Winograd-domain kernel.

    ``w_wino`` is ``transform_kernel(w, m)``. Output matches
    ``lax.conv_general_dilated(x, w, 'SAME', NHWC)`` up to float reassociation.
    """
    bt, _, at = _TRANSFORMS[m]
    bt = jnp.asarray(bt)
    at = jnp.asarray(at)
    t = m + 2
    n, h, w_, c = x.shape

    nh = -(-h // m)
    nw = -(-w_ // m)
    # 'SAME' for 3x3 = 1 px halo; pad bottom/right so full tiles cover.
    xp = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (1, nh * m + 1 - h), (1, nw * m + 1 - w_), (0, 0)),
    )

    # Tile n covers padded rows [n*m, n*m + t); slice i collects row i of
    # every tile: xp[:, i : i + (nh-1)*m + 1 : m].
    rows = [xp[:, i : i + (nh - 1) * m + 1 : m] for i in range(t)]
    d = jnp.stack(
        [jnp.stack([r[:, :, j : j + (nw - 1) * m + 1 : m] for j in range(t)], 0)
         for r in rows],
        0,
    )  # (t, t, N, nh, nw, C)

    # Input transform (fp32 adds, fused by XLA), then ONE batched matmul on
    # the MXU with fp32 accumulation, then the inverse transform in fp32.
    d_t = jnp.einsum("ui,vj,ijnhwc->uvnhwc", bt, bt, d)
    mprod = jnp.einsum(
        "uvnhwc,uvck->uvnhwk",
        d_t.astype(dtype),
        w_wino.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    y = jnp.einsum("au,bv,uvnhwk->nhawbk", at, at, mprod)
    y = y.reshape(n, nh * m, nw * m, y.shape[-1])[:, :h, :w_]
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def direct_conv3x3(x: jnp.ndarray, w_hwio: jnp.ndarray,
                   b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference direct conv with the same signature (for tests/benches)."""
    y = jax.lax.conv_general_dilated(
        x, w_hwio.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)
