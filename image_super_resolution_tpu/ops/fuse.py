"""BatchNorm -> conv folding as a pure param-tree transform.

The reference mutates live nn.Modules at export time (fuse_conv_and_bn,
utils/models.py:366-406; Model.fuse, models.py:741-751). The TPU-native
version is a functional transform: take the ``params``/``batch_stats``
collections of a model built with ``use_bn=True`` and produce the params of
the *same architecture* built with ``use_bn=False`` (biased convs). Because
ConvBlock names its children ``conv``/``bn`` in both modes, the fused tree
drops ``bn`` nodes and adds the folded bias under ``conv``.

Folding: W' = W * g / sqrt(var + eps);  b' = beta - g * mean / sqrt(var + eps)
(the use_bn conv is bias-free, reference Conv at utils/models.py:92).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp

_BN_EPS = 1e-5


def _is_mapping(x: Any) -> bool:
    return isinstance(x, Mapping)


def fuse_conv_bn(
    params: Mapping[str, Any],
    batch_stats: Mapping[str, Any],
    eps: float = _BN_EPS,
) -> Dict[str, Any]:
    """Fold every conv+bn pair; returns a params tree for the no-BN model."""

    def rec(p: Mapping[str, Any], s: Mapping[str, Any]) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for key, val in p.items():
            if key == "bn":
                continue  # consumed alongside its sibling conv
            if key == "conv" and "bn" in p:
                bn_p = p["bn"]
                bn_s = s.get("bn", {})
                gamma = bn_p["scale"].astype(jnp.float32)
                beta = bn_p["bias"].astype(jnp.float32)
                mean = bn_s["mean"].astype(jnp.float32)
                var = bn_s["var"].astype(jnp.float32)
                scale = gamma / jnp.sqrt(var + eps)
                kernel = val["kernel"].astype(jnp.float32)
                fused_kernel = kernel * scale  # broadcast over HWIO out-channel
                old_bias = val.get("bias")
                bias = beta - mean * scale
                if old_bias is not None:
                    bias = bias + old_bias.astype(jnp.float32) * scale
                out["conv"] = {
                    "kernel": fused_kernel.astype(kernel.dtype),
                    "bias": bias.astype(kernel.dtype),
                }
            elif _is_mapping(val):
                out[key] = rec(val, s.get(key, {}) if _is_mapping(s) else {})
            else:
                out[key] = val
        return out

    return rec(params, batch_stats)


def split_fused_variables(variables: Mapping[str, Any]) -> Tuple[Dict[str, Any], bool]:
    """Convenience: fuse a full flax variables dict {'params', 'batch_stats'}.

    Returns (fused_params, had_bn).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    fused = fuse_conv_bn(params, stats)
    return fused, bool(stats)
