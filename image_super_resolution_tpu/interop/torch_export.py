"""Export flax checkpoints back to reference-layout torch state_dicts.

The inverse of torch_import.py: migration in BOTH directions. A user who
trained here can hand the result to anyone still running the PyTorch
reference — the exported dict loads with ``strict=True`` into the
reference's ResNet/EResNet modules (utils/models.py:592-650 key layout,
proven by round-trip + live-module tests in tests/test_interop.py).

Layout notes (mirror of torch_import.py):
- flax conv kernel HWIO -> torch OIHW: ``transpose(3, 2, 0, 1)``.
- BatchNorm: flax splits trainables (params.bn.scale/bias) from running
  stats (batch_stats.bn.mean/var); torch keeps all four plus
  ``num_batches_tracked`` (emitted as 0 — torch only uses it for momentum
  ramping during training).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def conv_kernel_to_torch(w_hwio: np.ndarray) -> np.ndarray:
    """flax HWIO -> torch Conv2d OIHW."""
    return np.ascontiguousarray(np.asarray(w_hwio).transpose(3, 2, 0, 1))


def _emit_block(
    sd: Dict[str, np.ndarray],
    tprefix: str,
    params: Dict[str, Any],
    stats: Optional[Dict[str, Any]] = None,
) -> None:
    """ConvBlock subtree -> reference Conv/ConvWithoutBN state-dict keys."""
    sd[f"{tprefix}.conv.weight"] = conv_kernel_to_torch(params["conv"]["kernel"])
    if "bias" in params["conv"]:
        sd[f"{tprefix}.conv.bias"] = np.ascontiguousarray(
            np.asarray(params["conv"]["bias"])
        )
    if "bn" in params:
        sd[f"{tprefix}.bn.weight"] = np.asarray(params["bn"]["scale"])
        sd[f"{tprefix}.bn.bias"] = np.asarray(params["bn"]["bias"])
        bn_stats = (stats or {}).get("bn", {})
        sd[f"{tprefix}.bn.running_mean"] = np.asarray(
            bn_stats.get("mean", np.zeros_like(params["bn"]["scale"]))
        )
        sd[f"{tprefix}.bn.running_var"] = np.asarray(
            bn_stats.get("var", np.ones_like(params["bn"]["scale"]))
        )
        sd[f"{tprefix}.bn.num_batches_tracked"] = np.asarray(0, np.int64)


def export_generator_state(
    params: Dict[str, Any],
    batch_stats: Optional[Dict[str, Any]] = None,
    prefix: str = "",
) -> Dict[str, np.ndarray]:
    """SRGenerator (params, batch_stats) -> reference ResNet/EResNet
    state_dict (the exact inverse of torch_import.import_generator_state).
    Pass ``prefix="res_net."`` for the SRGAN wrapper layout.
    """
    stats = batch_stats or {}
    g = lambda k: f"{prefix}{k}"
    sd: Dict[str, np.ndarray] = {}

    _emit_block(sd, g("conv0"), params["head"], stats.get("head"))

    depth = 0
    while f"rrdb{depth}" in params:
        rrdb_p = params[f"rrdb{depth}"]
        rrdb_s = stats.get(f"rrdb{depth}", {})
        for j in range(3):
            rdb_p = rrdb_p[f"rdb{j}"]
            rdb_s = rrdb_s.get(f"rdb{j}", {})
            for k in range(4):
                _emit_block(
                    sd, g(f"residual.{depth}.net.{j}.conv{k}"),
                    rdb_p[f"conv{k}"], rdb_s.get(f"conv{k}"),
                )
            _emit_block(
                sd, g(f"residual.{depth}.net.{j}.conv"),
                rdb_p["conv_fuse"], rdb_s.get("conv_fuse"),
            )
        depth += 1

    _emit_block(sd, g("conv1"), params["trunk_conv"], stats.get("trunk_conv"))

    n_up = 0
    while f"up{n_up}" in params:
        # Upsampler nests its ConvBlock under "conv" (ops/blocks.Upsampler)
        _emit_block(sd, g(f"scaler.{n_up}.net.0"), params[f"up{n_up}"]["conv"])
        n_up += 1

    _emit_block(sd, g("conv2"), params["tail"], None)
    return sd


def save_torch_state_dict(
    path,
    params: Dict[str, Any],
    batch_stats: Optional[Dict[str, Any]] = None,
    prefix: str = "",
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """torch.save a reference-layout state_dict (tensors, fp32) to ``path``.

    The file loads on any torch install with
    ``net.load_state_dict(torch.load(path)["state_dict"], strict=True)``
    against the reference's ResNet/EResNet.
    """
    import torch

    sd = export_generator_state(params, batch_stats, prefix=prefix)
    payload = {
        "state_dict": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        "meta": dict(meta or {}),
    }
    torch.save(payload, str(path))
