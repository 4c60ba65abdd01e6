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


def linear_to_torch(
    w_in_out: np.ndarray, feature_hwc: Optional[tuple] = None
) -> np.ndarray:
    """flax Dense (in, out) -> torch Linear (out, in); with ``feature_hwc``
    the input columns are permuted back from H-major (H,W,C) to torch's
    C-major (C,H,W) flattening (inverse of torch_import.linear_to_flax)."""
    w = np.ascontiguousarray(np.asarray(w_in_out).T)  # (out, in)
    if feature_hwc is not None:
        h, w_, c = feature_hwc
        out = w.shape[0]
        w = w.reshape(out, h, w_, c).transpose(0, 3, 1, 2).reshape(out, c * h * w_)
    return np.ascontiguousarray(w)


def export_discriminator_state(
    params: Dict[str, Any],
    batch_stats: Optional[Dict[str, Any]] = None,
    prefix: str = "",
    pooled_hw: tuple = (6, 6),
) -> Dict[str, np.ndarray]:
    """Discriminator (params, batch_stats) -> reference Discriminator
    state_dict (inverse of torch_import.import_discriminator_state)."""
    stats = batch_stats or {}
    g = lambda k: f"{prefix}{k}"
    sd: Dict[str, np.ndarray] = {}
    i = 0
    out_ch = 0
    while f"block{i}" in params:
        _emit_block(sd, g(f"conv_blocks.{i}"), params[f"block{i}"],
                    stats.get(f"block{i}"))
        out_ch = params[f"block{i}"]["conv"]["kernel"].shape[-1]
        i += 1
    h, w = pooled_hw
    fc1 = params["fc1"]["dense"]
    sd[g("fc1.0.weight")] = linear_to_torch(fc1["kernel"], (h, w, out_ch))
    sd[g("fc1.0.bias")] = np.asarray(fc1["bias"])
    fc2 = params["fc2"]["dense"]
    sd[g("fc2.weight")] = linear_to_torch(fc2["kernel"])
    sd[g("fc2.bias")] = np.asarray(fc2["bias"])
    return sd


def _emit_residual_block(
    sd: Dict[str, np.ndarray],
    tprefix: str,
    params: Dict[str, Any],
    stats: Optional[Dict[str, Any]] = None,
) -> None:
    s = stats or {}
    _emit_block(sd, f"{tprefix}.m.0", params["conv0"], s.get("conv0"))
    _emit_block(sd, f"{tprefix}.m.1", params["conv1"], s.get("conv1"))


def export_denoiser_state(
    params: Dict[str, Any],
    batch_stats: Optional[Dict[str, Any]] = None,
    prefix: str = "",
) -> Dict[str, np.ndarray]:
    """Denoiser (params, batch_stats) -> reference Denoise state_dict
    (current revision; inverse of torch_import.import_denoiser_state)."""
    stats = batch_stats or {}
    g = lambda k: f"{prefix}{k}"
    sd: Dict[str, np.ndarray] = {}
    _emit_block(sd, g("conv0.0"), params["head"], stats.get("head"))
    for out_name, seq_key in (
        ("res0_", "residual_0"), ("res1_", "residual_1"), ("res2_", "residual_2")
    ):
        n = 0
        while f"{out_name}{n}" in params:
            _emit_residual_block(sd, g(f"{seq_key}.{n}"),
                                 params[f"{out_name}{n}"],
                                 stats.get(f"{out_name}{n}"))
            n += 1
    _emit_block(sd, g("residual_conv0"), params["down"], stats.get("down"))
    _emit_block(sd, g("conv1"), params["trunk_conv"], stats.get("trunk_conv"))
    _emit_block(sd, g("conv2.0"), params["tail"], stats.get("tail"))
    return sd


def save_torch_state_dict(
    path,
    params: Dict[str, Any],
    batch_stats: Optional[Dict[str, Any]] = None,
    prefix: str = "",
    meta: Optional[Dict[str, Any]] = None,
    family: str = "sr",
) -> None:
    """torch.save a reference-layout state_dict (tensors, fp32) to ``path``.

    The file loads on any torch install with
    ``net.load_state_dict(torch.load(path)["state_dict"], strict=True)``
    against the reference class for ``family``: "sr" -> ResNet/EResNet
    (utils/models.py:592/621), "denoise" -> Denoise (utils/models.py:672),
    "discriminator" -> Discriminator (utils/models.py:513).
    """
    import torch

    exporters = {
        "sr": export_generator_state,
        "denoise": export_denoiser_state,
        "discriminator": export_discriminator_state,
    }
    if family not in exporters:
        raise ValueError(f"unknown family {family!r}; one of {sorted(exporters)}")
    sd = exporters[family](params, batch_stats, prefix=prefix)
    payload = {
        "state_dict": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        "meta": dict(meta or {}),
    }
    torch.save(payload, str(path))
