"""Truncated VGG19 feature extractor for the perceptual loss.

Parity with reference ``TruncatedVGG19`` (utils/models.py:454-510): truncate
the VGG19 feature stack at the j-th conv after the (i-1)-th maxpool;
``before_act=True`` stops right after the conv (pre-activation features, the
ESRGAN convention used when --enchant), ``before_act=False`` includes the
ReLU (post-activation, SRGAN convention). Defaults (i=5, j=4) from
utils/loss.py:7.

Weights: the reference downloads torchvision IMAGENET1K_V1 weights at
construction. This environment has no torchvision and no network, so weights
load from a local ``.npz`` (see ``load_vgg19_npz`` /
``convert_torch_vgg19``); absent that, He-init random features with a fixed
seed are used — random VGG features still provide a usable structural loss
and keep the GAN phase runnable, with a loud warning.
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG19 'features' plan: conv channel counts with 'M' = 2x2/2 maxpool.
VGG19_PLAN: Tuple[Union[int, str], ...] = (
    64, 64, "M",
    128, 128, "M",
    256, 256, 256, 256, "M",
    512, 512, 512, 512, "M",
    512, 512, 512, 512, "M",
)


def _truncation_point(i: int, j: int) -> int:
    """Number of conv layers to keep: the j-th conv after the (i-1)-th pool."""
    pools = 0
    convs_after = 0
    keep = 0
    for item in VGG19_PLAN:
        if item == "M":
            pools += 1
            convs_after = 0
        else:
            keep += 1
            convs_after += 1
        if pools == i - 1 and convs_after == j:
            return keep
    raise ValueError(f"invalid (i={i}, j={j}) for VGG19")


class TruncatedVGG19(nn.Module):
    """VGG19 features truncated at (i, j); input is a normalized image batch."""

    i: int = 5
    j: int = 4
    before_act: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        keep = _truncation_point(self.i, self.j)
        x = x.astype(self.dtype)
        conv_idx = 0
        for item in VGG19_PLAN:
            if conv_idx == keep:
                break
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            conv_idx += 1
            last = conv_idx == keep
            x = nn.Conv(
                features=int(item),
                kernel_size=(3, 3),
                padding=((1, 1), (1, 1)),
                # He init keeps feature magnitude O(1) through the ReLU stack,
                # so the random-weights fallback still yields a usable
                # perceptual distance (flax's lecun default attenuates ~2^-16
                # over 16 layers -> content loss underflows). Loaded ImageNet
                # weights overwrite this.
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv{conv_idx - 1}",
            )(x)
            if not (last and self.before_act):
                x = nn.relu(x)
        return x.astype(jnp.float32)


def load_vgg19_npz(path: Union[str, Path], params: Dict[str, Any]) -> Dict[str, Any]:
    """Fill a TruncatedVGG19 params tree from an npz of
    {'conv{k}/kernel','conv{k}/bias'} arrays (HWIO kernels)."""
    data = np.load(Path(path))
    out = {}
    for name, leaf in params.items():
        kernel = data[f"{name}/kernel"]
        bias = data[f"{name}/bias"]
        if kernel.shape != leaf["kernel"].shape:
            raise ValueError(f"{name}: shape {kernel.shape} != {leaf['kernel'].shape}")
        out[name] = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}
    return out


def convert_torch_vgg19(state_dict_path: Union[str, Path], out_path: Union[str, Path]) -> None:
    """One-time converter: torchvision vgg19 state_dict (.pth) -> npz.

    Torch conv weights are OIHW; flax wants HWIO. Run wherever a torchvision
    VGG19 checkpoint is available, then ship the npz with the training job.
    """
    import torch  # local import: torch is a conversion-time-only dependency

    sd = torch.load(Path(state_dict_path), map_location="cpu", weights_only=True)
    arrays: Dict[str, np.ndarray] = {}
    conv_idx = 0
    for key in sorted(
        (k for k in sd if k.startswith("features.") and k.endswith(".weight")),
        key=lambda k: int(k.split(".")[1]),
    ):
        w = sd[key].numpy()
        if w.ndim != 4:
            continue
        b = sd[key.replace(".weight", ".bias")].numpy()
        arrays[f"conv{conv_idx}/kernel"] = np.transpose(w, (2, 3, 1, 0))
        arrays[f"conv{conv_idx}/bias"] = b
        conv_idx += 1
    np.savez(Path(out_path), **arrays)


def init_vgg_params(
    model: TruncatedVGG19,
    weights_path: Optional[Union[str, Path]] = None,
    with_status: bool = False,
):
    """Init (and optionally load) frozen VGG params.

    ``with_status=True`` returns ``(params, loaded)`` where ``loaded`` says
    whether real ImageNet weights were found — callers use it to switch the
    perceptual loss into its calibrated random-feature mode (PERF.md §random
    VGG) when they were not.
    """
    import jax

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))["params"]
    loaded = False
    if weights_path is not None and Path(weights_path).exists():
        p = Path(weights_path)
        if p.suffix in (".pth", ".pt"):
            # Raw torchvision state_dict: auto-convert once to a cached npz
            # beside it (torch is installed here), so users with torchvision
            # VGG19 weights get reference-parity perceptual loss without a
            # manual convert_torch_vgg19 call. The conversion writes ONCE,
            # directly into an atomic tmp file beside the cache (mkstemp +
            # os.replace, so concurrent multi-process training never loads
            # a half-written zip); a read-only weights dir falls back to a
            # private temp dir. A broken .pth fails loudly either way —
            # conversion errors propagate, never retried in a fallback.
            import atexit
            import os
            import shutil
            import tempfile

            cached = p.parent / (p.name + ".npz")
            if not cached.exists() or cached.stat().st_mtime < p.stat().st_mtime:
                print(f"converting torchvision VGG19 {p} -> {cached}", flush=True)
                try:
                    # suffix must END in .npz: np.savez appends it otherwise
                    fd, tmp = tempfile.mkstemp(
                        dir=str(p.parent), suffix=".tmp.npz"
                    )
                except OSError:  # weights dir not writable: skip the cache
                    tmp_dir = tempfile.mkdtemp(prefix="isr_vgg_")
                    atexit.register(shutil.rmtree, tmp_dir, ignore_errors=True)
                    converted = Path(tmp_dir) / (p.name + ".npz")
                    convert_torch_vgg19(p, converted)  # errors propagate
                    cached = converted
                else:
                    os.close(fd)
                    try:
                        convert_torch_vgg19(p, tmp)  # errors propagate
                        os.replace(tmp, cached)
                    except BaseException:
                        try:
                            os.unlink(tmp)
                        except OSError:
                            pass
                        raise
            p = cached
        params = load_vgg19_npz(p, params)
        loaded = True
    elif weights_path is not None:
        warnings.warn(f"VGG weights {weights_path} not found; using random features")
    else:
        warnings.warn(
            "TruncatedVGG19 running with RANDOM weights (no ImageNet checkpoint "
            "available). Perceptual loss is a structural proxy; pass "
            "--vgg_weights for parity with the reference."
        )
    return (params, loaded) if with_status else params
