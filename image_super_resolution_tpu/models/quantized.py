"""Post-training int8 serving path for the fast families ("fast", "denoise_fast").

Why this exists: the v5e MXU runs int8 at 2x its bf16 rate (394 vs 197
TOP/s peak). For the REFERENCE topology int8 was measured dead — its
serving GEMMs (K=288-576, N=32-192) ran 0.97x bf16 in XLA and collapsed to
0.19x in the best hand kernel (PERF.md int8 reconciliation). The fast
flagship changes the shapes: every trunk conv is a 3x3 128->128
contraction (GEMM K=1152, N=128), exactly where int8 pipelines start to
pay, so the question is re-opened for this family only
(scripts/bench_int8_fast.py is the on-chip gate; the reference families
stay bf16 per the settled measurements).

Scheme (standard symmetric PTQ, chosen for MXU fit — both conv operands
int8, accumulation int32, everything else fused epilogue):

- **Weights**: per-OUTPUT-channel symmetric int8 (scale = max|w[..., o]| /
  127), the usual conv PTQ granularity — per-channel dequant is one fused
  broadcast multiply on the conv output.
- **Activations**: per-tensor symmetric int8 with STATIC scales calibrated
  on sample batches (running max of |x| at every quantized conv input).
  Static scales keep the serving graph shape-static and jit-compiled once.
- **Quantized ops**: the 2*depth+1 trunk-side 128->128 convs — ~96% of the
  FLOPs. The 3-channel head and the output-facing tail (tanh, 3*scale^2
  channels) stay bf16: together <4% of FLOPs and the most
  quality-sensitive ends of the graph.
- **Residual stream in fp32**: conv outputs are dequantized (int32 ->
  fp32 * per-channel scale + bias), activated, and re-quantized fresh at
  each conv input, so quantization noise never accumulates across the
  depth-14 trunk through the skip connections. The elementwise chain
  (dequant -> leaky_relu -> requant) fuses into the conv epilogues; the
  MXU does all the heavy lifting in int8.

The bf16 mirror (``fast_forward``) reproduces models/fast.py
FastSRGenerator bit-for-bit (tests/test_quantized.py) — calibration hooks
and the int8 graph are the same function with hooks swapped in, so the
quantized path can never drift from the model it approximates.

No reference counterpart (thnak/image_super_resolution ships no
quantization); this is TPU-first perf work on the flagship family.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import normalize, tanh_to_uint8
from ..ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

_LEAKY = 0.01  # the fast trunk's activation slope (models/fast.py)


def _conv(x, w, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )


def _bf16_conv_act(x, p, act: bool):
    """One fused-ConvBlock step exactly as flax runs it: promote operands to
    bf16, conv, add bias, optional leaky_relu."""
    w = p["conv"]["kernel"].astype(jnp.bfloat16)
    b = p["conv"]["bias"].astype(jnp.bfloat16)
    y = _conv(x.astype(jnp.bfloat16), w) + b
    return jax.nn.leaky_relu(y, negative_slope=_LEAKY) if act else y


def trunk_sites(depth: int):
    """Names of the quantized conv sites, in forward order."""
    for i in range(depth):
        yield f"block{i}.conv0"
        yield f"block{i}.conv1"
    yield "trunk_conv"


def _site_params(params, site: str):
    if site == "trunk_conv":
        return params["trunk_conv"]
    block, conv = site.split(".")
    return params[block][conv]


def fast_forward(
    params: Dict[str, Any],
    x: jnp.ndarray,
    depth: int,
    add_rate: float,
    scale: int,
    record: Optional[Callable[[str, jnp.ndarray], None]] = None,
    quant: Optional[Callable[[str, jnp.ndarray], jnp.ndarray]] = None,
    downshuffle: int = 1,
    refine_blocks: int = 0,
) -> jnp.ndarray:
    """models/fast.py FastSRGenerator forward, reimplemented functionally.

    - ``record(site, tensor)`` is called with every quantized-conv INPUT
      (calibration hook).
    - ``quant(site, tensor) -> tensor`` replaces each trunk conv
      (conv+bias+act for conv0 sites, conv+bias for the rest) with the
      int8 version; when given, the residual stream runs in fp32 so
      requantization noise never compounds.
    - ``downshuffle`` mirrors the flax module's sub-pixel front (the
      denoise_fast family): edge-pad + space_to_depth in, tail shuffle
      scale*downshuffle, crop back out.
    - With both hooks absent this is bit-identical to the flax module in
      bf16 (tested), including the float32 output cast.
    """
    stream_dtype = jnp.float32 if quant is not None else jnp.bfloat16

    def site_conv(site, h, act):
        if record is not None:
            record(site, h)
        if quant is not None:
            return quant(site, h)
        return _bf16_conv_act(h, _site_params(params, site), act)

    x = x.astype(jnp.bfloat16)
    h_in, w_in = x.shape[1], x.shape[2]
    f = downshuffle
    pad_h = -h_in % f
    pad_w = -w_in % f
    if f > 1:
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="edge")
        x = pixel_unshuffle(x, f)
    x = _bf16_conv_act(x, params["head"], act=True).astype(stream_dtype)
    h = x
    for i in range(depth):
        t = site_conv(f"block{i}.conv0", h, act=True)
        t = site_conv(f"block{i}.conv1", t, act=False)
        h = h + t.astype(stream_dtype) * jnp.asarray(add_rate, stream_dtype)
    t = site_conv("trunk_conv", h, act=False)
    x = x + t.astype(stream_dtype)
    r = scale * f
    if refine_blocks:
        # Full-res refinement tail (models/fast.py): stays bf16/unquantized
        # like the born-folded tail — it is output-facing and a small share of FLOPs.
        x = _bf16_conv_act(x.astype(jnp.bfloat16), params["refine_proj"],
                           act=True)
        if r > 1:
            x = pixel_shuffle(x, r)
        for i in range(refine_blocks):
            p = params[f"refine{i}"]
            t = _bf16_conv_act(x, p["conv0"], act=True)
            t = _bf16_conv_act(t, p["conv1"], act=False)
            x = x + t * jnp.asarray(add_rate, t.dtype)
        x = jnp.tanh(_bf16_conv_act(x, params["tail"], act=False))
    else:
        x = jnp.tanh(_bf16_conv_act(x, params["tail"], act=False))
        if r > 1:
            x = pixel_shuffle(x, r)
    if pad_h or pad_w:
        x = x[:, : h_in * scale, : w_in * scale, :]
    return x.astype(jnp.float32)


# ------------------------------------------------------------ calibration --


def calibrate_scales(
    params: Dict[str, Any],
    batches,
    depth: int,
    add_rate: float,
    scale: int,
    downshuffle: int = 1,
    refine_blocks: int = 0,
    percentile: Optional[float] = None,
) -> Dict[str, float]:
    """Static per-tensor activation scales: running max|x| over the
    calibration batches at every quantized conv input, / 127.

    ``batches``: iterable of NORMALIZED float inputs (what the model sees
    after data.transforms.normalize).

    ``percentile`` (e.g. 99.9) clips the calibration statistic to that
    percentile of |x| instead of the max — rare outlier activations stop
    stretching the int8 step size for the bulk of the distribution, at
    the cost of saturating the outliers. amax (None) is the conservative
    default; the percentile option is the measured lever for
    high-fidelity checkpoints where amax PTQ cost grows (PERF.md round-5
    int8-at-high-fidelity section)."""
    maxes: Dict[str, jnp.ndarray] = {}

    @jax.jit
    def one_batch(params, x):
        seen: Dict[str, jnp.ndarray] = {}

        def record(site, t):
            a = jnp.abs(t.astype(jnp.float32))
            seen[site] = (
                jnp.max(a) if percentile is None
                else jnp.percentile(a.ravel(), percentile)
            )

        fast_forward(params, x, depth, add_rate, scale, record=record,
                     downshuffle=downshuffle, refine_blocks=refine_blocks)
        return seen

    for x in batches:
        # one transfer for the whole dict: per-site float() fetches would
        # pay the relay's ~34 ms RTT 2*depth+1 times per batch
        seen = jax.device_get(one_batch(params, jnp.asarray(x)))
        for site, m in seen.items():
            maxes[site] = max(maxes.get(site, 0.0), float(m))
    if not maxes:
        raise ValueError("calibrate_scales needs at least one batch")
    # guard degenerate all-zero activations (scale 0 would divide by zero)
    return {site: max(m, 1e-8) / 127.0 for site, m in maxes.items()}


def quantize_fast_params(
    params: Dict[str, Any],
    act_scales: Dict[str, float],
    depth: int,
) -> Dict[str, Any]:
    """Fused fp32 param tree -> int8 serving tree.

    Per site: int8 kernel ``w_q``, fp32 ``deq`` = act_scale * per-channel
    weight scale (the single fused dequant multiplier for the int32 conv
    output), fp32 bias. Head/tail params — and the full-res refinement tail
    when present — pass through untouched (bf16 compute path)."""
    q: Dict[str, Any] = {"head": params["head"], "tail": params["tail"]}
    for k in params:
        if str(k).startswith("refine"):
            q[k] = params[k]
    for site in trunk_sites(depth):
        p = _site_params(params, site)
        w = np.asarray(p["conv"]["kernel"], np.float32)  # HWIO
        w_scale = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
        w_q = np.clip(np.rint(w / w_scale), -127, 127).astype(np.int8)
        s_x = float(act_scales[site])
        q[site] = {
            "w_q": jnp.asarray(w_q),
            "inv_x": jnp.asarray(1.0 / s_x, jnp.float32),
            "deq": jnp.asarray(s_x * w_scale, jnp.float32),
            "bias": jnp.asarray(p["conv"]["bias"], jnp.float32),
        }
    return q


def int8_forward(
    qparams: Dict[str, Any],
    x: jnp.ndarray,
    depth: int,
    add_rate: float,
    scale: int,
    downshuffle: int = 1,
    refine_blocks: int = 0,
) -> jnp.ndarray:
    """Serving forward with the trunk convs in int8 (int32 accumulation)."""

    def quant(site, h):
        p = qparams[site]
        h8 = jnp.clip(
            jnp.round(h.astype(jnp.float32) * p["inv_x"]), -127, 127
        ).astype(jnp.int8)
        y = _conv(h8, p["w_q"], preferred=jnp.int32)
        y = y.astype(jnp.float32) * p["deq"] + p["bias"]
        if site.endswith("conv0"):
            y = jax.nn.leaky_relu(y, negative_slope=_LEAKY)
        return y

    return fast_forward(qparams, x, depth, add_rate, scale, quant=quant,
                        downshuffle=downshuffle, refine_blocks=refine_blocks)


# ------------------------------------------------------------- deployment --


@dataclass
class Int8DeployedFast:
    """uint8 NHWC -> uint8 NHWC int8-trunk server, same call surface as
    models.deploy.DeployedModel (so the tiled/data-parallel engines accept
    it unchanged). Build with :func:`quantize_deployed`."""

    spec: Any  # DeploySpec (family "fast")
    params: Dict[str, Any]

    def __post_init__(self):
        mean = tuple(float(v) for v in self.spec.mean)
        std = tuple(float(v) for v in self.spec.std)
        depth, add_rate = self.spec.depth, self.spec.add_rate
        scale = self.spec.output_scale  # 1 for denoise_fast
        downshuffle = getattr(self.spec, "downshuffle", 1) or 1
        refine_blocks = getattr(self.spec, "refine_blocks", 0) or 0

        def apply(params, u8):
            x = normalize(u8, mean, std)
            y = int8_forward(params, x, depth, add_rate, scale,
                             downshuffle=downshuffle,
                             refine_blocks=refine_blocks)
            return tanh_to_uint8(y)

        self._apply = jax.jit(apply)

    def __call__(self, u8_batch: jnp.ndarray) -> jnp.ndarray:
        return self._apply(self.params, u8_batch)

    @property
    def raw_apply(self):
        return self._apply


def quantize_deployed(deployed, calib_u8_batches,
                      percentile: Optional[float] = None) -> Int8DeployedFast:
    """PTQ a fast-family DeployedModel using uint8 calibration batches
    (e.g. the first tile batch of the image being served — self-calibration
    costs one extra bf16 pass and needs no dataset at serving time).
    ``percentile``: see :func:`calibrate_scales`."""
    spec = deployed.spec
    if spec.family not in ("fast", "denoise_fast"):
        raise ValueError(
            "int8 serving is built (and measured) for the fast families "
            f"only; got family={spec.family!r} — the reference topologies' "
            "int8 was measured dead at their conv shapes (PERF.md)."
        )
    mean = tuple(float(v) for v in spec.mean)
    std = tuple(float(v) for v in spec.std)
    params32 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
        else jnp.asarray(a),
        deployed.params,
    )
    batches = [normalize(jnp.asarray(b), mean, std) for b in calib_u8_batches]
    scales = calibrate_scales(params32, batches, spec.depth, spec.add_rate,
                              spec.output_scale,
                              downshuffle=getattr(spec, "downshuffle", 1) or 1,
                              refine_blocks=getattr(spec, "refine_blocks", 0)
                              or 0,
                              percentile=percentile)
    # Quantization is host-side numpy work: fetch the whole tree in ONE
    # device_get (a per-site np.asarray inside quantize_fast_params would
    # pay 2*depth+1 relay round trips), then commit the finished int8 tree
    # back to the device once so serving never re-uploads numpy per call.
    qtree = quantize_fast_params(jax.device_get(params32), scales, spec.depth)
    qtree = jax.tree_util.tree_map(jnp.asarray, qtree)
    return Int8DeployedFast(spec, qtree)
