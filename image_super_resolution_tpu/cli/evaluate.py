"""Evaluation CLI: PSNR / PSNR-Y / SSIM over a validation manifest.

The reference has NO evaluation loop at all (SURVEY.md §5 — its Y-channel
metric transform existed but was never called; utils/datasets.py:159-166).
This CLI measures a deployed artifact against ground truth with the standard
SR protocol (PSNR on the BT.601 Y channel, 4-px border crop) and reports the
bicubic-upsample baseline alongside.

Deterministic: fixed-seed center crops, fixed degradation. LR is produced by
the same on-device kernel the training pipeline uses (data/degrade.py), so
train/eval distributions match.
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Evaluate PSNR/SSIM of an artifact")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--val_json", type=str, default="./val_images.json")
    parser.add_argument("--shape", type=int, default=192, help="HR eval crop")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_images", type=int, default=256)
    parser.add_argument("--degrade", type=str, default="bilinear",
                        choices=["bilinear", "bicubic"])
    parser.add_argument("--denoise_eval", action="store_true",
                        help="evaluate an x1 (denoise) artifact against the "
                             "training degradation chain (gauss+ISO noise + "
                             "JPEG, data/degrade.py) applied with a fixed "
                             "seed — without this, an x1 artifact is fed "
                             "CLEAN input (identity-restoration measure)")
    parser.add_argument("--severity", type=str, default="default",
                        choices=["light", "default", "heavy"],
                        help="denoise-eval degradation severity "
                             "(data/degrade.DENOISE_SEVERITIES): 'default' "
                             "is the training distribution; light/heavy "
                             "bracket it for dose-response evaluation")
    parser.add_argument("--antialias", action="store_true")
    parser.add_argument("--json_out", type=str, default=None)
    parser.add_argument("--data_devices", type=int, default=1,
                        help="shard eval batches over N chips (0 = all local "
                             "devices) — same data-axis serving as rs.py")
    parser.add_argument("--int8", action="store_true",
                        help="evaluate the fast families' int8 PTQ serving "
                             "path (models/quantized.py, same as rs.py "
                             "--int8), calibrated on the first eval batch — "
                             "run with and without to quantify the PTQ "
                             "quality cost on a real checkpoint")
    parser.add_argument("--int8_percentile", type=float, default=None,
                        help="with --int8: calibrate activation scales to "
                             "this percentile of |x| instead of amax (e.g. "
                             "99.9) — clips outlier activations so the int8 "
                             "step stays fine for the bulk; the measured "
                             "lever for high-fidelity checkpoints (PERF.md)")
    parser.add_argument("--compile_cache", type=str, default=None,
                        help="persistent XLA compilation cache directory "
                             "(default ~/.cache/image_super_resolution_tpu/"
                             "xla_cache, or $ISR_COMPILE_CACHE; 'off' "
                             "disables) — repeat evals skip the first-call "
                             "compile")
    return parser


def main(argv=None) -> dict:
    opt = build_parser().parse_args(argv)

    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache(opt.compile_cache)

    import jax
    import jax.numpy as jnp

    from ..data import degrade
    from ..data.manifest import load_manifest
    from ..data.pipeline import LoaderConfig, PatchLoader
    from ..models.deploy import load_artifact
    from ..utils.general import ground_up
    from ..utils.metrics import (
        gradient_hist_distance,
        hf_energy_ratio,
        psnr,
        psnr_y,
        psnr_y_per_image,
        sharpness,
        ssim,
    )

    deployed = load_artifact(opt.model)
    scale = deployed.spec.output_scale
    if opt.denoise_eval and scale != 1:
        raise SystemExit(
            f"--denoise_eval needs an x1 artifact (this one upscales x{scale})"
        )
    shape = ground_up(opt.shape, max(scale, 1))

    samples = load_manifest(opt.val_json)[: opt.max_images]
    cfg = LoaderConfig(batch_size=opt.batch_size, patch_size=shape, scale=scale,
                       workers=4, seed=0, drop_last=True)
    loader = PatchLoader(samples, cfg)

    var_rng, iso_rng, q_rng = degrade.DENOISE_SEVERITIES[opt.severity]

    def make_lr01(hr01, rng):
        """The eval-time degradation: downscale for SR artifacts; the
        training noise chain (fixed rng, --severity preset) for
        --denoise_eval; identity for plain x1."""
        if scale > 1:
            return degrade.downscale(hr01, scale, opt.degrade, opt.antialias)
        if opt.denoise_eval:
            return jnp.clip(
                degrade.denoise_degradation(
                    rng, hr01, quality_range=q_rng, var_range=var_rng,
                    intensity=iso_rng,
                ),
                0.0, 1.0,
            )
        return hr01

    def batch_rng(i):
        return jax.random.fold_in(jax.random.PRNGKey(0), i)

    batch_iter = iter(loader)
    first_batch = next(batch_iter)  # PatchLoader always yields >= 1 batch
    if opt.int8:
        # Swap in the PTQ server BEFORE eval_batch closes over it, calibrated
        # on the LR side of the first eval batch (the exact distribution the
        # quantized trunk will see). The batch is kept and fed back into the
        # eval loop below, so nothing is decoded twice.
        from ..models.quantized import quantize_deployed

        hr01 = jnp.asarray(first_batch).astype(jnp.float32) / 255.0
        lr01 = make_lr01(hr01, batch_rng(0))
        lr_u8 = jnp.clip(jnp.round(lr01 * 255.0), 0, 255).astype(jnp.uint8)
        try:  # quantize_deployed owns the family whitelist; surface its
            # ValueError as the CLI's clean one-line exit (same as rs.py)
            deployed = quantize_deployed(deployed, [lr_u8],
                                         percentile=opt.int8_percentile)
        except ValueError as e:
            raise SystemExit(str(e)) from None

    @jax.jit
    def eval_batch(hr_u8, rng):
        hr01 = hr_u8.astype(jnp.float32) / 255.0
        lr01 = make_lr01(hr01, rng)
        lr_u8 = jnp.clip(jnp.round(lr01 * 255.0), 0, 255).astype(jnp.uint8)
        sr01 = deployed.raw_apply(deployed.params, lr_u8).astype(jnp.float32) / 255.0
        cubic01 = degrade.upscale(lr01, scale) if scale > 1 else lr01
        # The no-model baseline: bicubic upsample for SR; for the denoise
        # protocol it is the noisy input itself (how bad was the damage).
        base = "noisy" if opt.denoise_eval else "bicubic"
        base01 = jnp.clip(cubic01, 0, 1)
        return {
            "psnr": psnr(sr01, hr01),
            "psnr_y": psnr_y(sr01, hr01),
            "ssim": ssim(sr01, hr01),
            # Texture metrics (utils/metrics.py): hf_ratio -> 1 and a small
            # grad_dist mean the output's high-frequency statistics match
            # ground truth — the axis the GAN phase optimizes and PSNR hides.
            "hf_ratio": hf_energy_ratio(sr01, hr01),
            "grad_dist": gradient_hist_distance(sr01, hr01),
            "sharpness": sharpness(sr01),
            "sharpness_hr": sharpness(hr01),
            f"{base}_psnr": psnr(base01, hr01),
            f"{base}_psnr_y": psnr_y(base01, hr01),
            f"{base}_hf_ratio": hf_energy_ratio(base01, hr01),
            # per-image PSNR-Y (shape [N]) feeds the dispersion report
            "psnr_y_per_image": psnr_y_per_image(sr01, hr01),
        }

    batch_shard = None
    if opt.data_devices != 1:
        from ..core.mesh import batch_sharding, serving_data_mesh

        if opt.data_devices < 0:
            raise SystemExit(f"--data_devices must be >= 0, got {opt.data_devices}")
        try:
            mesh = serving_data_mesh(opt.data_devices)
        except ValueError as e:
            raise SystemExit(str(e))
        n_dev = mesh.devices.size
        if opt.batch_size % n_dev:
            raise SystemExit(
                f"--batch_size {opt.batch_size} must be divisible by "
                f"--data_devices {n_dev}"
            )
        batch_shard = batch_sharding(mesh)

    import numpy as _np

    import itertools

    totals: dict = {}
    per_image: list = []
    n = 0
    for i, batch in enumerate(itertools.chain([first_batch], batch_iter)):
        if batch_shard is not None:
            # device_put straight from numpy: one host->device pass per shard
            arr = jax.device_put(_np.asarray(batch), batch_shard)
        else:
            arr = jnp.asarray(batch)
        metrics = eval_batch(arr, batch_rng(i))
        per_image.append(_np.asarray(metrics.pop("psnr_y_per_image")))
        for k, v in metrics.items():
            totals[k] = totals.get(k, 0.0) + float(v)
        n += 1
    result = {k: round(v / max(n, 1), 4) for k, v in totals.items()}
    # Dispersion over individual val crops (VERDICT r4 item 4): the scalar
    # psnr_y is a batch-MSE average; these report the spread behind it.
    pi = _np.concatenate(per_image)
    result["psnr_y_min"] = round(float(pi.min()), 4)
    result["psnr_y_max"] = round(float(pi.max()), 4)
    result["psnr_y_std"] = round(float(pi.std()), 4)
    result["psnr_y_median"] = round(float(_np.median(pi)), 4)
    result["n_images"] = int(pi.size)
    result["n_batches"] = n
    result["hr_crop"] = shape
    result["scale"] = scale
    print(json.dumps(result))
    if opt.json_out:
        with open(opt.json_out, "w") as fh:
            json.dump(result, fh)
    return result


if __name__ == "__main__":
    main()
