"""Export CLI: training checkpoint -> frozen uint8->uint8 deployment artifact.

The reference's export is a __main__ block in utils/models.py:764-813
(EMA weights -> Model wrapper with baked normalize -> fuse -> TorchScript +
ONNX). Here: EMA weights -> BN fold -> msgpack artifact (+ optional
StableHLO program via jax.export, + optional TF SavedModel via jax2tf for
TF Serving / TFLite / tf2onnx consumers).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Export a deployment artifact")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--out", type=str, default="model.isr")
    parser.add_argument("--family", type=str, default="sr",
                        choices=["sr", "fast", "denoise", "denoise_fast"],
                        help="sr = reference topology; fast = TPU-first "
                             "flagship (models/fast.py); denoise = reference "
                             "denoiser; denoise_fast = TPU-first denoiser "
                             "(fast trunk at 1/downshuffle resolution)")
    parser.add_argument("--rs_deep", type=int, default=None,
                        help="trunk depth (default: 16 for sr/denoise, "
                             "14 for the fast families)")
    parser.add_argument("--downshuffle", type=int, default=None,
                        help="denoise_fast sub-pixel front factor (default: "
                             "read from the checkpoint's head conv, else 2)")
    parser.add_argument("--width", type=int, default=None,
                        help="trunk width (default: 64 for sr, 128 for fast)")
    parser.add_argument("--add_rate", type=float, default=0.2)
    parser.add_argument("--scale", type=int, default=2)
    parser.add_argument("--enchant", action="store_true")
    parser.add_argument("--no_ema", action="store_true", help="export raw weights")
    parser.add_argument("--stablehlo", type=str, default=None,
                        help="also export a serialized StableHLO program here")
    parser.add_argument("--hlo_shape", type=int, nargs=3, default=[1, 96, 96],
                        metavar=("N", "H", "W"), help="static shape for --stablehlo")
    parser.add_argument("--hlo_dynamic", action="store_true",
                        help="export --stablehlo with symbolic N/H/W dims (the "
                             "analog of the reference's dynamic-axis ONNX)")
    parser.add_argument("--tf_saved_model", type=str, default=None,
                        help="also export a TensorFlow SavedModel here "
                             "(dynamic dims; feeds TF Serving/TFLite/tf2onnx; "
                             "requires tensorflow)")
    parser.add_argument("--torch_state_dict", type=str, default=None,
                        help="also export a reference-layout torch state_dict "
                             ".pt here (loads strict=True into the PyTorch "
                             "reference class for --family: ResNet/EResNet "
                             "or Denoise — migration back)")
    parser.add_argument("--torch_discriminator", type=str, default=None,
                        help="export the GAN checkpoint's Discriminator as a "
                             "reference-layout torch state_dict .pt "
                             "(strict=True into reference Discriminator)")
    parser.add_argument("--smoke", action="store_true",
                        help="run + time one forward after export")
    parser.add_argument("--compile_cache", type=str, default=None,
                        help="persistent XLA compilation cache directory "
                             "(default ~/.cache/image_super_resolution_tpu/"
                             "xla_cache, or $ISR_COMPILE_CACHE; 'off' "
                             "disables)")
    return parser


def main(argv=None) -> None:
    opt = build_parser().parse_args(argv)

    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache(opt.compile_cache)

    import numpy as np

    from ..models.deploy import (
        DeploySpec,
        build_deployed,
        export_stablehlo,
        family_defaults,
        infer_family_dims,
        load_artifact,
        save_artifact,
    )
    from ..train.checkpoint import load_any_checkpoint

    if opt.torch_state_dict and opt.family in ("fast", "denoise_fast"):
        raise SystemExit(
            "--torch_state_dict: the fast families are TPU-native only — "
            "they have no reference PyTorch class to load into (use "
            "--family sr / denoise)"
        )
    if opt.downshuffle is not None and opt.family != "denoise_fast":
        raise SystemExit(
            "--downshuffle applies to --family denoise_fast only"
        )
    if opt.downshuffle is not None and opt.downshuffle < 1:
        raise SystemExit(f"--downshuffle must be >= 1, got {opt.downshuffle}")
    ckpt = load_any_checkpoint(opt.checkpoint)
    # Absent flags resolve from the checkpoint itself (the tree states its
    # depth/width), falling back to the family presets; explicit flags win.
    inf_depth, inf_width = infer_family_dims(ckpt.get("params", {}), opt.family)
    opt.rs_deep, opt.width = family_defaults(
        opt.family,
        opt.rs_deep if opt.rs_deep is not None else inf_depth,
        opt.width if opt.width is not None else inf_width,
    )
    downshuffle = 1
    if opt.family == "denoise_fast":
        from ..models.deploy import infer_downshuffle

        inferred = infer_downshuffle(ckpt.get("params", {}))
        if (opt.downshuffle is not None and inferred is not None
                and opt.downshuffle != inferred):
            # an artifact with the wrong factor saves fine but explodes with
            # an opaque conv-shape error at first inference — fail here
            raise SystemExit(
                f"--downshuffle {opt.downshuffle} contradicts the checkpoint "
                f"(its head conv sees 3*{inferred}^2 input channels => the "
                f"model was trained with downshuffle {inferred})"
            )
        downshuffle = opt.downshuffle or inferred or 2
    refine_blocks, refine_width = 0, 32
    if opt.family in ("fast", "denoise_fast"):
        # the refinement tail is inferred-only: the tree states it exactly
        # (models/deploy.infer_refine), so there is no flag to contradict
        from ..models.deploy import infer_refine

        refine_blocks, refine_width = infer_refine(ckpt.get("params", {}))
    if ckpt["meta"].get("loss"):
        print("mean loss:", float(np.mean(ckpt["meta"]["loss"])))
    spec = DeploySpec(
        family=opt.family, depth=opt.rs_deep, add_rate=opt.add_rate,
        # denoise families are x1 by contract regardless of --scale
        scale=1 if opt.family.startswith("denoise") else opt.scale,
        enchant=opt.enchant, width=opt.width, downshuffle=downshuffle,
        refine_blocks=refine_blocks, refine_width=refine_width,
    )
    deployed, fused = build_deployed(ckpt, spec, use_ema=not opt.no_ema)
    save_artifact(opt.out, deployed.spec, fused)
    n_p = sum(x.size for x in __import__("jax").tree_util.tree_leaves(fused))
    print(f"{n_p:,} parameters -> {opt.out}")

    if opt.stablehlo:
        n, h, w = opt.hlo_shape
        export_stablehlo(deployed, n, h, w, opt.stablehlo,
                         polymorphic=opt.hlo_dynamic)
        kind = "dynamic-shape" if opt.hlo_dynamic else f"{n}x{h}x{w}"
        print(f"StableHLO program ({kind}) -> {opt.stablehlo}")

    if opt.tf_saved_model:
        from ..models.deploy import export_tf_saved_model

        export_tf_saved_model(deployed, opt.tf_saved_model)
        print(f"TF SavedModel (dynamic dims) -> {opt.tf_saved_model}")

    if opt.torch_state_dict:
        from ..interop import save_torch_state_dict

        # un-fused weights: the reference modules carry BN.
        # Chained fallbacks must move TOGETHER: a no-EMA checkpoint that
        # falls back to raw params must also fall back to raw batch_stats,
        # or every BN exports with zeros/ones running stats.
        use_ema = not opt.no_ema and "ema_params" in ckpt
        p = ckpt["ema_params" if use_ema else "params"]
        s = ckpt.get("ema_batch_stats" if use_ema else "batch_stats", {}) or {}
        save_torch_state_dict(
            opt.torch_state_dict, p, s, family=opt.family,
            meta={"scale": opt.scale, "rs_deep": opt.rs_deep,
                  "add_rate": opt.add_rate, "enchant": opt.enchant,
                  "family": opt.family},
        )
        print(f"reference-layout torch state_dict ({opt.family}) -> "
              f"{opt.torch_state_dict}")

    if opt.torch_discriminator:
        if "d_params" not in ckpt:
            raise SystemExit(
                "--torch_discriminator needs a GAN checkpoint carrying "
                "d_params (train the default srgan phase)"
            )
        from ..interop import save_torch_state_dict

        save_torch_state_dict(
            opt.torch_discriminator, ckpt["d_params"],
            ckpt.get("d_batch_stats", {}) or {}, family="discriminator",
            meta={"family": "discriminator"},
        )
        print(f"reference-layout Discriminator state_dict -> "
              f"{opt.torch_discriminator}")

    if opt.smoke:
        import time

        import jax.numpy as jnp

        reloaded = load_artifact(opt.out)
        feed = jnp.zeros((1, 96, 96, 3), jnp.uint8)
        out = reloaded(feed)
        out.block_until_ready()
        t0 = time.perf_counter()
        reloaded(feed).block_until_ready()
        print(f"smoke: {feed.shape} uint8 -> {out.shape} {out.dtype}, "
              f"{(time.perf_counter() - t0) * 1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
