"""One-command out-of-box demo: bundled reference weights -> restored image.

A fresh clone can produce an SR/denoise result without training anything:
this converts the reference repo's bundled TorchScript artifact (``model.pt``,
1.6 MB, the legacy denoiser — reference utils/models.py:801-802, dissected
SURVEY.md §2.7) into a native ``.isr`` artifact and runs it on a sample image.

    python demo.py                      # finds model.pt, makes its own sample
    python demo.py --src my_photo.png   # restore a real image instead

With no ``--src`` the demo synthesizes a clean test card, degrades it the way
the denoiser was trained to expect (gaussian noise + JPEG, reference
utils/datasets.py:374-376 defaults), restores it, and prints the PSNR of
input and output so the result is quantified, not eyeballed. A
generator-family ``.pt`` works too: the demo then downscales the test card
and upscales it back (baseline = bicubic).

Honesty note: the bundled reference artifact is itself weak — it maps even a
CLEAN image to ~30 dB and plateaus restored output around 26-27 dB regardless
of input noise (measured; identical through torch — our runtime matches it to
1 LSB, tests/test_interop.py). The demo demonstrates the out-of-box
convert->serve pipeline, not that artifact's restoration quality.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

_SEARCH = ("model.pt", "reference/model.pt", "/root/reference/model.pt")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Out-of-box demo on bundled weights")
    parser.add_argument("--model_pt", type=str, default=None,
                        help="reference TorchScript artifact; default: search "
                             + ", ".join(_SEARCH))
    parser.add_argument("--src", type=str, default=None,
                        help="image to restore; default: synthesized test card")
    parser.add_argument("--out_dir", type=str, default="demo_out")
    parser.add_argument("--window_size", type=int, default=96)
    return parser


def find_model_pt(explicit: str | None) -> Path:
    if explicit:
        p = Path(explicit)
        if not p.exists():
            raise FileNotFoundError(f"--model_pt {p} does not exist")
        return p
    for cand in _SEARCH:
        p = Path(cand)
        if p.exists():
            return p
    raise FileNotFoundError(
        "no bundled model.pt found (searched "
        + ", ".join(_SEARCH)
        + ") — pass --model_pt pointing at the reference repo's model.pt"
    )


def make_test_card(size: int = 192, seed: int = 0) -> np.ndarray:
    """Clean uint8 RGB test card: gradients, edges, and fine texture —
    content where denoising/SR quality is visible."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    r = 255 * x
    g = 255 * y
    b = 255 * (0.5 + 0.5 * np.sin(14 * np.pi * (x + y) / 2))  # diagonal bars
    img = np.stack([r, g, b], axis=-1)
    # checker patch (hard edges) and a smooth disc (gradients)
    q = size // 4
    checker = (((np.arange(q)[:, None] // 6) + (np.arange(q)[None, :] // 6)) % 2)
    img[q: 2 * q, q: 2 * q] = 255 * checker[..., None]
    cy, cx = 3 * size // 4, size // 2
    d2 = (y * (size - 1) - cy) ** 2 + (x * (size - 1) - cx) ** 2
    disc = np.clip(1 - d2 / (size / 5) ** 2, 0, 1)
    img[..., 1] = np.clip(img[..., 1] + 120 * disc, 0, 255)
    img += rng.normal(0, 2.0, img.shape)  # fine film-grain texture
    return np.clip(img, 0, 255).astype(np.uint8)


def degrade_like_training(clean: np.ndarray, seed: int = 1,
                          sigma: float = 7.0, jpeg_quality: int = 60
                          ) -> np.ndarray:
    """Gaussian noise + JPEG roundtrip — the denoise phase's degradation
    family (reference utils/datasets.py:374-376 Noisy_dataset; here
    data/degrade.denoise_degradation) applied host-side for the demo.
    Defaults sit inside the training ranges (GaussNoise var 10-50 ->
    sigma<=7.1; ImageCompression quality 50-75)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(seed)
    noisy = clean.astype(np.float32) + rng.normal(0, sigma, clean.shape)
    noisy = np.clip(noisy, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(noisy).save(buf, format="JPEG", quality=jpeg_quality)
    return np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    """utils.metrics.psnr on uint8 arrays (one definition of the metric —
    the same one the eval CLI reports)."""
    from ..utils.metrics import psnr

    return float(psnr(a, b, max_val=255.0))


def main(argv=None) -> Path:
    opt = build_parser().parse_args(argv)

    from ..infer.engine import TiledUpscaler
    from ..interop.torch_import import import_torchscript_artifact
    from ..models.deploy import save_artifact
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # repeat demo runs skip the first-call compile

    model_pt = find_model_pt(opt.model_pt)
    out_dir = Path(opt.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    deployed, spec, params = import_torchscript_artifact(model_pt)
    artifact = out_dir / "demo.isr"
    save_artifact(artifact, spec, params)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(params))
    print(f"{model_pt} -> {artifact} ({spec.family}, {n:,} parameters, "
          f"x{spec.output_scale})")

    engine = TiledUpscaler(deployed, window=opt.window_size)

    if opt.src:  # user image: restore it, no ground truth to score against
        from .rs import _read_image_rgb, _write_png

        image = _read_image_rgb(Path(opt.src))
        result = engine.upscale_image(image)
        out = out_dir / (Path(opt.src).stem + "_restored.png")
        _write_png(out, result)
        print(f"restored {opt.src} {image.shape} -> {out} {result.shape}")
        return out

    from PIL import Image

    clean = make_test_card()
    scale = spec.output_scale
    if scale == 1:  # denoiser demo: noisy in, denoised out
        inp = degrade_like_training(clean)
        baseline_name, baseline = "degraded input", inp
    else:  # generator demo: downscale in, SR out vs bicubic baseline
        lr = Image.fromarray(clean).resize(
            (clean.shape[1] // scale, clean.shape[0] // scale), Image.BILINEAR)
        inp = np.asarray(lr)
        baseline_name, baseline = "bicubic upscale", np.asarray(
            lr.resize((clean.shape[1], clean.shape[0]), Image.BICUBIC))

    result = engine.upscale_image(inp)
    Image.fromarray(clean).save(out_dir / "clean.png")
    Image.fromarray(inp).save(out_dir / "input.png")
    out = out_dir / "restored.png"
    Image.fromarray(result).save(out)

    p_in, p_out = _psnr(baseline, clean), _psnr(result, clean)
    print(f"PSNR vs clean: {baseline_name} {p_in:.2f} dB, "
          f"restored {p_out:.2f} dB ({p_out - p_in:+.2f} dB; restored "
          "quality is bounded by the bundled artifact itself — see "
          "cli/demo.py docstring)")
    print(f"wrote clean/input/restored PNGs -> {out_dir}")
    return out


if __name__ == "__main__":
    main()
