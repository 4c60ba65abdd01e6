"""Import CLI: reference PyTorch artifact -> native ``.isr`` artifact.

Converts a reference TorchScript deployment artifact (e.g. the bundled
``model.pt``, reference utils/models.py:801-802) into this framework's
msgpack artifact so it runs through ``rs.py`` / ``TiledUpscaler`` unchanged:

    python import_torch.py --src model.pt --out model.isr
    python rs.py --model model.isr --src photo.png --save_dir out.png

Training checkpoints (``gen_*.pt`` etc.) pickle whole reference modules and
need the reference repo to unpickle: pass ``--reference_root`` and ``--key``.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Convert reference torch artifacts to native .isr"
    )
    parser.add_argument("--src", type=str, required=True, help=".pt artifact")
    parser.add_argument("--out", type=str, default="model.isr")
    parser.add_argument("--reference_root", type=str, default=None,
                        help="reference repo path (training ckpts only)")
    parser.add_argument("--key", type=str, default="ema",
                        help="module key inside a training ckpt (ema/gen_net/model)")
    parser.add_argument("--smoke", action="store_true",
                        help="run one forward on both runtimes and compare")
    return parser


def main(argv=None) -> None:
    opt = build_parser().parse_args(argv)

    from ..interop.torch_import import import_torchscript_artifact
    from ..models.deploy import save_artifact

    if opt.reference_root:
        raise SystemExit(
            "training-checkpoint import is a library API "
            "(interop.state_dict_from_reference_checkpoint + the per-family "
            "import_*_state mappers) — the artifact path only takes "
            "TorchScript files"
        )

    deployed, spec, params = import_torchscript_artifact(opt.src)
    save_artifact(opt.out, spec, params)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(params))
    print(f"{n:,} parameters ({spec.family}, depth {spec.depth}) -> {opt.out}")

    if opt.smoke:
        import numpy as np

        import torch

        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, (1, 96, 96, 3), dtype=np.uint8)
        with torch.no_grad():
            want = (
                torch.jit.load(opt.src, map_location="cpu")(
                    torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
                )
                .numpy()
                .transpose(0, 2, 3, 1)
            )
        got = np.asarray(deployed(x))
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        print(f"torch-vs-jax uint8 max diff: {int(diff.max())} "
              f"(mismatching pixels: {(diff > 0).mean():.2%})")


if __name__ == "__main__":
    main()
