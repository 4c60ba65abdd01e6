#!/usr/bin/env python
"""Offline ONNX export: native ``.isr`` artifact -> ``model.onnx``.

The reference exports ONNX directly from torch (utils/models.py:803-812,
dynamic H/W axes + onnxsim). torch's ONNX exporters hard-require the ``onnx``
pip package, which this TPU image does not ship — so the direct path is
environmental (docs/COVERAGE.md §2.7). This script is the runnable offline
recipe for a machine that HAS ``tf2onnx``:

    python scripts/export_onnx.py --model model.isr --out model.onnx

It converts .isr -> TF SavedModel (jax2tf, uint8 [B,H,W,3] dynamic dims —
bit-exact vs the native artifact, tests/test_infer.py) and then runs
``python -m tf2onnx.convert`` on it. ``--saved_model DIR`` skips the first
step and converts an existing SavedModel (e.g. produced on the TPU host by
``export.py --tf_saved_model DIR`` and copied to a machine with tf2onnx).
If ``onnxruntime`` is importable the result is smoke-checked against the
SavedModel on a random uint8 batch.
"""

from __future__ import annotations

import argparse
import importlib.util
import subprocess
import sys
import tempfile
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Offline .isr -> ONNX export")
    parser.add_argument("--model", type=str, default=None,
                        help="native .isr artifact to convert")
    parser.add_argument("--saved_model", type=str, default=None,
                        help="existing TF SavedModel dir (skips jax2tf step)")
    parser.add_argument("--out", type=str, default="model.onnx")
    parser.add_argument("--opset", type=int, default=17)
    return parser


def require_tf2onnx() -> None:
    missing = [m for m in ("tensorflow", "tf2onnx", "onnx")
               if importlib.util.find_spec(m) is None]
    if missing:
        raise SystemExit(
            "ONNX export needs " + ", ".join(missing) + " — this environment "
            "doesn't ship them (docs/COVERAGE.md §2.7). Produce the TF "
            "SavedModel here (export.py --tf_saved_model DIR), copy it to a "
            "machine with `pip install tf2onnx onnx`, and run "
            "`python scripts/export_onnx.py --saved_model DIR --out model.onnx` "
            "there."
        )


def saved_model_to_onnx(saved_model: str | Path, out: str | Path,
                        opset: int = 17) -> Path:
    """Run tf2onnx on a SavedModel dir (subprocess — tf2onnx's documented
    entry point, keeps its TF graph state out of this process)."""
    out = Path(out)
    cmd = [sys.executable, "-m", "tf2onnx.convert",
           "--saved-model", str(saved_model), "--output", str(out),
           "--opset", str(opset)]
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    if not out.exists():
        raise RuntimeError(f"tf2onnx reported success but {out} is missing")
    return out


def smoke_check(saved_model: str | Path, onnx_path: str | Path) -> None:
    """Compare ONNX vs SavedModel on one random batch when ORT is present."""
    if importlib.util.find_spec("onnxruntime") is None:
        print("onnxruntime not installed — skipping numeric smoke check")
        return
    import numpy as np
    import onnxruntime as ort
    import tensorflow as tf

    x = np.random.default_rng(0).integers(0, 255, (1, 64, 48, 3), dtype=np.uint8)
    tf_fn = tf.saved_model.load(str(saved_model)).f
    want = np.asarray(tf_fn(tf.constant(x)))
    sess = ort.InferenceSession(str(onnx_path))
    name = sess.get_inputs()[0].name
    got = sess.run(None, {name: x})[0]
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32)).max()
    print(f"onnxruntime vs SavedModel uint8 max diff: {int(diff)}")
    if diff > 1:
        raise RuntimeError("ONNX output diverges from the SavedModel")


def main(argv=None) -> Path:
    opt = build_parser().parse_args(argv)
    require_tf2onnx()
    if bool(opt.model) == bool(opt.saved_model):
        raise SystemExit("pass exactly one of --model / --saved_model")

    if opt.saved_model:
        out = saved_model_to_onnx(opt.saved_model, opt.out, opt.opset)
        smoke_check(opt.saved_model, out)
        return out

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from image_super_resolution_tpu.models.deploy import (
        export_tf_saved_model, load_artifact)

    deployed = load_artifact(opt.model)
    with tempfile.TemporaryDirectory(prefix="isr_onnx_") as tmp:
        sm = Path(tmp) / "saved_model"
        export_tf_saved_model(deployed, sm)
        out = saved_model_to_onnx(sm, opt.out, opt.opset)
        smoke_check(sm, out)
    return out


if __name__ == "__main__":
    main()
