"""Offline ONNX recipe (scripts/export_onnx.py).

Direct ONNX export is environmental here — no ``onnx``/``tf2onnx`` packages
(docs/COVERAGE.md §2.7, verified round 3) — so these tests pin the recipe's
behavior in BOTH worlds: the guidance it gives on a machine without the
packages, and (importorskip) the real conversion where they exist."""

import importlib.util
import sys
from pathlib import Path

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "export_onnx", Path(__file__).resolve().parent.parent / "scripts" / "export_onnx.py"
)
export_onnx = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(export_onnx)

_HAVE_TF2ONNX = all(
    importlib.util.find_spec(m) is not None
    for m in ("tensorflow", "tf2onnx", "onnx")
)


def test_missing_packages_give_the_offline_recipe():
    if _HAVE_TF2ONNX:
        pytest.skip("tf2onnx present — the guidance path can't trigger")
    with pytest.raises(SystemExit, match="tf2onnx"):
        export_onnx.main(["--model", "whatever.isr"])


def test_exactly_one_source_required(monkeypatch):
    monkeypatch.setattr(export_onnx, "require_tf2onnx", lambda: None)
    with pytest.raises(SystemExit, match="exactly one"):
        export_onnx.main([])
    with pytest.raises(SystemExit, match="exactly one"):
        export_onnx.main(["--model", "a.isr", "--saved_model", "dir"])


def test_full_conversion_when_available(tmp_path):
    """Real .isr -> SavedModel -> tf2onnx -> (ORT smoke) — runs only where
    tf2onnx/onnx are installed; everywhere else the recipe above is the
    product."""
    pytest.importorskip("tf2onnx")
    pytest.importorskip("onnx")
    import numpy as np

    from image_super_resolution_tpu.models.deploy import (
        DeploySpec, build_deployed, save_artifact)
    from image_super_resolution_tpu.models.generator import SRGenerator
    import jax
    import jax.numpy as jnp

    model = SRGenerator(depth=1, scale=2, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    spec = DeploySpec(family="sr", depth=1, width=64, scale=2,
                      mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    ckpt = {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})}
    deployed, fused = build_deployed(ckpt, spec, use_ema=False)
    artifact = tmp_path / "m.isr"
    save_artifact(artifact, deployed.spec, fused)
    out = export_onnx.main(["--model", str(artifact),
                            "--out", str(tmp_path / "m.onnx")])
    assert Path(out).exists()
