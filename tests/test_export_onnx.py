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


def test_saved_model_signature_dryrun(tmp_path):
    """CI-style dry-run of the tf2onnx preflight WITHOUT tf2onnx (VERDICT r4
    item 7): validates everything ``tf2onnx.convert --saved-model`` consumes
    — the 'serve' MetaGraph tag, the default 'serving_default' signature,
    uint8 input with dynamic [B,H,W] dims, uint8 output — and replays
    tf2onnx's own first step (load signature -> freeze variables to
    constants) so a regression in the export graph fails HERE, not on the
    machine that finally runs the conversion."""
    tf = pytest.importorskip("tensorflow")
    import numpy as np
    import jax
    import jax.numpy as jnp

    from image_super_resolution_tpu.models.deploy import (
        DeployedModel, DeploySpec, export_tf_saved_model)

    spec = DeploySpec(family="fast", depth=1, width=8, scale=2)
    m = spec.build_model(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    dep = DeployedModel(spec, v["params"], dtype=jnp.float32)
    sm = tmp_path / "saved_model"
    export_tf_saved_model(dep, sm)

    # 1. the files tf2onnx reads from disk
    assert (sm / "saved_model.pb").exists()
    assert (sm / "variables").is_dir()

    # 2. the 'serve' MetaGraph tag (tf2onnx's default --tag)
    from tensorflow.python.tools import saved_model_utils

    tag_sets = saved_model_utils.get_saved_model_tag_sets(str(sm))
    assert ["serve"] in [list(t) for t in tag_sets]

    # 3. the default signature with the dynamic uint8 contract
    loaded = tf.saved_model.load(str(sm))
    assert "serving_default" in loaded.signatures
    sig = loaded.signatures["serving_default"]
    (inp,) = [t for t in sig.inputs if t.dtype == tf.uint8]
    assert inp.shape.as_list() == [None, None, None, 3]
    (out,) = sig.structured_outputs.values()
    assert out.dtype == tf.uint8
    assert out.shape.as_list() == [None, None, None, 3]

    # 4. tf2onnx step one: freeze the signature's variables into constants
    from tensorflow.python.framework.convert_to_constants import (
        convert_variables_to_constants_v2)

    frozen = convert_variables_to_constants_v2(sig)
    assert not frozen.variables  # fully frozen: nothing left to capture

    # 5. the frozen graph still computes the artifact's uint8 contract at
    # two different dynamic shapes (the reference exports dynamic H/W,
    # utils/models.py:806-810)
    for hw in ((6, 10), (8, 8)):
        x = np.random.default_rng(0).integers(
            0, 255, (2, *hw, 3), dtype=np.uint8)
        got = frozen(tf.constant(x))[0].numpy()
        want = np.asarray(dep(jnp.asarray(x)))
        assert got.shape == want.shape == (2, hw[0] * 2, hw[1] * 2, 3)
        assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1
