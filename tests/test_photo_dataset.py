"""Photo quality-gate dataset (scripts/flagship_quality_experiment.py
``--dataset photo``).

The photo split is the framework's only REAL-photograph quality benchmark
(this offline environment ships exactly one photo, matplotlib's
grace_hopper.jpg), so its one load-bearing property — spatial disjointness
of train and val — is pinned here: every val crop comes from the top
192-px band, every train crop from rows >= 192, so a gate pass measures
generalization to unseen image content rather than memorization.
"""

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

_SPEC = importlib.util.spec_from_file_location(
    "flagship_quality_experiment",
    Path(__file__).resolve().parent.parent / "scripts"
    / "flagship_quality_experiment.py",
)
fqe = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(fqe)


def test_photo_dataset_split_is_spatially_disjoint(tmp_path):
    from PIL import Image

    fqe.make_photo_dataset(tmp_path, n_train=16)
    train = json.loads((tmp_path / "train_images.json").read_text())
    val = json.loads((tmp_path / "val_images.json").read_text())
    assert len(train) == 16 and len(val) == 22

    src = Path(matplotlib.get_data_path()) / "sample_data" / "grace_hopper.jpg"
    img = np.asarray(Image.open(src).convert("RGB")).astype(np.int32)
    val_band = img[:192]  # rows the val crops own exclusively
    train_region = img[192:]

    def best_match_region(crop):
        """Which exclusive region contains this crop (under any of the 8
        dihedral transforms it may have been saved with)?"""
        variants = []
        for k in range(8):
            a = np.rot90(crop, -(k % 4)) if k < 4 else np.rot90(
                crop[:, ::-1], -(k % 4))
            variants.append(np.ascontiguousarray(a))
        for region, name in ((val_band, "val"), (train_region, "train")):
            h, w = region.shape[:2]
            for a in variants:
                for y0 in range(0, h - 191, 32):
                    for x0 in range(0, w - 191, 32):
                        if np.array_equal(region[y0:y0 + 192, x0:x0 + 192], a):
                            return name
            # bottom-edge row train crops use y0 = h-192 (not stride-aligned)
            if name == "train":
                y0 = h - 192
                for a in variants:
                    for x0 in range(0, w - 191, 32):
                        if np.array_equal(region[y0:y0 + 192, x0:x0 + 192], a):
                            return name
        return None

    for p in val:
        crop = np.asarray(Image.open(p)).astype(np.int32)
        assert best_match_region(crop) == "val", p
    for p in train[:4]:  # spot-check: exhaustive match is O(positions^2)
        crop = np.asarray(Image.open(p)).astype(np.int32)
        assert best_match_region(crop) == "train", p
