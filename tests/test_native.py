"""Native C++ loader (image_super_resolution_tpu/native) tests.

All tests degrade to skips when the library can't build (no g++/libjpeg on
the host) — the Python backend is the tested fallback in test_data.py.
"""

import numpy as np
import pytest
from PIL import Image

from image_super_resolution_tpu import native
from image_super_resolution_tpu.data.pipeline import LoaderConfig, PatchLoader

needs_native = pytest.mark.skipif(
    not native.available(), reason="native loader unavailable on this host"
)


@pytest.fixture()
def imgdir(tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    for i, (h, w) in enumerate([(80, 120), (64, 64), (130, 70)]):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f"img{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    return tmp_path, paths


@needs_native
def test_decode_png_bit_exact(tmp_path):
    img = np.random.default_rng(0).integers(0, 256, (57, 43, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(img).save(p)
    out = native.decode_rgb(str(p))
    assert np.array_equal(out, img)


@needs_native
def test_decode_jpeg_matches_pil(tmp_path):
    img = np.random.default_rng(1).integers(0, 256, (50, 61, 3), dtype=np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(img).save(p, quality=90)
    out = native.decode_rgb(str(p))
    ref = np.asarray(Image.open(p).convert("RGB"))
    assert out.shape == ref.shape
    # PIL links the same libjpeg on this image — typically identical; allow
    # a tiny tolerance for differently-built libjpegs elsewhere.
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 1.0


@needs_native
def test_decode_gray_and_palette_png(tmp_path):
    gray = np.random.default_rng(2).integers(0, 256, (20, 30), dtype=np.uint8)
    p = tmp_path / "g.png"
    Image.fromarray(gray, mode="L").save(p)
    out = native.decode_rgb(str(p))
    assert np.array_equal(out, np.stack([gray] * 3, -1))


@needs_native
def test_load_patches_contract(imgdir):
    _, paths = imgdir
    batch = native.load_patches(paths + ["/missing.png"], 48, [1, 2, 3, 4])
    assert batch.shape == (4, 48, 48, 3) and batch.dtype == np.uint8
    assert batch[:3].max() > 0 and batch[3].max() == 0  # failure -> zeros
    again = native.load_patches(paths + ["/missing.png"], 48, [1, 2, 3, 4], threads=1)
    assert np.array_equal(batch, again)  # seed-deterministic across threads


@needs_native
def test_jpeg_roi_crop_bit_exact_vs_full_decode(tmp_path):
    """The ROI fast path (jpeg_crop_scanline + aligned skip_scanlines with
    iMCU context margins) must be bit-identical to cropping a full decode —
    the subtle failure mode is fancy 4:2:0 chroma upsampling losing context
    at skip/crop boundaries."""
    rng = np.random.default_rng(5)
    photo = rng.integers(0, 256, (120, 150, 3), dtype=np.uint8)
    for q in (70, 92):
        f = tmp_path / f"p{q}.jpg"
        Image.fromarray(photo).save(f, quality=q)
        full = native.decode_rgb(str(f))
        for seed in range(4):
            p = native.load_patches([str(f)], 64, [seed])[0]
            found = False
            for top in range(120 - 64 + 1):
                for left in range(150 - 64 + 1):
                    if np.array_equal(p[0], full[top, left : left + 64]):
                        found = np.array_equal(
                            p, full[top : top + 64, left : left + 64]
                        )
                        break
                if found:
                    break
            assert found, f"ROI crop differs from full decode (q={q}, seed={seed})"


@needs_native
def test_load_patches_reflect_pad_small(tmp_path):
    small = np.random.default_rng(4).integers(0, 256, (9, 12, 3), dtype=np.uint8)
    p = tmp_path / "s.png"
    Image.fromarray(small).save(p)
    out = native.load_patches([str(p)], 16, [0])[0]
    ref = np.pad(small, ((0, 7), (0, 4), (0, 0)), mode="reflect")
    assert np.array_equal(out, ref)


@needs_native
def test_patchloader_native_backend(imgdir):
    tmp, paths = imgdir
    cfg = LoaderConfig(batch_size=2, patch_size=32, scale=2, workers=2,
                       backend="native", prefetch=2)
    loader = PatchLoader(paths, cfg)
    assert loader.uses_native
    batches = list(loader)
    assert len(batches) == loader.steps_per_epoch
    for b in batches:
        assert b.shape == (2, 32, 32, 3) and b.dtype == np.uint8
    # epoch-deterministic
    again = list(loader)
    assert all(np.array_equal(a, b) for a, b in zip(batches, again))
    # different epoch -> different crops (w.h.p.)
    loader.set_epoch(1)
    other = list(loader)
    assert not all(np.array_equal(a, b) for a, b in zip(batches, other))


def test_patchloader_python_backend_forced(imgdir):
    _, paths = imgdir
    cfg = LoaderConfig(batch_size=2, patch_size=32, scale=2, backend="python")
    loader = PatchLoader(paths, cfg)
    assert not loader.uses_native
    b = next(iter(loader))
    assert b.shape == (2, 32, 32, 3) and b.dtype == np.uint8


@needs_native
def test_non_jpeg_png_formats_fall_back_to_python_decode(tmp_path):
    """bmp/webp/tiff are manifest-legal but not C++-decodable: the binding
    must re-decode those slots in Python, not return silent zero patches."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (50, 60, 3), dtype=np.uint8)
    paths = []
    for ext in ("bmp", "webp", "tiff"):
        p = tmp_path / f"x.{ext}"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    out = native.load_patches(paths, 32, [1, 2, 3])
    assert out.shape == (3, 32, 32, 3)
    for i in range(3):
        assert out[i].max() > 0, f"format {paths[i]} came back as zeros"


@needs_native
def test_unreadable_everywhere_warns_and_zero_fills(tmp_path, recwarn):
    bad = tmp_path / "corrupt.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\nnot really a png")
    out = native.load_patches([str(bad)], 16, [0])
    assert out[0].max() == 0
    assert any("unreadable" in str(w.message) for w in recwarn.list)


def test_batch_indices_dataset_smaller_than_batch(imgdir):
    """Datasets smaller than batch_size still produce FULL fixed-shape
    batches (cyclic padding) — undersized batches break jitted steps."""
    _, paths = imgdir
    cfg = LoaderConfig(batch_size=8, patch_size=32, scale=2, backend="python")
    loader = PatchLoader(paths, cfg)  # 3 samples, batch 8
    b = next(iter(loader))
    assert b.shape == (8, 32, 32, 3)


def test_auto_backend_prefers_python_for_undecodable_manifests(tmp_path):
    """A mostly-webp manifest must not route through the native loader
    (failed C++ probe + serial Python re-decode is slower than the pool)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    paths = []
    for i in range(4):
        p = tmp_path / f"w{i}.webp"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    loader = PatchLoader(paths, LoaderConfig(batch_size=2, patch_size=16,
                                             scale=2, backend="auto"))
    assert not loader.uses_native
    # ...but a jpg/png-majority manifest keeps native (when available)
    jpgs = []
    for i in range(4):
        p = tmp_path / f"j{i}.jpg"
        Image.fromarray(img).save(p)
        jpgs.append(str(p))
    loader2 = PatchLoader(jpgs + paths[:1], LoaderConfig(
        batch_size=2, patch_size=16, scale=2, backend="auto"))
    assert loader2.uses_native == native.available()
