#!/usr/bin/env python
"""Host-side loader throughput: native C++ backend vs Python (cv2/PIL).

Builds a synthetic JPEG dataset sized like COCO photos, then times full
epochs of PatchLoader under both backends. Pure host benchmark — no jax.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from PIL import Image  # noqa: E402

from image_super_resolution_tpu.data.pipeline import (  # noqa: E402
    LoaderConfig,
    PatchLoader,
)


def main(n_images: int = 256, size: int = 512, patch: int = 96, batch: int = 16):
    root = Path(tempfile.mkdtemp(prefix="bench_loader_"))
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_images):
        img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        p = root / f"img_{i}.jpg"
        Image.fromarray(img).save(p, quality=92)
        paths.append(str(p))
    print(f"{n_images} {size}x{size} JPEGs, patch {patch}, batch {batch}")

    for backend in ("python", "native"):
        for workers in (4, 8):
            cfg = LoaderConfig(
                batch_size=batch, patch_size=patch, scale=2,
                workers=workers, backend=backend,
            )
            loader = PatchLoader(paths, cfg)
            n = sum(1 for _ in loader)  # warm (page cache)
            t0 = time.perf_counter()
            n = sum(1 for _ in loader)
            dt = time.perf_counter() - t0
            pps = n * batch / dt
            print(f"  {backend:7s} workers={workers}: {pps:8.1f} patches/s")


if __name__ == "__main__":
    main()
