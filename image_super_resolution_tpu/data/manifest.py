"""Dataset manifest builder.

Same JSON contract as the reference (utils/general.py:51-113 via
create_json.py): scan folders recursively, keep decodable images at least
``min_size`` on both sides, write ``train_images.json`` / ``val_images.json``
as flat lists of paths.

Deviations (SURVEY.md §7 "fix" list): NEVER deletes or rewrites user files
(the reference unlinked small images, general.py:71,103, and converted+deleted
non-png/jpg validation images, general.py:116-126); small/corrupt images are
simply skipped and reported.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable, List, Sequence, Tuple

from ..utils.general import IMG_FORMATS


def _scan(folders: Iterable[str | Path], min_size: int, verbose: bool) -> Tuple[List[str], int]:
    from PIL import Image

    kept: List[str] = []
    skipped = 0
    for folder in folders:
        for path in sorted(Path(folder).rglob("*")):
            if path.suffix.lower() not in IMG_FORMATS:
                continue
            try:
                with Image.open(path) as im:
                    if im.width < min_size or im.height < min_size:
                        skipped += 1
                        if verbose:
                            print(f"skip small image {path} (< {min_size}px)")
                        continue
                    im.verify()
            except Exception:
                skipped += 1
                if verbose:
                    print(f"skip unreadable image {path}")
                continue
            kept.append(path.as_posix())
    return kept, skipped


def create_data_lists(
    train_folders: Sequence[str | Path],
    val_folders: Sequence[str | Path],
    min_size: int,
    output_folder: str | Path = "./",
    verbose: bool = False,
) -> Tuple[Path, Path]:
    """Write train_images.json / val_images.json; returns their paths."""
    out_dir = Path(output_folder)
    out_dir.mkdir(parents=True, exist_ok=True)

    train, n_skip_t = _scan(train_folders, min_size, verbose)
    print(f"There are {len(train)} images in the training data ({n_skip_t} skipped).")
    train_json = out_dir / "train_images.json"
    train_json.write_text(json.dumps(train))

    val, n_skip_v = _scan(val_folders, min_size, verbose)
    print(f"There are {len(val)} images in the validating data ({n_skip_v} skipped).")
    val_json = out_dir / "val_images.json"
    val_json.write_text(json.dumps(val))
    return train_json, val_json


def convert_image_to_png(image_file: str | Path, delete_original: bool = False) -> Path:
    """Re-encode any readable image as PNG next to the original.

    Counterpart of the reference's misleadingly-named ``convert_image_to_jpg``
    (utils/general.py:116-126, which wrote PNG and DELETED the source);
    deletion here is opt-in and off by default.
    """
    from PIL import Image

    image_file = Path(image_file)
    out = image_file.with_suffix(".png")
    with Image.open(image_file) as im:
        if im.mode in ("RGBA", "P", "L"):
            im = im.convert("RGB")
        im.save(out, format="PNG", compress_level=4)
    if delete_original and out != image_file:
        image_file.unlink()
    return out


def load_manifest(json_path: str | Path) -> List[str]:
    with open(Path(json_path)) as fh:
        samples = json.load(fh)
    if not isinstance(samples, list):
        raise ValueError(f"{json_path} is not a flat list of image paths")
    return samples
