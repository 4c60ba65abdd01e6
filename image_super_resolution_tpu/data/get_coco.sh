#!/usr/bin/env bash
# COCO 2017 image downloader (training data for the SR models).
# TPU-native counterpart of the reference's get_coco.sh (reference:
# get_coco.sh:1-56): fetches the train/val/test image zips and unpacks them.
# Labels are NOT fetched — super-resolution training needs only the images.
#
# Usage: bash get_coco.sh [target_dir]        (default ./datasets/coco)
set -euo pipefail

TARGET="${1:-./datasets/coco}"
BASE_URL="http://images.cocodataset.org/zips"
SPLITS=(train2017 val2017 test2017)

mkdir -p "$TARGET/images"
cd "$TARGET/images"

for split in "${SPLITS[@]}"; do
  zip="${split}.zip"
  if [ -d "$split" ]; then
    echo "[get_coco] $split already present, skipping"
    continue
  fi
  echo "[get_coco] downloading $zip"
  curl -L -O --retry 3 "$BASE_URL/$zip"
  echo "[get_coco] unpacking $zip"
  unzip -q "$zip"
  rm -f "$zip"
done

echo "[get_coco] done. Build manifests with:"
echo "  python create_json.py --train_dirs $TARGET/images/train2017 \\"
echo "      --val_dirs $TARGET/images/val2017 --shape 96"
