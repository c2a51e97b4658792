#!/usr/bin/env bash
# Download the GTAV segmentation dataset (10 image parts + labels) from the
# public TU Darmstadt mirror, then run the converter (reference analogue:
# tools/download_datasets/gta.sh).
#   usage: tools/download_datasets/gta.sh data/gta
set -e
DEST=${1:-data/gta}
mkdir -p "$DEST/zips"
BASE=https://download.visinf.tu-darmstadt.de/data/from_games/data
for i in $(seq -w 1 10); do
  wget -c "$BASE/${i}_images.zip" -P "$DEST/zips"
  wget -c "$BASE/${i}_labels.zip" -P "$DEST/zips"
done
for z in "$DEST"/zips/*.zip; do unzip -n "$z" -d "$DEST"; done
python "$(dirname "$0")/../convert_datasets/gta.py" "$DEST"
