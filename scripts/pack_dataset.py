#!/usr/bin/env python
"""Dataset packing + manifest generation.

The framework's equivalent of the reference's datasets/zip_dir.sh plus its
hand-maintained {train,test}.json manifests: given a directory tree

    <root>/<dataset>/JPEGImages/<video>/<frame>.jpg

zips each video folder into JPEGImages/<video>.zip (stored, no recompression)
and writes <split>.json as {video_name: frame_count}.

Usage:
    python scripts/pack_dataset.py --root datasets/davis --split test
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import os
import zipfile


def pack(root: str, split: str, remove_dirs: bool = False):
    img_root = os.path.join(root, "JPEGImages")
    manifest = {}
    for video in sorted(os.listdir(img_root)):
        vdir = os.path.join(img_root, video)
        if not os.path.isdir(vdir):
            if video.endswith(".zip"):
                with zipfile.ZipFile(vdir) as zf:
                    manifest[video[:-4]] = len(
                        [n for n in zf.namelist() if not n.endswith("/")])
            continue
        frames = sorted(os.listdir(vdir))
        zpath = os.path.join(img_root, f"{video}.zip")
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
            for fr in frames:
                zf.write(os.path.join(vdir, fr), arcname=fr)
        manifest[video] = len(frames)
        print(f"packed {video}: {len(frames)} frames")
    out = os.path.join(root, f"{split}.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"wrote {out} ({len(manifest)} videos)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True,
                   help="dataset root containing JPEGImages/")
    p.add_argument("--split", default="test", choices=["train", "test"])
    args = p.parse_args()
    pack(args.root, args.split)
