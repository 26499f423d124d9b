"""Skeleton extraction CLI (port of data_preparation/video_skeletons.py).

The reference drives ``controlnet_aux`` OpenposeDetector (or Midas) per frame
(:13-21, :63-83). Those detector weights/backbones are external pretrained
models (L0); this CLI keeps the same surface and writes
``<save_dir>/<cond>/<frame>.png``. If controlnet_aux is unavailable in the
environment, it exits with an actionable error instead of crashing mid-run.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from glob import glob

import numpy as np
from PIL import Image


def build_detector(kind: str):
    try:
        if kind in ("openpose", "openposefull"):
            from controlnet_aux import OpenposeDetector

            det = OpenposeDetector.from_pretrained("lllyasviel/Annotators")
            if kind == "openposefull":
                return lambda img: det(img, hand_and_face=True)
            return det
        if kind == "depth":
            from controlnet_aux import MidasDetector

            return MidasDetector.from_pretrained("lllyasviel/Annotators")
    except ImportError as e:
        raise SystemExit(
            f"skeleton extraction needs controlnet_aux ({e}); install it or "
            "produce condition PNGs with any OpenPose implementation — the "
            "pipeline only needs the rendered skeleton images."
        )
    raise SystemExit(f"unknown condition type {kind}")


def main():
    p = argparse.ArgumentParser("Video skeletons")
    p.add_argument("--data", type=str, required=True, help="frames dir")
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--condition", type=str, default="openposefull")
    args = p.parse_args()

    det = build_detector(args.condition)
    out_dir = osp.join(args.save_dir, args.condition)
    os.makedirs(out_dir, exist_ok=True)
    for path in sorted(glob(osp.join(args.data, "*"))):
        name = osp.splitext(osp.basename(path))[0]
        img = Image.open(path).convert("RGB")
        skel = det(img)
        if isinstance(skel, np.ndarray):
            skel = Image.fromarray(skel)
        skel.save(osp.join(out_dir, name + ".png"))
        print(f"wrote {name}.png")


if __name__ == "__main__":
    main()
