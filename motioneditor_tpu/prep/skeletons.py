"""Skeleton extraction CLI (port of data_preparation/video_skeletons.py).

The reference drives ``controlnet_aux`` OpenposeDetector (or Midas) per frame
(:13-21, :63-83) and writes ``<save_dir>/<cond>/<frame>.png``.

Backends:
  - ``--body_model <body_pose_model.pth>``: the first-party JAX OpenPose
    port (models/openpose.py) — the CMU two-branch PAF/heatmap network runs
    on TPU, peak/limb decoding and rendering on host. This covers the body
    skeleton (what ControlNet-openpose conditions on); the reference's
    ``openposefull`` additionally overlays hand/face keypoints, for which
    the controlnet_aux fallback remains.
  - otherwise: controlnet_aux OpenposeDetector / MidasDetector, with an
    actionable error if that stack is unavailable.
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
            f"skeleton extraction needs controlnet_aux ({e}); either pass "
            "--body_model <body_pose_model.pth> to use the first-party JAX "
            "OpenPose port, or produce condition PNGs with any OpenPose "
            "implementation — the pipeline only needs the rendered images."
        )
    raise SystemExit(f"unknown condition type {kind}")


def build_native_detector(body_model: str):
    """First-party backend: JAX OpenPose body network + host decode/render."""
    from motioneditor_tpu.models.openpose import load_body_params, render_skeleton

    params = load_body_params(body_model)

    def detect(img: Image.Image) -> np.ndarray:
        return render_skeleton(params, np.asarray(img, np.uint8))

    return detect


def main():
    p = argparse.ArgumentParser("Video skeletons")
    p.add_argument("--data", type=str, required=True, help="frames dir")
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--condition", type=str, default="openposefull")
    p.add_argument(
        "--body_model", type=str, default=None,
        help="pytorch-openpose body_pose_model.pth -> native JAX backend",
    )
    args = p.parse_args()

    if args.body_model:
        if args.condition not in ("openpose", "openposefull"):
            raise SystemExit("--body_model implies an openpose condition")
        det = build_native_detector(args.body_model)
    else:
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
