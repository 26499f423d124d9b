"""Skeleton extraction CLI (port of data_preparation/video_skeletons.py).

The reference drives ``controlnet_aux`` OpenposeDetector (or Midas) per frame
(:13-21, :63-83) and writes ``<save_dir>/<cond>/<frame>.png``. NOTE: despite
the ``openposefull`` condition name, the reference calls
``cond_model(image, hand_and_face=False)`` (video_skeletons.py:78) — the
shipped conditions are BODY-ONLY skeletons.

Backends:
  - ``--body_model <body_pose_model.pth>``: the first-party JAX OpenPose
    port (models/openpose.py) — the CMU two-branch PAF/heatmap network runs
    on TPU, peak/limb decoding and rendering on host. This matches the
    reference's live body-only output with zero external model deps.
    ``--hand_model`` / ``--face_model`` additionally enable the first-party
    hand/face keypoint networks (the OpenposeDetector hand_and_face=True
    capability the reference never turns on; default off to match).
  - ``--depth_model <dpt_hybrid-midas-501f0c75.pt>``: the first-party JAX
    MiDaS DPT-Hybrid port (models/midas.py) for ``--condition depth`` —
    matches the controlnet_aux MidasDetector chain (mult-of-64 resize,
    x/127.5-1 norm, min-max uint8) with zero external model deps.
  - otherwise: controlnet_aux OpenposeDetector / MidasDetector, with an
    actionable error if that stack is unavailable. The fallback also runs
    hand_and_face=False, matching the reference exactly.
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
            # the reference's openposefull path is hand_and_face=False
            # (video_skeletons.py:78) — body-only, like plain openpose
            return lambda img: det(img, hand_and_face=False)
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


def build_native_detector(
    body_model: str, hand_model: str = None, face_model: str = None
):
    """First-party backend: JAX OpenPose networks + host decode/render."""
    from motioneditor_tpu.models.openpose import (
        load_body_params,
        load_face_params,
        load_hand_params,
        render_skeleton_full,
    )

    body = load_body_params(body_model)
    hand = load_hand_params(hand_model) if hand_model else None
    face = load_face_params(face_model) if face_model else None

    def detect(img: Image.Image) -> np.ndarray:
        return render_skeleton_full(
            body, np.asarray(img, np.uint8), hand_params=hand, face_params=face
        )

    return detect


def build_native_depth_detector(depth_model: str):
    """First-party backend: JAX MiDaS DPT-Hybrid (models/midas.py)."""
    from motioneditor_tpu.models.midas import estimate_depth, load_dpt_params

    params = load_dpt_params(depth_model)

    def detect(img: Image.Image) -> np.ndarray:
        return estimate_depth(params, np.asarray(img, np.uint8))

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
    p.add_argument(
        "--hand_model", type=str, default=None,
        help="hand_pose_model.pth: overlay hand keypoints (native backend; "
        "the reference runs body-only — see module docstring)",
    )
    p.add_argument(
        "--face_model", type=str, default=None,
        help="facenet.pth: overlay face landmarks (native backend)",
    )
    p.add_argument(
        "--depth_model", type=str, default=None,
        help="dpt_hybrid-midas-501f0c75.pt -> native JAX MiDaS backend",
    )
    args = p.parse_args()

    if args.body_model:
        if args.condition not in ("openpose", "openposefull"):
            raise SystemExit("--body_model implies an openpose condition")
        det = build_native_detector(args.body_model, args.hand_model, args.face_model)
    elif args.depth_model:
        if args.condition != "depth":
            raise SystemExit("--depth_model implies --condition depth")
        det = build_native_depth_detector(args.depth_model)
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
