"""Skeleton alignment — scale/translate the target pose into the source's
screen position (data_preparation/alignment.py:51-161).

Pure numpy re-implementation (vectorized bbox instead of the reference's
O(HW) python loops). For each frame:

  1. person bbox from source and target masks
  2. crop the target-pose ROI, rescale its width to match the source height
     with the target's aspect ratio (width = aspect * source_height; shrink
     by 0.85 if it would overflow both sides, :113-119)
  3. paste bottom-aligned into the source bbox position on a blank canvas
  4. translate so the pasted bbox's bottom-center lands on the target's
     bottom-center (:155-160)

CLI: python -m motioneditor_tpu.prep.alignment --source_mask_path ...
(same flags as the reference).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from typing import Optional, Tuple

import numpy as np


def find_person_boundaries(mask: np.ndarray) -> Tuple[int, int, int, int]:
    """(left, right, top, bottom) of nonzero pixels (alignment.py:37-48)."""
    ys, xs = np.nonzero(mask >= 0.5)
    if len(xs) == 0:
        return 0, mask.shape[1] - 1, 0, mask.shape[0] - 1
    return int(xs.min()), int(xs.max()), int(ys.min()), int(ys.max())


def _resize(img: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    w, h = size_wh
    return np.asarray(
        Image.fromarray(img.astype(np.uint8)).resize((w, h), Image.BILINEAR)
    )


def align_pose_frame(
    source_mask: np.ndarray,
    target_mask: np.ndarray,
    target_pose: np.ndarray,
    canvas_hw: Tuple[int, int] = (512, 512),
) -> np.ndarray:
    """Align one target pose frame to the source person's position."""
    h_c, w_c = canvas_hw
    if target_pose.shape[:2] != canvas_hw:
        target_pose = _resize(target_pose, (w_c, h_c))

    s_left, s_right, s_top, s_bottom = find_person_boundaries(source_mask)
    t_left, t_right, t_top, t_bottom = find_person_boundaries(target_mask)
    target_point = ((t_left + t_right) / 2.0, float(t_bottom))

    x1, y1 = s_left, s_top
    w1, h1 = s_right - s_left, s_bottom - s_top
    x2, y2 = t_left, t_top
    w2, h2 = t_right - t_left, t_bottom - t_top
    w1, h1, w2, h2 = max(w1, 1), max(h1, 1), max(w2, 1), max(h2, 1)

    roi = target_pose[y2 : y2 + h2, x2 : x2 + w2]
    ratio = w2 / float(h2)
    w_new = round(ratio * h1)
    if x1 - (w_new - w1) < 0 and x1 + w_new > w_c:
        w_new = round(w_new * 0.85)
    w_new = max(w_new, 1)
    roi_resized = _resize(roi, (w_new, h1))

    aligned = np.zeros_like(target_pose)
    if w_new > w1 and x1 - (w_new - w1) > 0:
        x_paste = x1 - (w_new - w1)
    else:
        x_paste = x1
    x_hi = min(x_paste + w_new, w_c)
    aligned[y1 : y1 + h1, x_paste:x_hi] = roi_resized[:, : x_hi - x_paste]
    aligned_point = ((x_paste + x_paste + w_new) / 2.0, float(h1 + y1))

    dx = int(round(target_point[0] - aligned_point[0]))
    dy = int(round(target_point[1] - aligned_point[1]))

    out = np.zeros_like(aligned)
    src_y = slice(max(0, -dy), min(h_c, h_c - dy))
    src_x = slice(max(0, -dx), min(w_c, w_c - dx))
    dst_y = slice(max(0, dy), max(0, dy) + (src_y.stop - src_y.start))
    dst_x = slice(max(0, dx), max(0, dx) + (src_x.stop - src_x.start))
    out[dst_y, dst_x] = aligned[src_y, src_x]
    return out


def align_sequence(
    source_mask_dir: str,
    target_mask_dir: str,
    source_pose_dir: str,
    target_pose_dir: str,
    save_dir: str,
    num_frames: int = 24,
    frame_pattern: str = "frame_{}.png",
) -> None:
    from PIL import Image

    os.makedirs(save_dir, exist_ok=True)
    for i in range(num_frames):
        name = frame_pattern.format(i)
        sm = np.asarray(Image.open(osp.join(source_mask_dir, name)).convert("L"),
                        np.float32) / 255.0
        tm = np.asarray(Image.open(osp.join(target_mask_dir, name)).convert("L"),
                        np.float32) / 255.0
        tp = np.asarray(Image.open(osp.join(target_pose_dir, name)).convert("RGB"))
        out = align_pose_frame(sm, tm, tp)
        Image.fromarray(out.astype(np.uint8)).save(osp.join(save_dir, name))


def main():
    p = argparse.ArgumentParser("Alignment", add_help=True)
    p.add_argument("--source_mask_path", type=str, required=True)
    p.add_argument("--target_mask_path", type=str, required=True)
    p.add_argument("--source_pose_path", type=str, required=True)
    p.add_argument("--target_pose_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--num_frames", type=int, default=24)
    args = p.parse_args()
    align_sequence(
        args.source_mask_path,
        args.target_mask_path,
        args.source_pose_path,
        args.target_pose_path,
        args.save_path,
        num_frames=args.num_frames,
    )


if __name__ == "__main__":
    main()
