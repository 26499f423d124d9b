"""VideoDataset — host-side loader for the data/case-N layout.

Port of motion_editor/data/dataset.py:16-154 without torch/decord: PIL +
numpy only. Produces channel-last numpy arrays ready for the NHWC pipeline:

  pixel_values      [F, H, W, 3] in [-1, 1]   (bilinear resize, :123/:144)
  source_conditions {cond: [F, H, W, 3] in [0, 1]}
  target_conditions {cond: [F, H, W, 3] in [0, 1]}
  source_masks      [F, H, W] in {0, 1}       (nearest resize, :139-141)
  sample_indices    [F] int

Directory layout (verified on the reference's data/case-1):
  video_dir/images, video_dir/source_condition/<cond>,
  video_dir/target_condition/<cond>, video_dir/<source_mask_dir>
with a cached frame_list.txt (:50-61).
"""

from __future__ import annotations

import os
import os.path as osp
import random
from glob import glob
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image


def _bilinear_resize(img: np.ndarray, size) -> np.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) equivalent
    via PIL (close enough for image data; both are area-consistent bilinear)."""
    h, w = size
    chans = [
        np.asarray(
            Image.fromarray(img[..., c]).resize((w, h), Image.BILINEAR), np.float32
        )
        for c in range(img.shape[-1])
    ]
    return np.stack(chans, axis=-1)


def _nearest_resize(img: np.ndarray, size) -> np.ndarray:
    h, w = size
    rows = np.floor(np.arange(h) * (img.shape[0] / h)).astype(np.int64)
    cols = np.floor(np.arange(w) * (img.shape[1] / w)).astype(np.int64)
    return img[rows][:, cols]


def _read_image(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32)


class VideoDataset:
    """One-video dataset (``__len__`` == 1, dataset.py:85-86)."""

    def __init__(
        self,
        video_dir: str,
        prompt: str,
        width: int = 512,
        height: int = 512,
        n_sample_frames: int = 8,
        sample_start_idx: int = 0,
        sample_frame_rate: int = 1,
        condition: Sequence[str] = ("openposefull",),
        video_suffix: str = ".png",
        condition_suffix: str = ".png",
        random_sample: bool = False,
        source_mask_dir: Optional[str] = None,
        **_: object,
    ):
        self.video_dir = video_dir
        self.video_path = osp.join(video_dir, "images")
        if isinstance(condition, str):
            condition = [condition]
        self.condition = list(condition)
        self.source_condition_path = {
            c: osp.join(video_dir, "source_condition", c) for c in self.condition
        }
        self.target_condition_path = {
            c: osp.join(video_dir, "target_condition", c) for c in self.condition
        }
        self.video_suffix = video_suffix
        self.condition_suffix = condition_suffix
        self.random_sample = random_sample
        self.source_mask_dir = (
            osp.join(video_dir, source_mask_dir) if source_mask_dir else None
        )

        frame_list_path = osp.join(video_dir, "frame_list.txt")
        if not osp.isfile(frame_list_path):
            all_frames = sorted(glob(osp.join(self.video_path, "*")))
            self.frame_list = [
                osp.basename(p).split(".")[0] for p in all_frames
            ]
            try:
                with open(frame_list_path, "w") as f:
                    f.write("\n".join(self.frame_list) + "\n")
            except OSError:
                pass  # read-only dataset dir
        else:
            with open(frame_list_path) as f:
                self.frame_list = f.read().splitlines()

        self.video_length = len(self.frame_list)
        self.prompt = prompt
        self.prompt_ids = None
        self.width = width
        self.height = height
        self.n_sample_frames = n_sample_frames
        self.sample_start_idx = sample_start_idx
        self.sample_frame_rate = sample_frame_rate

    def __len__(self) -> int:
        return 1

    def __getitem__(self, index: int) -> Dict[str, object]:
        video_indices = list(
            range(self.sample_start_idx, self.video_length, self.sample_frame_rate)
        )
        if self.random_sample:
            start = random.randint(0, len(video_indices) - self.n_sample_frames)
        else:
            start = 0
        sample_index = video_indices[start : start + self.n_sample_frames]
        names = [self.frame_list[fi] for fi in sample_index]

        size = (self.height, self.width)
        frame_paths = [
            osp.join(self.video_path, n + self.video_suffix) for n in names
        ]

        # native decode path (native/frame_loader.cc): matches the
        # reference's torch bilinear (no antialias); falls back to PIL
        from motioneditor_tpu.data import native_loader as nl

        frames_arr = nl.load_frames(frame_paths, *size) if nl.available() else None
        if frames_arr is None:
            frames_arr = np.stack(
                [_bilinear_resize(_read_image(p), size) for p in frame_paths]
            )

        if self.source_mask_dir:
            mask_paths = [osp.join(self.source_mask_dir, n + ".png") for n in names]
            masks_arr = (
                nl.load_frames(mask_paths, *size, mode=nl.MODE_GRAY_NEAREST)
                if nl.available()
                else None
            )
            if masks_arr is None:
                ms = []
                for p in mask_paths:
                    with Image.open(p) as im:
                        ms.append(
                            _nearest_resize(
                                np.asarray(im.convert("L"), np.float32), size
                            )
                        )
                masks_arr = np.stack(ms)[..., None]
            masks_arr = masks_arr[..., 0] / 255.0
        else:
            masks_arr = np.ones((len(names),) + size, np.float32)

        def load_conditions(dirs):
            out = {}
            for c in self.condition:
                paths = [osp.join(dirs[c], n + self.condition_suffix) for n in names]
                arr = nl.load_frames(paths, *size) if nl.available() else None
                if arr is None:
                    arr = np.stack(
                        [_bilinear_resize(_read_image(p), size) for p in paths]
                    )
                out[c] = arr / 255.0
            return out

        return {
            "pixel_values": frames_arr / 127.5 - 1.0,
            "source_conditions": load_conditions(self.source_condition_path),
            "target_conditions": load_conditions(self.target_condition_path),
            "source_masks": masks_arr,
            "sample_indices": np.asarray(sample_index, np.int64),
            "prompt": self.prompt,
        }
