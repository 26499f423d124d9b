"""Protagonist mask extraction CLI (port of data_preparation/video_masks.py).

The reference runs vendored GroundedSAM: GroundingDINO text-grounded boxes
(:63-96) -> SAM box-prompted masks (:234-252), best box by max logit (:253).
Both are external pretrained stacks (L0). This CLI keeps the same surface;
its deformable-attention hot op has a TPU-native equivalent at
ops/ms_deform_attn.py (replacing the vendored CUDA kernel, SURVEY §2.7).

Backends, tried in order:
  - transformers GroundingDINO + SAM (if checkpoints are available locally)
  - explicit error telling the user what to provide
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from glob import glob

import numpy as np
from PIL import Image


def extract_masks_transformers(
    frames_dir: str,
    text_prompt: str,
    save_dir: str,
    dino_path: str,
    sam_path: str,
    box_threshold: float = 0.3,
    text_threshold: float = 0.25,
):
    """HF-transformers backend (torch CPU is fine for offline prep)."""
    import torch
    from transformers import (
        AutoModelForZeroShotObjectDetection,
        AutoProcessor,
        SamModel,
        SamProcessor,
    )

    dino_proc = AutoProcessor.from_pretrained(dino_path)
    dino = AutoModelForZeroShotObjectDetection.from_pretrained(dino_path)
    sam_proc = SamProcessor.from_pretrained(sam_path)
    sam = SamModel.from_pretrained(sam_path)

    os.makedirs(save_dir, exist_ok=True)
    for path in sorted(glob(osp.join(frames_dir, "*"))):
        name = osp.splitext(osp.basename(path))[0]
        image = Image.open(path).convert("RGB")
        inputs = dino_proc(images=image, text=text_prompt, return_tensors="pt")
        with torch.no_grad():
            out = dino(**inputs)
        res = dino_proc.post_process_grounded_object_detection(
            out, inputs.input_ids, box_threshold=box_threshold,
            text_threshold=text_threshold, target_sizes=[image.size[::-1]],
        )[0]
        if len(res["scores"]) == 0:
            mask = np.zeros(image.size[::-1], np.uint8)
        else:
            best = int(res["scores"].argmax())
            box = res["boxes"][best].tolist()
            s_in = sam_proc(image, input_boxes=[[box]], return_tensors="pt")
            with torch.no_grad():
                s_out = sam(**s_in)
            masks = sam_proc.image_processor.post_process_masks(
                s_out.pred_masks.cpu(), s_in["original_sizes"].cpu(),
                s_in["reshaped_input_sizes"].cpu(),
            )[0]
            mask = (masks[0, 0].numpy() * 255).astype(np.uint8)
        Image.fromarray(mask).save(osp.join(save_dir, name + ".png"))
        print(f"wrote {name}.png")


def main():
    p = argparse.ArgumentParser("Video masks (GroundedSAM equivalent)")
    p.add_argument("--data", type=str, required=True, help="frames dir")
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--text_prompt", type=str, required=True, help='e.g. "person"')
    p.add_argument("--dino_path", type=str, default="checkpoints/grounding-dino-base")
    p.add_argument("--sam_path", type=str, default="checkpoints/sam-vit-huge")
    p.add_argument("--box_threshold", type=float, default=0.3)
    p.add_argument("--text_threshold", type=float, default=0.25)
    args = p.parse_args()

    if not (osp.isdir(args.dino_path) and osp.isdir(args.sam_path)):
        raise SystemExit(
            "mask extraction needs local GroundingDINO + SAM checkpoints "
            f"(looked in {args.dino_path}, {args.sam_path}). Point --dino_path/"
            "--sam_path at HF-format checkpoints, or provide per-frame masks "
            "directly as <video_dir>/man.mask/<frame>.png."
        )
    extract_masks_transformers(
        args.data, args.text_prompt, args.save_dir,
        args.dino_path, args.sam_path, args.box_threshold, args.text_threshold,
    )


if __name__ == "__main__":
    main()
