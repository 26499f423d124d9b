"""Edit-quality evaluation CLI.

Computes the paper-style metrics (SURVEY §6 / BASELINE.md north star) on an
edited clip vs its source:

  - PSNR / SSIM of the reconstruction branch vs the source video
  - temporal consistency (pixel + CLIP-frame when CLIP weights available)
  - CLIP score of the edit vs the target prompt (needs an openai
    clip-vit-large-patch14 checkpoint directory)
  - LPIPS (needs torchvision alexnet + lpips linear weights)

Usage:
  python scripts/evaluate.py --source <dir-or-gif> --recon <gif> --edit <gif> \
      --prompt "a man is dancing" [--clip_path checkpoints/clip-vit-large-patch14]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def load_video(path: str) -> np.ndarray:
    """GIF/MP4 file or a directory of frames -> [F, H, W, 3] in [0,1].

    Directories may be either a flat frame dir or a reference case dir
    (``data/case-N`` with an ``images/`` subdir next to ``frame_list.txt``,
    ``man.mask`` etc. — motion_editor/data/dataset.py:35-61); non-image
    entries are skipped so the cached ``frame_list.txt`` never trips PIL."""
    import imageio
    from PIL import Image

    if osp.isdir(path):
        from glob import glob

        if osp.isdir(osp.join(path, "images")):
            path = osp.join(path, "images")
        frame_paths = [
            p
            for p in sorted(glob(osp.join(path, "*")))
            if p.lower().endswith(_IMAGE_EXTS)
        ]
        if not frame_paths:
            raise FileNotFoundError(f"no image frames ({'/'.join(_IMAGE_EXTS)}) in {path}")
        frames = [
            np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
            for p in frame_paths
        ]
        return np.stack(frames)
    reader = imageio.get_reader(path)
    frames = [np.asarray(f, np.float32)[..., :3] / 255.0 for f in reader]
    return np.stack(frames)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--source", type=str, required=True)
    p.add_argument("--recon", type=str, default=None)
    p.add_argument("--edit", type=str, default=None)
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--clip_path", type=str, default="checkpoints/clip-vit-large-patch14")
    p.add_argument("--out", type=str, default=None, help="also write the metrics JSON here")
    args = p.parse_args()

    from motioneditor_tpu.utils.runtime import setup

    setup()
    import jax.numpy as jnp

    from motioneditor_tpu.eval.metrics import psnr, ssim, temporal_consistency

    source = load_video(args.source)
    out = {}

    def match(a, b):
        """Align two videos for pixel metrics: crop to the common frame
        count, and RESIZE (bilinear) the larger spatial resolution down to
        the smaller — the source is typically full-res while the generated
        clip is at the config's width/height, and a blind crop would compare
        a corner of the source against the whole generation."""
        f = min(a.shape[0], b.shape[0])
        a, b = a[:f], b[:f]

        def resize_to(x, h, w):
            if x.shape[1] == h and x.shape[2] == w:
                return x
            from PIL import Image

            return np.stack(
                [
                    np.asarray(
                        Image.fromarray(
                            (np.clip(fr, 0, 1) * 255).astype(np.uint8)
                        ).resize((w, h), Image.BILINEAR),
                        np.float32,
                    )
                    / 255.0
                    for fr in x
                ]
            )

        h = min(a.shape[1], b.shape[1])
        w = min(a.shape[2], b.shape[2])
        return resize_to(a, h, w), resize_to(b, h, w)

    if args.recon:
        recon = load_video(args.recon)
        s, r = match(source, recon)
        out["recon_psnr"] = float(psnr(jnp.asarray(r), jnp.asarray(s)))
        out["recon_ssim"] = float(ssim(jnp.asarray(r), jnp.asarray(s)))

    if args.edit:
        edit = load_video(args.edit)
        out["edit_temporal_consistency"] = float(
            temporal_consistency(jnp.asarray(edit))
        )
        if args.prompt and osp.isdir(args.clip_path):
            from motioneditor_tpu.eval.metrics import clip_score, frame_clip_consistency
            from motioneditor_tpu.models.clip_image import port_clip_image
            from motioneditor_tpu.models.weights import (
                _load_state_dict,
                find_model_file,
                port_clip_text,
            )
            from transformers import CLIPTokenizer

            sd = _load_state_dict(find_model_file(args.clip_path))
            img_params = port_clip_image(sd)
            txt_params = port_clip_text(sd)
            tokenizer = CLIPTokenizer.from_pretrained(args.clip_path)
            out["edit_clip_score"] = float(
                clip_score(jnp.asarray(edit), args.prompt, img_params, txt_params, tokenizer)
            )
            out["edit_frame_clip_consistency"] = float(
                frame_clip_consistency(jnp.asarray(edit), img_params)
            )

    text = json.dumps(out, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text + "\n")


if __name__ == "__main__":
    main()
