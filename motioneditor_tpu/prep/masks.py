"""Protagonist mask extraction CLI (port of data_preparation/video_masks.py).

The reference runs vendored GroundedSAM: GroundingDINO text-grounded boxes
(:63-96) -> SAM box-prompted masks (:234-252), best box by max logit (:253).

Backends:
  - ``--dino_backend native``: fully first-party JAX — GroundingDINO
    (models/grounding_dino.py, running the ops/ms_deform_attn.py kernel on
    TPU) for text-grounded boxes AND the first-party SAM port
    (models/sam.py: ViT encoder, box prompts, two-way decoder) for the
    masks; official .pth checkpoints + a local BERT vocab are the only
    inputs (see extract_masks_native below).
  - ``--dino_backend transformers``: HF GroundingDINO (torch CPU).
  - explicit error telling the user what to provide.
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


def native_dino_boxes(
    image: "Image.Image",
    caption: str,
    params,
    tokenizer,
    cfg,
    box_threshold: float = 0.3,
    size: int = 800,
):
    """First-party GroundingDINO inference: one image + caption -> (boxes
    xyxy in original pixels, scores). Mirrors video_masks.py:63-96
    (get_grounding_output): sigmoid(logits), max over text tokens, filter by
    box_threshold, best handled by the caller via max score.

    The image is resized to a fixed ``size`` x ``size`` so the program
    compiles once (the torch reference keeps aspect; boxes are normalized
    cxcywh either way, so rescaling to the original WH is exact)."""
    import jax
    import jax.numpy as jnp

    from motioneditor_tpu.models.grounding_dino import (
        build_text_masks,
        grounding_dino_apply,
    )

    caption = caption.lower().strip()
    if not caption.endswith("."):
        caption += "."
    tok = tokenizer(caption)
    ids = np.asarray(tok["input_ids"], np.int32)[None]
    special = [tokenizer.vocab.get(t) for t in ("[CLS]", "[SEP]", ".", "?")]
    special = [s for s in special if s is not None]
    attn, pos = build_text_masks(ids, special)

    w0, h0 = image.size
    im = np.asarray(image.resize((size, size), Image.BILINEAR), np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    im = (im - mean) / std

    out = jax.jit(
        grounding_dino_apply, static_argnames=("cfg",)
    )(
        params, jnp.asarray(im)[None], jnp.asarray(ids), jnp.asarray(attn),
        jnp.asarray(pos), jnp.ones_like(jnp.asarray(ids), bool), cfg=cfg,
    )
    logits = jax.nn.sigmoid(np.asarray(out["pred_logits"])[0])  # [nq, 256]
    boxes = np.asarray(out["pred_boxes"])[0]  # [nq, 4] cxcywh normalized
    scores = np.nan_to_num(logits, neginf=0.0).max(axis=1)
    keep = scores > box_threshold
    boxes, scores = boxes[keep], scores[keep]
    cx, cy, bw, bh = boxes.T
    xyxy = np.stack(
        [(cx - bw / 2) * w0, (cy - bh / 2) * h0,
         (cx + bw / 2) * w0, (cy + bh / 2) * h0], axis=1,
    )
    return xyxy, scores


def extract_masks_native(
    frames_dir: str,
    text_prompt: str,
    save_dir: str,
    dino_ckpt: str,
    bert_vocab: str,
    sam_path: str,
    box_threshold: float = 0.3,
):
    """Fully first-party backend: JAX GroundingDINO boxes + JAX SAM masks
    (when ``sam_path`` is the official sam_vit_*.pth) — the complete
    GroundedSAM pipeline on TPU. An HF SAM directory is still accepted."""
    from transformers import BertTokenizer

    from motioneditor_tpu.models.gdino_weights import (
        load_groundingdino_checkpoint,
    )
    from motioneditor_tpu.models.grounding_dino import GDINO_SWINB, GDINO_SWINT

    cfg = GDINO_SWINB if "swinb" in osp.basename(dino_ckpt).lower() else GDINO_SWINT
    params = load_groundingdino_checkpoint(dino_ckpt, cfg)
    tokenizer = BertTokenizer(vocab_file=bert_vocab)

    native_sam = osp.isfile(sam_path) and sam_path.endswith(".pth")
    if native_sam:
        from motioneditor_tpu.models.sam import (
            SAM_VIT_B,
            SAM_VIT_H,
            load_sam_checkpoint,
            sam_predict_box,
        )

        sam_cfg = SAM_VIT_B if "vit_b" in osp.basename(sam_path) else SAM_VIT_H
        sam_params = load_sam_checkpoint(sam_path, sam_cfg)
    else:
        import torch
        from transformers import SamModel, SamProcessor

        sam_proc = SamProcessor.from_pretrained(sam_path)
        sam = SamModel.from_pretrained(sam_path)

    os.makedirs(save_dir, exist_ok=True)
    for path in sorted(glob(osp.join(frames_dir, "*"))):
        name = osp.splitext(osp.basename(path))[0]
        image = Image.open(path).convert("RGB")
        xyxy, scores = native_dino_boxes(
            image, text_prompt, params, tokenizer, cfg, box_threshold
        )
        if len(scores) == 0:
            mask = np.zeros(image.size[::-1], np.uint8)
        elif native_sam:
            box = xyxy[int(scores.argmax())]
            m = sam_predict_box(sam_params, np.asarray(image), box, sam_cfg)
            mask = (m * 255).astype(np.uint8)
        else:
            import torch

            box = xyxy[int(scores.argmax())].tolist()
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
    p.add_argument(
        "--dino_backend", choices=("native", "transformers"), default="transformers",
        help="native = first-party JAX GroundingDINO (models/grounding_dino.py)",
    )
    p.add_argument(
        "--dino_ckpt", type=str, default="checkpoints/groundingdino_swint_ogc.pth",
        help="official .pth checkpoint (native backend)",
    )
    p.add_argument(
        "--bert_vocab", type=str, default="checkpoints/bert-base-uncased-vocab.txt",
        help="local BERT vocab.txt for the native backend's tokenizer",
    )
    args = p.parse_args()

    if args.dino_backend == "native":
        sam_ok = osp.isdir(args.sam_path) or (
            osp.isfile(args.sam_path) and args.sam_path.endswith(".pth")
        )
        missing = [
            x for x in (args.dino_ckpt, args.bert_vocab)
            if not osp.isfile(x)
        ] + ([] if sam_ok else [args.sam_path])
        if missing:
            raise SystemExit(
                "native mask extraction needs the official GroundingDINO .pth, "
                "a BERT vocab.txt, and a SAM checkpoint (official sam_vit_*.pth "
                f"for the native SAM, or an HF dir) (missing: {missing})."
            )
        extract_masks_native(
            args.data, args.text_prompt, args.save_dir,
            args.dino_ckpt, args.bert_vocab, args.sam_path, args.box_threshold,
        )
        return

    if not (osp.isdir(args.dino_path) and osp.isdir(args.sam_path)):
        raise SystemExit(
            "mask extraction needs local GroundingDINO + SAM checkpoints "
            f"(looked in {args.dino_path}, {args.sam_path}). Point --dino_path/"
            "--sam_path at HF-format checkpoints, use --dino_backend native "
            "with the official .pth, or provide per-frame masks directly as "
            "<video_dir>/man.mask/<frame>.png."
        )
    extract_masks_transformers(
        args.data, args.text_prompt, args.save_dir,
        args.dino_path, args.sam_path, args.box_threshold, args.text_threshold,
    )


if __name__ == "__main__":
    main()
