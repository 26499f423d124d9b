"""Manifest-driven weight-mapper coverage.

The round-4 review flagged the mapper tests as circular: they exercised
synthetic state_dicts generated from the SAME naming assumptions the
mappers implement, so naming drift vs the real checkpoints would pass
silently. These tests drive every mapper from the checked-in key
inventories of the real checkpoint families the reference depends on
(tests/fixtures/manifests/*.txt, provenance documented in
scripts/gen_weight_manifests.py) and assert, per family:

  1. CONSUMPTION — every manifest tensor is actually read by the mapper
     (tracked on the value objects, so dict rebuilds inside mappers can't
     hide a miss), minus an explicit documented-ignore set (buffers like
     CLIP position_ids).
  2. PRODUCTION — every parameter of the target init_* pytree is produced
     by the mapper at the right path with the right shape, minus the
     documented zero-init video-inflation modules that the checkpoints
     rightly do not contain (resnet_2d.py:15-16 invariant).

Reference checkpoint families: inference.py:152-156, README.md:39-46.
"""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

MANIFEST_DIR = osp.join(osp.dirname(__file__), "fixtures", "manifests")

pytestmark = pytest.mark.slow  # full-size pytrees (0.7-3.4 GB per family)


def load_manifest(name):
    entries = {}
    with open(osp.join(MANIFEST_DIR, name + ".txt")) as f:
        for line in f:
            key, shape = line.split()
            entries[key] = tuple(int(d) for d in shape.split(","))
    return entries


class ManifestTensor:
    """Stand-in checkpoint tensor that records the first real data access.

    Mappers normalize values via np.asarray()/jnp.asarray() (-> __array__),
    or touch .T/.transpose()/indexing directly; each marks the key consumed.
    Pure metadata looks (.shape/.ndim) do NOT count as consumption.
    """

    def __init__(self, key, shape, hits):
        self.key = key
        self._shape = tuple(shape)
        self._hits = hits

    def _data(self):
        self._hits.add(self.key)
        return np.zeros(self._shape, np.float32)

    def __array__(self, dtype=None, copy=None):
        arr = self._data()
        return arr.astype(dtype) if dtype is not None else arr

    @property
    def T(self):
        return self._data().T

    def transpose(self, *axes):
        return self._data().transpose(*axes)

    def __getitem__(self, idx):
        return self._data()[idx]

    def astype(self, dtype):
        return self._data().astype(dtype)

    def reshape(self, *shape):
        return self._data().reshape(*shape)

    @property
    def shape(self):
        return self._shape

    @property
    def ndim(self):
        return len(self._shape)


def manifest_sd(name):
    hits: set = set()
    entries = load_manifest(name)
    sd = {k: ManifestTensor(k, s, hits) for k, s in entries.items()}
    return sd, set(entries), hits


def flatten_paths(tree):
    """pytree -> {'a.b.0.kernel': shape}."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            else:
                parts.append(str(p.idx))
        flat[".".join(parts)] = tuple(leaf.shape)
    return flat


def assert_coverage(name, port_fn, init_shapes, ignored=(), zero_init_ok=()):
    """Run ``port_fn`` over the manifest; assert consumption + production."""
    sd, all_keys, hits = manifest_sd(name)
    overlay = port_fn(sd)

    unconsumed = all_keys - hits - set(ignored)
    assert not unconsumed, (
        f"{name}: mapper never read {len(unconsumed)} checkpoint tensors, "
        f"e.g. {sorted(unconsumed)[:8]}"
    )

    got = flatten_paths(overlay)
    # every produced leaf must exist in the init tree with the same shape
    for path, shape in got.items():
        assert path in init_shapes, f"{name}: mapper produced unknown param {path}"
        assert shape == init_shapes[path], (
            f"{name}: {path} shape {shape} != init {init_shapes[path]}"
        )
    # every init param must be produced, except documented zero-init modules
    missing = set(init_shapes) - set(got)
    unexpected = {
        p for p in missing if not any(tag in p for tag in zero_init_ok)
    }
    assert not unexpected, (
        f"{name}: mapper failed to produce {len(unexpected)} target params, "
        f"e.g. {sorted(unexpected)[:8]}"
    )


def eval_shapes(init_fn):
    return flatten_paths(jax.eval_shape(init_fn, jax.random.PRNGKey(0)))


# ---------------------------------------------------------------------------
# SD-1.5 UNet / VAE / CLIP / ControlNet-openpose
# ---------------------------------------------------------------------------


def test_sd15_unet_manifest():
    from motioneditor_tpu.models.unet import UNetConfig, init_unet
    from motioneditor_tpu.models.weights import port_unet

    init_shapes = eval_shapes(lambda k: init_unet(k, UNetConfig()))
    assert_coverage(
        "sd15_unet",
        lambda sd: port_unet(sd, video=True),
        init_shapes,
        # video inflation modules are zero-init by design and absent from
        # the SD-1.5 checkpoint (resnet_2d.py:15-16, attention_2d.py:462);
        # the adapter trains in stage 2 (train_adaptor.py:397-399)
        zero_init_ok=(
            "attn_temp", "norm_temp", "temp_conv1", "temp_conv2",
            "controlnet_adapter",
        ),
    )


def test_sd15_vae_manifest():
    from motioneditor_tpu.models.vae import init_vae
    from motioneditor_tpu.models.weights import port_vae

    init_shapes = eval_shapes(init_vae)
    assert_coverage("sd15_vae", port_vae, init_shapes)


def test_sd15_clip_text_manifest():
    from motioneditor_tpu.models.clip_text import init_clip_text
    from motioneditor_tpu.models.weights import port_clip_text

    init_shapes = eval_shapes(init_clip_text)
    assert_coverage(
        "sd15_clip_text",
        port_clip_text,
        init_shapes,
        ignored=("text_model.embeddings.position_ids",),  # constant buffer
    )


def test_controlnet_openpose_manifest():
    import dataclasses

    from motioneditor_tpu.models.controlnet import init_controlnet
    from motioneditor_tpu.models.unet import UNetConfig
    from motioneditor_tpu.models.weights import port_controlnet

    cfg = dataclasses.replace(
        UNetConfig(), video=False, use_sc_attn=False, use_st_attn=False
    )
    init_shapes = eval_shapes(lambda k: init_controlnet(k, cfg))
    assert_coverage("controlnet_openpose", port_controlnet, init_shapes)


# ---------------------------------------------------------------------------
# OpenPose body / hand / face
# ---------------------------------------------------------------------------


def _openpose_case(name, convert, init_fn):
    from motioneditor_tpu.models import openpose as OP  # noqa: F401

    init_shapes = eval_shapes(init_fn)
    assert_coverage(name, convert, init_shapes)


def test_openpose_body_manifest():
    from motioneditor_tpu.models.openpose import (
        convert_body_state_dict,
        init_body_params,
    )

    _openpose_case("openpose_body", convert_body_state_dict, init_body_params)


def test_openpose_hand_manifest():
    from motioneditor_tpu.models.openpose import (
        convert_hand_state_dict,
        init_hand_params,
    )

    _openpose_case("openpose_hand", convert_hand_state_dict, init_hand_params)


def test_openpose_face_manifest():
    from motioneditor_tpu.models.openpose import (
        convert_face_state_dict,
        init_face_params,
    )

    _openpose_case("openpose_face", convert_face_state_dict, init_face_params)


# ---------------------------------------------------------------------------
# GroundedSAM stack
# ---------------------------------------------------------------------------


def test_sam_vit_h_manifest():
    from motioneditor_tpu.models.sam import SAM_VIT_H, init_sam, map_sam_state_dict

    sam_ignored = tuple(
        f"prompt_encoder.mask_downscaling.{i}.{kind}"
        for i in (0, 1, 3, 4, 6)
        for kind in ("weight", "bias")
    )
    init_shapes = eval_shapes(lambda k: init_sam(k, SAM_VIT_H))
    assert_coverage(
        "sam_vit_h",
        lambda sd: map_sam_state_dict(sd, SAM_VIT_H),
        init_shapes,
        # mask-PROMPT embedding path: the reference pipeline only ever
        # box-prompts SAM (video_masks.py:234-252 predictor.predict(box=...))
        # so the port scopes to sam_predict_box and doesn't load the mask
        # downscaler (documented capability scope, not a mapping miss)
        ignored=sam_ignored,
    )


def test_gdino_swint_manifest():
    from motioneditor_tpu.models.gdino_weights import (
        GDINO_SWINT,
        map_groundingdino_state_dict,
    )
    from motioneditor_tpu.models.grounding_dino import init_grounding_dino

    sd, all_keys, hits = manifest_sd("gdino_swint")
    overlay = map_groundingdino_state_dict(sd, GDINO_SWINT)
    unconsumed = all_keys - hits

    # legitimate non-weights / duplicates in the real checkpoint:
    #   - relative_position_index: deterministic index buffers (recomputed)
    #   - bert.pooler: frozen at construction (groundingdino.py:109) and
    #     never used in the grounding forward (bertwarper uses sequence
    #     outputs), so the port doesn't carry it
    #   - bbox_embed.{1..5} / transformer.decoder.bbox_embed.{0..5}: with
    #     dec_pred_bbox_embed_share=True all entries are THE SAME MLP
    #     (aliased modules -> duplicated tensors in state_dict); the mapper
    #     reads the canonical copy bbox_embed.0
    def expected(k):
        if k.endswith("relative_position_index"):
            return True
        if k.startswith("bert.pooler."):
            return True
        if k.startswith("transformer.decoder.bbox_embed."):
            return True
        if k.startswith("bbox_embed.") and not k.startswith("bbox_embed.0."):
            return True
        return False

    leftovers = {k for k in unconsumed if not expected(k)}
    assert not leftovers, (
        f"gdino_swint: mapper never read {len(leftovers)} checkpoint "
        f"tensors, e.g. {sorted(leftovers)[:8]}"
    )

    init_shapes = eval_shapes(lambda k: init_grounding_dino(k, GDINO_SWINT))
    got = flatten_paths(overlay)
    for path, shape in got.items():
        assert path in init_shapes, f"gdino: mapper produced unknown param {path}"
        assert shape == init_shapes[path], (
            f"gdino: {path} shape {shape} != init {init_shapes[path]}"
        )
    missing = set(init_shapes) - set(got)
    assert not missing, (
        f"gdino: mapper failed to produce {len(missing)} target params, "
        f"e.g. {sorted(missing)[:8]}"
    )
