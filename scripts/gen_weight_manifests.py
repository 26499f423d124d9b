"""Generate real-checkpoint key-inventory manifests for the weight mappers.

Writes ``tests/fixtures/manifests/<family>.txt`` — one ``<key> <d0,d1,...>``
line per checkpoint tensor — for every pretrained family the reference
depends on (README.md:39-46, inference.py:152-156). The manifests break the
circularity the round-4 review flagged: the mapper tests previously
exercised synthetic state_dicts generated from the SAME naming assumptions
the mappers implement, so a naming drift would pass silently. These
fixtures are produced by independent paths:

  gdino_swint        REAL: the reference's own vendored GroundingDINO model
                     class instantiated (torchvision/timm stubbed — they
                     contribute no parameters) from its shipped SwinT config;
                     the official ``groundingdino_swint_ogc.pth`` is a strict
                     state_dict of exactly this module tree (module. prefix
                     stripped by the reference's clean_state_dict).
  sam_vit_h          REAL: the vendored segment_anything ``build_sam_vit_h``
                     module tree; ``sam_vit_h_4b8939.pth`` strict-loads it.
  sd15_clip_text     REAL: transformers ``CLIPTextModel`` with the SD-1.5
                     text-encoder config (openai/clip-vit-large-patch14
                     geometry) — the same library that wrote the checkpoint.
  sd15_unet /        RECONSTRUCTED from the diffusers 0.15 module trees
  sd15_vae /         (UNet2DConditionModel / AutoencoderKL / ControlNetModel
  controlnet_openpose  with the published SD-1.5 configs), written as
                     explicit loops INDEPENDENT of models/weights.py's
                     consumption logic. diffusers is not installed in this
                     environment, so this is the strongest available source;
                     re-verify against the actual files the day weights land.
  openpose_body/hand/face  RECONSTRUCTED from the CMU OpenPose architecture
                     tables (the controlnet_aux/pytorch-openpose layer dicts)
                     that the checkpoints (body_pose_model.pth etc.) are
                     state_dicts of.
  midas_dpt_hybrid   NOT EMITTED: the checkpoint's backbone inventory is a
                     timm vit_base_resnet50_384 module tree and timm is not
                     installed; a from-memory reconstruction of ~500 keys
                     would put fiction in a fixture. models/midas.py's mapper
                     remains covered by its shape-accurate synthetic tests.

Run: python scripts/gen_weight_manifests.py
"""

from __future__ import annotations

import os
import os.path as osp
import sys
import types

OUT_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "tests", "fixtures", "manifests")
REF = "/root/reference/data_preparation/GroundedSAM"


def write_manifest(name: str, entries: dict) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    path = osp.join(OUT_DIR, name + ".txt")
    with open(path, "w") as f:
        for k in sorted(entries):
            shape = ",".join(str(int(d)) for d in entries[k])
            f.write(f"{k} {shape}\n")
    print(f"wrote {path}: {len(entries)} tensors")


# ---------------------------------------------------------------------------
# stubs: torchvision / timm contribute no parameters to any state_dict
# ---------------------------------------------------------------------------


def _install_stubs() -> None:
    import importlib.machinery

    import torch
    import torch.nn as nn

    def _mod(name: str) -> types.ModuleType:
        m = types.ModuleType(name)
        # transformers probes importlib.util.find_spec("timm"), which raises
        # on spec-less synthetic modules
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    if "torchvision" not in sys.modules:
        tv = _mod("torchvision")
        tv.__version__ = "0.15.0"  # version probes in vendored util/misc.py
        tv.__path__ = []  # mark as package so submodule imports resolve
        models_mod = _mod("torchvision.models")
        models_utils = _mod("torchvision.models._utils")

        class _IntermediateLayerGetter(nn.ModuleDict):
            def __init__(self, model, return_layers):
                orig = return_layers
                return_layers = {str(k): str(v) for k, v in return_layers.items()}
                layers = {}
                for name, module in model.named_children():
                    layers[name] = module
                    if name in return_layers:
                        del return_layers[name]
                    if not return_layers:
                        break
                super().__init__(layers)
                self.return_layers = orig

            def forward(self, x):
                out = {}
                for name, module in self.items():
                    x = module(x)
                    if name in self.return_layers:
                        out[self.return_layers[name]] = x
                return out

        models_utils.IntermediateLayerGetter = _IntermediateLayerGetter
        models_mod._utils = models_utils
        tv.models = models_mod
        sys.modules["torchvision.models"] = models_mod
        sys.modules["torchvision.models._utils"] = models_utils
        ops = _mod("torchvision.ops")
        boxes = _mod("torchvision.ops.boxes")
        boxes.nms = lambda *a, **k: None
        boxes.batched_nms = lambda *a, **k: None
        boxes.box_area = lambda *a, **k: None
        ops.boxes = boxes
        transforms = _mod("torchvision.transforms")
        functional = _mod("torchvision.transforms.functional")
        functional.resize = lambda *a, **k: None
        functional.to_pil_image = lambda *a, **k: None
        transforms.functional = functional
        tv.ops = ops
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.boxes"] = boxes
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = functional

    if "addict" not in sys.modules:
        # minimal attribute-dict (vendored slconfig's base class); the
        # config object itself is built via runpy, this only satisfies the
        # import chain groundingdino.util.utils -> slconfig -> addict
        class _AddictDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        addict = _mod("addict")
        addict.Dict = _AddictDict
        sys.modules["addict"] = addict

    if "yapf" not in sys.modules:
        yapf = _mod("yapf")
        fmt = _mod("yapf.yapflib")
        yapf_api = _mod("yapf.yapflib.yapf_api")
        yapf_api.FormatCode = lambda code, **k: (code, True)
        fmt.yapf_api = yapf_api
        yapf.yapflib = fmt
        sys.modules["yapf"] = yapf
        sys.modules["yapf.yapflib"] = fmt
        sys.modules["yapf.yapflib.yapf_api"] = yapf_api

    if "pycocotools" not in sys.modules:
        pct = _mod("pycocotools")
        msk = _mod("pycocotools.mask")
        pct.mask = msk
        sys.modules["pycocotools"] = pct
        sys.modules["pycocotools.mask"] = msk

    if "matplotlib" not in sys.modules:
        try:
            import matplotlib  # noqa: F401
        except ImportError:
            mpl = _mod("matplotlib")
            plt = _mod("matplotlib.pyplot")
            coll = _mod("matplotlib.collections")
            coll.PatchCollection = object
            patches = _mod("matplotlib.patches")
            patches.Polygon = object
            mpl.pyplot = plt
            mpl.collections = coll
            mpl.patches = patches
            sys.modules["matplotlib"] = mpl
            sys.modules["matplotlib.pyplot"] = plt
            sys.modules["matplotlib.collections"] = coll
            sys.modules["matplotlib.patches"] = patches

    if "timm" not in sys.modules:
        class DropPath(nn.Module):  # parameter-free, matches timm semantics
            def __init__(self, drop_prob=None):
                super().__init__()

            def forward(self, x):
                return x

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        timm = _mod("timm")
        models = _mod("timm.models")
        layers = _mod("timm.models.layers")
        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers


def _sd_entries(module) -> dict:
    return {k: tuple(v.shape) for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# GroundingDINO SwinT (vendored reference class = ground truth)
# ---------------------------------------------------------------------------


def gen_gdino() -> None:
    _install_stubs()
    sys.path.insert(0, osp.join(REF, "GroundingDINO"))
    from transformers import BertConfig, BertModel, AutoTokenizer  # noqa: F401

    import groundingdino.util.get_tokenlizer as get_tok

    # offline: the default BertConfig IS bert-base-uncased's architecture
    get_tok.get_pretrained_language_model = lambda t: BertModel(BertConfig())

    class _TokStub:  # model construction only touches special-token ids
        def convert_tokens_to_ids(self, toks):
            ids = {"[CLS]": 101, "[SEP]": 102, ".": 1012, "?": 1029}
            return [ids[t] for t in toks]

    get_tok.get_tokenlizer = lambda t: _TokStub()

    import runpy

    from groundingdino.models import build_model

    # SLConfig needs `addict`/`yapf` (absent here); the config is a plain
    # python file of module-level variables — load it directly
    cfg_vars = runpy.run_path(
        osp.join(REF, "GroundingDINO/groundingdino/config/GroundingDINO_SwinT_OGC.py")
    )

    class _Args:
        pass

    args = _Args()
    for k, v in cfg_vars.items():
        if not k.startswith("_"):
            setattr(args, k, v)
    model = build_model(args)
    write_manifest("gdino_swint", _sd_entries(model))


# ---------------------------------------------------------------------------
# SAM ViT-H (vendored reference class = ground truth)
# ---------------------------------------------------------------------------


def gen_sam() -> None:
    _install_stubs()
    sys.path.insert(0, osp.join(REF, "segment_anything"))
    from segment_anything import build_sam_vit_h

    model = build_sam_vit_h(checkpoint=None)
    write_manifest("sam_vit_h", _sd_entries(model))


# ---------------------------------------------------------------------------
# SD-1.5 CLIP text encoder (transformers = the library that wrote it)
# ---------------------------------------------------------------------------


def gen_clip_text() -> None:
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(  # runwayml/stable-diffusion-v1-5 text_encoder/config.json
        vocab_size=49408,
        hidden_size=768,
        intermediate_size=3072,
        num_hidden_layers=12,
        num_attention_heads=12,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
    )
    model = CLIPTextModel(cfg)
    sd = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    # the .bin checkpoint additionally stores the position_ids buffer
    sd.setdefault("text_model.embeddings.position_ids", (1, 77))
    write_manifest("sd15_clip_text", sd)


# ---------------------------------------------------------------------------
# SD-1.5 UNet / VAE / ControlNet-openpose: explicit diffusers-0.15 module
# trees (independent of models/weights.py's consumption loops)
# ---------------------------------------------------------------------------


def _add(d, key, *shape):
    d[key] = tuple(shape)


def _add_linear(d, p, out_f, in_f):
    _add(d, p + ".weight", out_f, in_f)
    _add(d, p + ".bias", out_f)


def _add_conv(d, p, out_c, in_c, k):
    _add(d, p + ".weight", out_c, in_c, k, k)
    _add(d, p + ".bias", out_c)


def _add_norm(d, p, c):
    _add(d, p + ".weight", c)
    _add(d, p + ".bias", c)


def _add_resnet(d, p, in_c, out_c, temb=1280, shortcut=None):
    """diffusers ResnetBlock2D: norm1/conv1/time_emb_proj/norm2/conv2
    (+conv_shortcut when in_c != out_c)."""
    _add_norm(d, p + ".norm1", in_c)
    _add_conv(d, p + ".conv1", out_c, in_c, 3)
    if temb:
        _add_linear(d, p + ".time_emb_proj", out_c, temb)
    _add_norm(d, p + ".norm2", out_c)
    _add_conv(d, p + ".conv2", out_c, out_c, 3)
    if shortcut is None:
        shortcut = in_c != out_c
    if shortcut:
        _add_conv(d, p + ".conv_shortcut", out_c, in_c, 1)


def _add_transformer2d(d, p, c, heads_dim_ignored, cross=768):
    """diffusers Transformer2DModel depth-1 (SD-1.5): GN + 1x1 conv
    proj_in/out + one BasicTransformerBlock."""
    _add_norm(d, p + ".norm", c)
    _add_conv(d, p + ".proj_in", c, c, 1)
    b = p + ".transformer_blocks.0"
    for attn, kdim in ((".attn1", c), (".attn2", cross)):
        _add(d, b + attn + ".to_q.weight", c, c)
        _add(d, b + attn + ".to_k.weight", c, kdim)
        _add(d, b + attn + ".to_v.weight", c, kdim)
        _add_linear(d, b + attn + ".to_out.0", c, c)
    _add_linear(d, b + ".ff.net.0.proj", c * 8, c)  # GEGLU: 2x inner
    _add_linear(d, b + ".ff.net.2", c, c * 4)
    _add_norm(d, b + ".norm1", c)
    _add_norm(d, b + ".norm2", c)
    _add_norm(d, b + ".norm3", c)
    _add_conv(d, p + ".proj_out", c, c, 1)


def _sd15_encoder_tree(d):
    """conv_in + time_embedding + down_blocks + mid_block (shared between
    the UNet and ControlNet manifests)."""
    chans = (320, 640, 1280, 1280)
    _add_conv(d, "conv_in", 320, 4, 3)
    _add_linear(d, "time_embedding.linear_1", 1280, 320)
    _add_linear(d, "time_embedding.linear_2", 1280, 1280)
    in_c = 320
    for i, c in enumerate(chans):
        p = f"down_blocks.{i}"
        for j in range(2):
            _add_resnet(d, f"{p}.resnets.{j}", in_c if j == 0 else c, c)
            if i < 3:  # CrossAttnDownBlock2D
                _add_transformer2d(d, f"{p}.attentions.{j}", c, None)
        if i < 3:
            _add_conv(d, f"{p}.downsamplers.0.conv", c, c, 3)
        in_c = c
    _add_resnet(d, "mid_block.resnets.0", 1280, 1280)
    _add_transformer2d(d, "mid_block.attentions.0", 1280, None)
    _add_resnet(d, "mid_block.resnets.1", 1280, 1280)


def gen_sd15_unet() -> None:
    d: dict = {}
    _sd15_encoder_tree(d)
    chans = (320, 640, 1280, 1280)
    rev = (1280, 1280, 640, 320)  # up block out-channels
    for i, c in enumerate(rev):
        p = f"up_blocks.{i}"
        prev = rev[i - 1] if i else 1280  # incoming hidden channels
        for j in range(3):
            # skip-connection channels: reversed down-res channel stack
            skip = chans[min(3 - i, 3)] if j == 0 else (
                chans[max(3 - i - 1, 0)] if j == 2 else chans[3 - i]
            )
            # diffusers: res_skip_channels = in_channels (=c) except the last
            # resnet of each block which sees the previous level's channels
            res_skip = c if j < 2 else chans[max(3 - i - 1, 0)]
            res_in = (prev if j == 0 else c) + res_skip
            _add_resnet(d, f"{p}.resnets.{j}", res_in, c, shortcut=True)
            if i > 0:  # CrossAttnUpBlock2D (block 0 is plain UpBlock2D)
                _add_transformer2d(d, f"{p}.attentions.{j}", c, None)
        if i < 3:
            _add_conv(d, f"{p}.upsamplers.0.conv", c, c, 3)
    _add_norm(d, "conv_norm_out", 320)
    _add_conv(d, "conv_out", 4, 320, 3)
    write_manifest("sd15_unet", d)


def gen_controlnet_openpose() -> None:
    d: dict = {}
    _sd15_encoder_tree(d)
    # conditioning embedding: conv_in 3->16, blocks 16-16-32-32-96-96, out->320
    emb = "controlnet_cond_embedding"
    _add_conv(d, emb + ".conv_in", 16, 3, 3)
    widths = (16, 16, 32, 32, 96, 96)
    outs = (16, 32, 32, 96, 96, 256)
    for i, (ic, oc) in enumerate(zip(widths, outs)):
        _add_conv(d, f"{emb}.blocks.{i}", oc, ic, 3)
    _add_conv(d, emb + ".conv_out", 320, 256, 3)
    # zero convs: 12 down + 1 mid, channel-matched to the down-res stack
    res_ch = (320, 320, 320, 320, 640, 640, 640, 1280, 1280, 1280, 1280, 1280)
    for i, c in enumerate(res_ch):
        _add_conv(d, f"controlnet_down_blocks.{i}", c, c, 1)
    _add_conv(d, "controlnet_mid_block", 1280, 1280, 1)
    write_manifest("controlnet_openpose", d)


def gen_sd15_vae() -> None:
    d: dict = {}
    ch = (128, 256, 512, 512)

    def res(p, ic, oc):
        _add_resnet(d, p, ic, oc, temb=0)

    _add_conv(d, "encoder.conv_in", 128, 3, 3)
    in_c = 128
    for i, c in enumerate(ch):
        p = f"encoder.down_blocks.{i}"
        for j in range(2):
            res(f"{p}.resnets.{j}", in_c if j == 0 else c, c)
        if i < 3:
            _add_conv(d, f"{p}.downsamplers.0.conv", c, c, 3)
        in_c = c
    res("encoder.mid_block.resnets.0", 512, 512)
    a = "encoder.mid_block.attentions.0"
    _add_norm(d, a + ".group_norm", 512)
    for n in ("query", "key", "value", "proj_attn"):
        _add_linear(d, f"{a}.{n}", 512, 512)
    res("encoder.mid_block.resnets.1", 512, 512)
    _add_norm(d, "encoder.conv_norm_out", 512)
    _add_conv(d, "encoder.conv_out", 8, 512, 3)

    _add_conv(d, "decoder.conv_in", 512, 4, 3)
    res("decoder.mid_block.resnets.0", 512, 512)
    a = "decoder.mid_block.attentions.0"
    _add_norm(d, a + ".group_norm", 512)
    for n in ("query", "key", "value", "proj_attn"):
        _add_linear(d, f"{a}.{n}", 512, 512)
    res("decoder.mid_block.resnets.1", 512, 512)
    rev = (512, 512, 256, 128)
    in_c = 512
    for i, c in enumerate(rev):
        p = f"decoder.up_blocks.{i}"
        for j in range(3):
            res(f"{p}.resnets.{j}", in_c if j == 0 else c, c)
        if i < 3:
            _add_conv(d, f"{p}.upsamplers.0.conv", c, c, 3)
        in_c = c
    _add_norm(d, "decoder.conv_norm_out", 128)
    _add_conv(d, "decoder.conv_out", 3, 128, 3)

    _add_conv(d, "quant_conv", 8, 8, 1)
    _add_conv(d, "post_quant_conv", 4, 4, 1)
    write_manifest("sd15_vae", d)


# ---------------------------------------------------------------------------
# OpenPose body / hand / face (CMU architecture tables)
# ---------------------------------------------------------------------------


def _conv_flat(d, layers):
    """layers: list of (name, out_c, in_c, k) -> prefix-STRIPPED keys, the
    real on-disk layout of the lllyasviel/Annotators pose checkpoints
    (``conv1_1.weight``, ``Mconv7_stage6_L2.weight`` — the reference stack
    re-adds module prefixes via util.transfer)."""
    for name, out_c, in_c, k in layers:
        _add(d, f"{name}.weight", out_c, in_c, k, k)
        _add(d, f"{name}.bias", out_c)


_VGG_CPM_STEM = [  # shared hand/face stem (hand.py/face.py through conv5_3_CPM)
    ("conv1_1", 64, 3, 3), ("conv1_2", 64, 64, 3),
    ("conv2_1", 128, 64, 3), ("conv2_2", 128, 128, 3),
    ("conv3_1", 256, 128, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3),
    ("conv4_1", 512, 256, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3", 512, 512, 3), ("conv4_4", 512, 512, 3),
    ("conv5_1", 512, 512, 3), ("conv5_2", 512, 512, 3),
    ("conv5_3_CPM", 128, 512, 3),
]


def gen_openpose_body() -> None:
    d: dict = {}
    # VGG-19 trunk + CPM head (body model block0)
    _conv_flat(d, [
        ("conv1_1", 64, 3, 3), ("conv1_2", 64, 64, 3),
        ("conv2_1", 128, 64, 3), ("conv2_2", 128, 128, 3),
        ("conv3_1", 256, 128, 3), ("conv3_2", 256, 256, 3),
        ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3),
        ("conv4_1", 512, 256, 3), ("conv4_2", 512, 512, 3),
        ("conv4_3_CPM", 256, 512, 3), ("conv4_4_CPM", 128, 256, 3),
    ])
    # stage 1: two branches (L1 PAFs 38ch, L2 heatmaps 19ch)
    for br, out in (("1", 38), ("2", 19)):
        _conv_flat(d, [
            (f"conv5_1_CPM_L{br}", 128, 128, 3),
            (f"conv5_2_CPM_L{br}", 128, 128, 3),
            (f"conv5_3_CPM_L{br}", 128, 128, 3),
            (f"conv5_4_CPM_L{br}", 512, 128, 1),
            (f"conv5_5_CPM_L{br}", out, 512, 1),
        ])
    # stages 2-6: input 128 + 38 + 19 = 185
    for st in range(2, 7):
        for br, out in (("1", 38), ("2", 19)):
            layers = [(f"Mconv1_stage{st}_L{br}", 128, 185, 7)]
            layers += [
                (f"Mconv{i}_stage{st}_L{br}", 128, 128, 7) for i in range(2, 6)
            ]
            layers += [
                (f"Mconv6_stage{st}_L{br}", 128, 128, 1),
                (f"Mconv7_stage{st}_L{br}", out, 128, 1),
            ]
            _conv_flat(d, layers)
    write_manifest("openpose_body", d)


def _gen_openpose_refine(name: str, n_out: int) -> None:
    """Shared hand/face manifest shape: stem + 1x1 stage-1 head + 5
    refinement stages on cat([out, feat])."""
    d: dict = {}
    _conv_flat(d, _VGG_CPM_STEM)
    _conv_flat(d, [
        ("conv6_1_CPM", 512, 128, 1), ("conv6_2_CPM", n_out, 512, 1),
    ])
    for st in range(2, 7):
        layers = [(f"Mconv1_stage{st}", 128, 128 + n_out, 7)]
        layers += [(f"Mconv{i}_stage{st}", 128, 128, 7) for i in range(2, 6)]
        layers += [
            (f"Mconv6_stage{st}", 128, 128, 1),
            (f"Mconv7_stage{st}", n_out, 128, 1),
        ]
        _conv_flat(d, layers)
    write_manifest(name, d)


def gen_openpose_hand() -> None:
    _gen_openpose_refine("openpose_hand", 22)


def gen_openpose_face() -> None:
    _gen_openpose_refine("openpose_face", 71)


ALL = {
    "sd15_unet": gen_sd15_unet,
    "sd15_vae": gen_sd15_vae,
    "controlnet_openpose": gen_controlnet_openpose,
    "sd15_clip_text": gen_clip_text,
    "openpose_body": gen_openpose_body,
    "openpose_hand": gen_openpose_hand,
    "openpose_face": gen_openpose_face,
    "sam_vit_h": gen_sam,
    "gdino_swint": gen_gdino,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for n in names:
        ALL[n]()
