"""MiDaS DPT-Hybrid port tests (models/midas.py).

Oracle: a self-contained torch mirror of isl-org/MiDaS
``DPTDepthModel(backbone="vitb_rn50_384")`` — the model controlnet_aux's
MidasDetector wraps for the reference's ``depth`` condition
(data_preparation/video_skeletons.py:13-21). The mirror's state_dict uses
the dpt_hybrid checkpoint key layout (``pretrained.model.*`` /
``scratch.*``), so parity runs through ``convert_dpt_state_dict`` — the
same path a real ``dpt_hybrid-midas-501f0c75.pt`` would take. The
bilinear-resize primitives are additionally checked against torch's real
``F.interpolate`` in both align_corners modes (that part of the oracle is
not a mirror).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from motioneditor_tpu.models.midas import (
    RESNET_LAYERS,
    RESNET_STRIDES,
    RESNET_WIDTHS,
    STEM_CH,
    VIT_DEPTH,
    VIT_DIM,
    VIT_HEADS,
    VIT_MLP,
    convert_dpt_state_dict,
    dpt_forward,
    estimate_depth,
    init_dpt_params,
    resize_bilinear,
)

pytestmark = pytest.mark.slow  # full hybrid backbone compiles (see pytest.ini)

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torch mirror (timm vit_base_resnet50_384 hybrid + MiDaS DPT decoder)
# ---------------------------------------------------------------------------


def _pad_same(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class StdConv2dSame(nn.Conv2d):
    """timm StdConv2dSame: TF-'same' pad + per-filter weight standardization."""

    def forward(self, x):
        w = self.weight
        v, m = torch.var_mean(w, dim=[1, 2, 3], keepdim=True, unbiased=False)
        w = (w - m) / torch.sqrt(v + 1e-6)
        x = _pad_same(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, w, self.bias, self.stride, 0)


class MaxPoolSame(nn.Module):
    def forward(self, x):
        x = F.pad(x, (0, 1, 0, 1), value=float("-inf"))  # k3 s2 on even sizes
        return F.max_pool2d(x, 3, 2, 0)


class GNRelu(nn.Module):
    def __init__(self, c, act=True):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.act = act

    def forward(self, x):
        x = F.group_norm(x, 32, self.weight, self.bias, eps=1e-5)
        return F.relu(x) if self.act else x


class Downsample(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv = StdConv2dSame(cin, cout, 1, stride, bias=False)
        self.norm = GNRelu(cout, act=False)

    def forward(self, x):
        return self.norm(self.conv(x))


class Bottleneck(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        mid = cout // 4
        if stride != 1 or cin != cout:
            self.downsample = Downsample(cin, cout, stride)
        self.conv1 = StdConv2dSame(cin, mid, 1, bias=False)
        self.norm1 = GNRelu(mid)
        self.conv2 = StdConv2dSame(mid, mid, 3, stride, bias=False)
        self.norm2 = GNRelu(mid)
        self.conv3 = StdConv2dSame(mid, cout, 1, bias=False)
        self.norm3 = GNRelu(cout, act=False)

    def forward(self, x):
        sc = self.downsample(x) if hasattr(self, "downsample") else x
        h = self.norm1(self.conv1(x))
        h = self.norm2(self.conv2(h))
        h = self.norm3(self.conv3(h))
        return F.relu(h + sc)


class Stage(nn.Module):
    def __init__(self, cin, cout, n, stride):
        super().__init__()
        self.blocks = nn.ModuleList(
            [Bottleneck(cin if i == 0 else cout, cout, stride if i == 0 else 1) for i in range(n)]
        )

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return x


class Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = StdConv2dSame(3, STEM_CH, 7, 2, bias=False)
        self.norm = GNRelu(STEM_CH)
        self.pool = MaxPoolSame()

    def forward(self, x):
        return self.pool(self.norm(self.conv(x)))


class Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = Stem()
        cin = STEM_CH
        stages = []
        for s, n in enumerate(RESNET_LAYERS):
            stages.append(Stage(cin, RESNET_WIDTHS[s], n, RESNET_STRIDES[s]))
            cin = RESNET_WIDTHS[s]
        self.stages = nn.ModuleList(stages)

    def forward(self, x):
        x = self.stem(x)
        feats = []
        for s in self.stages:
            x = s(x)
            feats.append(x)
        return feats


class Attention(nn.Module):
    def __init__(self):
        super().__init__()
        self.qkv = nn.Linear(VIT_DIM, 3 * VIT_DIM)
        self.proj = nn.Linear(VIT_DIM, VIT_DIM)

    def forward(self, x):
        b, n, c = x.shape
        hd = c // VIT_HEADS
        qkv = self.qkv(x).reshape(b, n, 3, VIT_HEADS, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * hd**-0.5
        att = att.softmax(dim=-1)
        return self.proj((att @ v).transpose(1, 2).reshape(b, n, c))


class Mlp(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = nn.Linear(VIT_DIM, VIT_MLP)
        self.fc2 = nn.Linear(VIT_MLP, VIT_DIM)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(VIT_DIM, eps=1e-6)
        self.attn = Attention()
        self.norm2 = nn.LayerNorm(VIT_DIM, eps=1e-6)
        self.mlp = Mlp()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class PatchEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = Backbone()
        self.proj = nn.Conv2d(RESNET_WIDTHS[-1], VIT_DIM, 1)


class VitHybrid(nn.Module):
    def __init__(self):
        super().__init__()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, VIT_DIM))
        self.pos_embed = nn.Parameter(torch.randn(1, 577, VIT_DIM) * 0.02)
        self.patch_embed = PatchEmbed()
        self.blocks = nn.ModuleList([Block() for _ in range(VIT_DEPTH)])

    def _resize_pos_embed(self, gh, gw):
        n = self.pos_embed.shape[1] - 1
        gs = int(round(math.sqrt(n)))
        if (gh, gw) == (gs, gs):
            return self.pos_embed
        grid = self.pos_embed[:, 1:].reshape(1, gs, gs, VIT_DIM).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, size=(gh, gw), mode="bilinear", align_corners=False)
        grid = grid.permute(0, 2, 3, 1).reshape(1, gh * gw, VIT_DIM)
        return torch.cat([self.pos_embed[:, :1], grid], dim=1)

    def forward(self, x):
        r1, r2, r3 = self.patch_embed.backbone(x)
        b = x.shape[0]
        gh, gw = r3.shape[-2:]
        t = self.patch_embed.proj(r3).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], dim=1)
        t = t + self._resize_pos_embed(gh, gw)
        hooks = {}
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in (8, 11):
                hooks[i] = t
        return r1, r2, hooks[8], hooks[11], (gh, gw)


class ProjectReadout(nn.Module):
    def __init__(self):
        super().__init__()
        self.project = nn.Sequential(nn.Linear(2 * VIT_DIM, VIT_DIM), nn.GELU())

    def forward(self, t):
        cls = t[:, :1].expand_as(t[:, 1:])
        return self.project(torch.cat([t[:, 1:], cls], dim=-1))


class Rcu(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(256, 256, 3, padding=1)
        self.conv2 = nn.Conv2d(256, 256, 3, padding=1)

    def forward(self, x):
        h = self.conv1(F.relu(x))
        h = self.conv2(F.relu(h))
        return h + x


class FeatureFusion(nn.Module):
    def __init__(self):
        super().__init__()
        self.out_conv = nn.Conv2d(256, 256, 1)
        self.resConfUnit1 = Rcu()
        self.resConfUnit2 = Rcu()

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return self.out_conv(x)


class Scratch(nn.Module):
    def __init__(self):
        super().__init__()
        self.layer1_rn = nn.Conv2d(256, 256, 3, padding=1, bias=False)
        self.layer2_rn = nn.Conv2d(512, 256, 3, padding=1, bias=False)
        self.layer3_rn = nn.Conv2d(VIT_DIM, 256, 3, padding=1, bias=False)
        self.layer4_rn = nn.Conv2d(VIT_DIM, 256, 3, padding=1, bias=False)
        self.refinenet1 = FeatureFusion()
        self.refinenet2 = FeatureFusion()
        self.refinenet3 = FeatureFusion()
        self.refinenet4 = FeatureFusion()
        self.output_conv = nn.Sequential(
            nn.Conv2d(256, 128, 3, padding=1),
            nn.Identity(),  # Interpolate(scale 2) — applied in forward
            nn.Conv2d(128, 32, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(),
            nn.Identity(),
        )


class Pretrained(nn.Module):
    def __init__(self):
        super().__init__()
        self.model = VitHybrid()
        self.act_postprocess3 = nn.Sequential(
            ProjectReadout(), nn.Identity(), nn.Identity(), nn.Conv2d(VIT_DIM, VIT_DIM, 1)
        )
        self.act_postprocess4 = nn.Sequential(
            ProjectReadout(), nn.Identity(), nn.Identity(), nn.Conv2d(VIT_DIM, VIT_DIM, 1),
            nn.Conv2d(VIT_DIM, VIT_DIM, 3, stride=2, padding=1),
        )


class TorchDPT(nn.Module):
    def __init__(self):
        super().__init__()
        self.pretrained = Pretrained()
        self.scratch = Scratch()

    def forward(self, x):
        r1, r2, t8, t11, (gh, gw) = self.pretrained.model(x)

        def to_grid(t):  # readout tokens [B, N, C] -> [B, C, gh, gw]
            return t.transpose(1, 2).reshape(x.shape[0], VIT_DIM, gh, gw)

        l3 = self.pretrained.act_postprocess3[3](to_grid(self.pretrained.act_postprocess3[0](t8)))
        l4 = self.pretrained.act_postprocess4[3](to_grid(self.pretrained.act_postprocess4[0](t11)))
        l4 = self.pretrained.act_postprocess4[4](l4)

        sc = self.scratch
        l1_rn, l2_rn = sc.layer1_rn(r1), sc.layer2_rn(r2)
        l3_rn, l4_rn = sc.layer3_rn(l3), sc.layer4_rn(l4)
        p4 = sc.refinenet4(l4_rn)
        p3 = sc.refinenet3(p4, l3_rn)
        p2 = sc.refinenet2(p3, l2_rn)
        p1 = sc.refinenet1(p2, l1_rn)
        h = sc.output_conv[0](p1)
        h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)
        h = F.relu(sc.output_conv[2](h))
        h = F.relu(sc.output_conv[4](h))
        return h[:, 0]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("align", [True, False])
def test_resize_bilinear_matches_torch(align):
    x = np.random.RandomState(0).randn(2, 7, 9, 5).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), 13, 4, align_corners=align))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(13, 4),
        mode="bilinear", align_corners=align,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def _numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_dpt_forward_matches_torch_mirror():
    """Full DPT-Hybrid forward parity through convert_dpt_state_dict.

    128x128 input -> 8x8 patch grid, exercising the pos-embed resize path
    (the stored embedding is the 24x24 / 577-token 384px grid)."""
    model = TorchDPT().eval()
    # break the default-init symmetry a bit so parity is meaningful
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.02 * torch.randn_like(p))
    sd = _numpy_sd(model)
    # mirror sanity: the state_dict must use the real checkpoint key layout
    for key in (
        "pretrained.model.patch_embed.backbone.stem.conv.weight",
        "pretrained.model.patch_embed.backbone.stages.1.blocks.0.downsample.conv.weight",
        "pretrained.model.blocks.11.attn.qkv.weight",
        "pretrained.act_postprocess4.0.project.0.weight",
        "scratch.refinenet2.resConfUnit1.conv1.weight",
        "scratch.output_conv.4.weight",
    ):
        assert key in sd, key
    params = convert_dpt_state_dict(sd)

    x = np.random.RandomState(1).randn(1, 128, 128, 3).astype(np.float32) * 0.5
    with torch.no_grad():
        want = model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(dpt_forward(params, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 128, 128)
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=1e-3)


def test_estimate_depth_detector_chain():
    """MidasDetector semantics: uint8 RGB in -> uint8 3-channel depth out at
    the original resolution; values span the full range after min-max."""
    params = init_dpt_params(jax.random.PRNGKey(0))
    img = np.random.RandomState(2).randint(0, 255, (100, 140, 3), np.uint8)
    out = estimate_depth(params, img)
    assert out.shape == (100, 140, 3)
    assert out.dtype == np.uint8
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 0] == out[..., 2]).all()
