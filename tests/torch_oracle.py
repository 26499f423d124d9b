"""Self-contained torch golden oracle for the inflated video UNet.

A from-scratch torch reimplementation of the reference model *semantics*
(unet_2d_condition.py:363-546, resnet_2d.py:128-249, attention_2d.py:392-547,
controlnet_adapter.py:437-565, fully_control.py:372-460,
temporal_control.py:70-88) at tiny scale, with diffusers-compatible parameter
names so ``models/weights.port_unet`` ports this oracle's ``state_dict()``
directly into the JAX pytree. tests/test_full_oracle.py loads the SAME
weights both ways and asserts fp32 end-to-end forward parity — the
whole-graph check (row conventions, GN framing, residual plumbing,
injection gating) that per-layer oracles can't see.

Layout follows the reference: video tensors are [B, C, F, H, W]; tokens are
[B, F, N, C]. Everything runs fp32 on CPU. No diffusers dependency.

NOTE: modules the reference zero-initializes (temporal convs, attn_temp out
projections) are RANDOM-initialized here so the parity test exercises the
temporal paths with non-trivial values.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Set, Tuple

import torch
import torch.nn.functional as F
from torch import nn


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


class InflatedConv3d(nn.Conv2d):
    """2D conv applied per frame (resnet_2d.py:28-36)."""

    def forward(self, video):  # [B, C, F, H, W]
        b, c, f, h, w = video.shape
        x = video.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
        y = super().forward(x)
        return y.reshape(b, f, *y.shape[1:]).permute(0, 2, 1, 3, 4)


class TemporalConv(nn.Conv1d):
    """Conv1d over the frame axis at each pixel (resnet_2d.py:10-26)."""

    def forward(self, video):  # [B, C, F, H, W]
        b, c, f, h, w = video.shape
        x = video.permute(0, 3, 4, 1, 2).reshape(b * h * w, c, f)
        y = super().forward(x)
        return y.reshape(b, h, w, y.shape[1], f).permute(0, 3, 4, 1, 2)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    """diffusers FeedForward naming: net.0.proj / net.2."""

    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList([GEGLU(dim, inner), nn.Identity(), nn.Linear(inner, dim)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


def _sdpa(q, k, v, heads: int, bias: Optional[torch.Tensor] = None):
    """[..., N, H*D] fp32 softmax attention (attention_2d.py:172-201)."""
    *lead, n, inner = q.shape
    d = inner // heads
    scale = d ** -0.5

    def split(x):
        return x.reshape(*x.shape[:-1], heads, d).movedim(-2, -3)

    qh, kh, vh = split(q), split(k), split(v)
    scores = (qh @ kh.transpose(-1, -2)).float() * scale
    if bias is not None:
        scores = scores + bias
    probs = scores.softmax(dim=-1).to(vh.dtype)
    out = probs @ vh
    return out.movedim(-3, -2).reshape(*lead, n, inner)


class Attention(nn.Module):
    """to_q/k/v bias-free, to_out with bias (attention_2d.py:83-93)."""

    def __init__(self, query_dim, cross_dim=None, heads=8):
        super().__init__()
        cross_dim = cross_dim or query_dim
        self.heads = heads
        self.to_q = nn.Linear(query_dim, query_dim, bias=False)
        self.to_k = nn.Linear(cross_dim, query_dim, bias=False)
        self.to_v = nn.Linear(cross_dim, query_dim, bias=False)
        self.to_out = nn.Linear(query_dim, query_dim)


def _former_idx(f: int) -> torch.Tensor:
    idx = torch.arange(f) - 1
    idx[0] = 0
    return idx


def motion_frame_kv(x):  # [B, F, N, C] -> [B, F, 2N, C] ([prev, cur])
    return torch.cat([x[:, _former_idx(x.shape[1])], x], dim=2)


def sparse_causal_kv(x):  # [B, F, N, C] -> [B, F, 2N, C] ([frame0, prev])
    b, f, n, c = x.shape
    first = x[:, :1].expand(b, f, n, c)
    return torch.cat([first, x[:, _former_idx(f)]], dim=2)


def spatial_self_attention(attn: Attention, x, mode: str):
    """x: [B, F, N, C]; per-frame queries, K/V chosen by mode."""
    q = attn.to_q(x)
    k = attn.to_k(x)
    v = attn.to_v(x)
    if mode == "motion_frame":
        k, v = motion_frame_kv(k), motion_frame_kv(v)
    elif mode == "sparse_causal":
        k, v = sparse_causal_kv(k), sparse_causal_kv(v)
    elif mode != "normal":
        raise ValueError(mode)
    return attn.to_out(_sdpa(q, k, v, attn.heads))


def injected_spatial_attention(attn: Attention, x, mask_n: torch.Tensor):
    """FullySelfAttentionControlMask (fully_control.py:372-460).

    x: [4, F, N, C] rows [recon_u, edit_u, recon_c, edit_c]. Source rows do
    plain motion-frame attention; target rows attend
    K = [K_src*m, K_src*(1-m), K_tgt_cur], V = [V_src, V_src, V_tgt_cur]
    with m the [prev, cur]-expanded foreground mask ([F, N, 1])."""
    q = attn.to_q(x)
    k = attn.to_k(x)
    v = attn.to_v(x)
    k_mf, v_mf = motion_frame_kv(k), motion_frame_kv(v)
    src, tgt = [0, 2], [1, 3]
    out_src = _sdpa(q[src], k_mf[src], v_mf[src], attn.heads)
    m = torch.cat([mask_n[_former_idx(x.shape[1])], mask_n], dim=1)  # [F, 2N, 1]
    k_inj = torch.cat([k_mf[src] * m, k_mf[src] * (1 - m), k[tgt]], dim=2)
    v_inj = torch.cat([v_mf[src], v_mf[src], v[tgt]], dim=2)
    out_tgt = _sdpa(q[tgt], k_inj, v_inj, attn.heads)
    return attn.to_out(
        torch.stack([out_src[0], out_tgt[0], out_src[1], out_tgt[1]], dim=0)
    )


def cross_attention(attn: Attention, x, enc):
    """x: [B, F, N, C]; enc: [B, L, D] repeated per frame (attention_2d.py:343)."""
    b, f, n, c = x.shape
    q = attn.to_q(x)
    k = attn.to_k(enc)[:, None].expand(b, f, *enc.shape[1:-1], q.shape[-1])
    v = attn.to_v(enc)[:, None].expand_as(k)
    return attn.to_out(_sdpa(q, k, v, attn.heads))


def temporal_self_attention(attn: Attention, x, kv=None, causal=True):
    """Attention over frames at each token. x: [B, F, N, C]."""
    b, f, n, c = x.shape
    xt = x.permute(0, 2, 1, 3)  # [B, N, F, C]
    kvt = xt if kv is None else kv.permute(0, 2, 1, 3)
    q = attn.to_q(xt)
    k = attn.to_k(kvt)
    v = attn.to_v(kvt)
    bias = None
    if causal:
        bias = (1.0 - torch.tril(torch.ones(f, f))) * -1e4  # attention_2d.py:542-543
    out = attn.to_out(_sdpa(q, k, v, attn.heads, bias=bias))
    return out.permute(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# transformer / resnet blocks
# ---------------------------------------------------------------------------


class BasicTransformerBlock(nn.Module):
    """attn1 -> attn2 -> ff -> temporal (attention_2d.py:493-547)."""

    def __init__(self, dim, cross_dim, heads, video=True):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads=heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, cross_dim=cross_dim, heads=heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)
        if video:
            self.norm_temp = nn.LayerNorm(dim)
            self.attn_temp = Attention(dim, heads=heads)

    def forward(self, tokens, enc, attn1_mode, inject_spatial, inject_temporal, mask_n):
        h = self.norm1(tokens)
        if inject_spatial:
            tokens = tokens + injected_spatial_attention(self.attn1, h, mask_n)
        else:
            tokens = tokens + spatial_self_attention(self.attn1, h, attn1_mode)
        tokens = tokens + cross_attention(self.attn2, self.norm2(tokens), enc)
        tokens = tokens + self.ff(self.norm3(tokens))
        if hasattr(self, "attn_temp"):
            ht = self.norm_temp(tokens)
            kv = ht[[0, 0, 2, 2]] if inject_temporal else None  # temporal_control.py:82-86
            tokens = tokens + temporal_self_attention(self.attn_temp, ht, kv=kv, causal=True)
        return tokens


class Transformer2D(nn.Module):
    """Per-frame GN -> 1x1 conv -> block -> 1x1 conv + residual
    (attention_2d.py:338-389: rearranged to (b f) BEFORE the norm, so the
    transformer GN is per-frame, unlike the resnet GN)."""

    def __init__(self, channels, cross_dim, heads, groups, video=True):
        super().__init__()
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Conv2d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(channels, cross_dim, heads, video=video)]
        )
        self.proj_out = nn.Conv2d(channels, channels, 1)

    def forward(self, video, enc, **kw):  # video: [B, C, F, H, W]
        b, c, f, h, w = video.shape
        residual = video
        x = video.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
        x = self.proj_in(self.norm(x))
        tokens = x.reshape(b, f, c, h * w).permute(0, 1, 3, 2)  # [B, F, N, C]
        for blk in self.transformer_blocks:
            tokens = blk(tokens, enc, **kw)
        x = tokens.permute(0, 1, 3, 2).reshape(b * f, c, h, w)
        x = self.proj_out(x)
        return x.reshape(b, f, c, h, w).permute(0, 2, 1, 3, 4) + residual


class ResnetBlock(nn.Module):
    """Video resnet with ACROSS-FRAME GroupNorm (torch GN applied to the 5D
    tensor, resnet_2d.py:160/176) and residual temporal convs."""

    def __init__(self, in_ch, out_ch, temb_ch, groups, video=True):
        super().__init__()
        self.video = video
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-5)
        self.conv1 = InflatedConv3d(in_ch, out_ch, 3, padding=1)
        if video:
            self.temp_conv1 = TemporalConv(out_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-5)
        self.conv2 = InflatedConv3d(out_ch, out_ch, 3, padding=1)
        if video:
            self.temp_conv2 = TemporalConv(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            InflatedConv3d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def _gn(self, norm, x):
        if self.video:
            return norm(x)  # across-frame 5D GN (resnet_2d.py:160/176)
        # 2D per-frame GN: diffusers runs the ControlNet on a (b f) batch
        b, c, f, h, w = x.shape
        y = norm(x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w))
        return y.reshape(b, f, c, h, w).permute(0, 2, 1, 3, 4)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self._gn(self.norm1, x)))
        if self.video:
            h = h + self.temp_conv1(h)
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None, None]
        h = self.conv2(F.silu(self._gn(self.norm2, h)))
        if self.video:
            h = h + self.temp_conv2(h)
        skip = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return skip + h


class Downsampler(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = InflatedConv3d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsampler(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = InflatedConv3d(ch, ch, 3, padding=1)

    def forward(self, x):  # nearest [1, 2, 2] (resnet_2d.py:77)
        x = F.interpolate(x, scale_factor=(1.0, 2.0, 2.0), mode="nearest")
        return self.conv(x)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, t_emb):
        return self.linear_2(F.silu(self.linear_1(t_emb)))


def sinusoidal_embedding(timesteps, dim):
    """diffusers get_timestep_embedding, SD config (flip_sin_to_cos=True)."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
    )
    emb = timesteps.double()[:, None] * freqs[None]
    return torch.cat([emb.cos(), emb.sin()], dim=-1).float()


# ---------------------------------------------------------------------------
# ControlAdapter (controlnet_adapter.py:437-565)
# ---------------------------------------------------------------------------


class AdapterBlock(nn.Module):
    def __init__(self, ch, heads=8):
        super().__init__()
        self.block1 = nn.Conv1d(ch, ch, 3, padding=1)
        self.block2 = nn.Conv1d(ch, ch, 1)
        self.norm_temp = nn.LayerNorm(ch)
        self.attn_temp = Attention(ch, cross_dim=ch, heads=heads)
        self.cross_pose_norm = nn.LayerNorm(ch)
        self.attn_pose = Attention(ch, cross_dim=ch, heads=heads)
        self.ff_norm = nn.LayerNorm(ch)
        self.ff = FeedForward(ch)
        self.norm_self_temp = nn.LayerNorm(ch)
        self.attn_self_temp = Attention(ch, heads=heads)

    def forward(self, x, source):  # [B, C, F, H, W] each
        b, c, f, h, w = x.shape

        def tconv(m, v):
            y = m(v.permute(0, 3, 4, 1, 2).reshape(b * h * w, c, f))
            return y.reshape(b, h, w, c, f).permute(0, 3, 4, 1, 2)

        conv = tconv(self.block2, F.relu(tconv(self.block1, x))) + x

        tokens = x.permute(0, 2, 3, 4, 1).reshape(b, f, h * w, c)
        src_tokens = source.permute(0, 2, 3, 4, 1).reshape(b, f, h * w, c)
        tokens = tokens + spatial_self_attention(
            self.attn_temp, self.norm_temp(tokens), "sparse_causal"
        )
        # per-frame cross-attn to the source UNet features (:516-519)
        n = self.cross_pose_norm(tokens)
        q = self.attn_pose.to_q(n)
        k = self.attn_pose.to_k(src_tokens)
        v = self.attn_pose.to_v(src_tokens)
        tokens = tokens + self.attn_pose.to_out(_sdpa(q, k, v, self.attn_pose.heads))
        tokens = tokens + self.ff(self.ff_norm(tokens))
        tokens = tokens + temporal_self_attention(
            self.attn_self_temp, self.norm_self_temp(tokens), causal=True
        )
        attn = tokens.reshape(b, f, h, w, c).permute(0, 4, 1, 2, 3)
        return attn + conv


class ControlAdapter(nn.Module):
    def __init__(self, channels: Sequence[int]):
        super().__init__()
        chmap = [channels[0]] * 4 + [channels[1]] * 3 + [channels[2]] * 3 + [channels[3]] * 2
        self.body = nn.ModuleList([AdapterBlock(ch) for ch in chmap])

    def forward(self, x_list, source_list):
        return [blk(x, s) for blk, x, s in zip(self.body, x_list, source_list)]


# ---------------------------------------------------------------------------
# full UNet
# ---------------------------------------------------------------------------


class OracleUNet(nn.Module):
    """Tiny inflated video UNet mirroring unet_2d_condition.py:363-546."""

    def __init__(
        self,
        in_channels=4,
        out_channels=4,
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=2,
        cross_dim=16,
        heads=4,
        groups=8,
    ):
        super().__init__()
        c = block_out_channels
        time_dim = c[0] * 4
        self.block_out_channels = c
        self.conv_in = InflatedConv3d(in_channels, c[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(c[0], time_dim)

        self.down_blocks = nn.ModuleList()
        out_ch = c[0]
        for i in range(4):
            in_ch, out_ch = out_ch, c[i]
            block = nn.Module()
            block.resnets = nn.ModuleList(
                [
                    ResnetBlock(in_ch if j == 0 else out_ch, out_ch, time_dim, groups)
                    for j in range(layers_per_block)
                ]
            )
            if i < 3:  # CrossAttnDownBlock2D
                block.attentions = nn.ModuleList(
                    [Transformer2D(out_ch, cross_dim, heads, groups) for _ in range(layers_per_block)]
                )
            if i < 3:
                block.downsamplers = nn.ModuleList([Downsampler(out_ch)])
            self.down_blocks.append(block)

        mid_ch = c[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock(mid_ch, mid_ch, time_dim, groups) for _ in range(2)]
        )
        self.mid_block.attentions = nn.ModuleList(
            [Transformer2D(mid_ch, cross_dim, heads, groups)]
        )

        rev = list(reversed(c))
        self.up_blocks = nn.ModuleList()
        out_ch = rev[0]
        for i in range(4):
            prev_out, out_ch = out_ch, rev[i]
            in_ch = rev[min(i + 1, 3)]
            block = nn.Module()
            block.resnets = nn.ModuleList(
                [
                    ResnetBlock(
                        (prev_out if j == 0 else out_ch)
                        + (in_ch if j == layers_per_block else out_ch),
                        out_ch,
                        time_dim,
                        groups,
                    )
                    for j in range(layers_per_block + 1)
                ]
            )
            if i > 0:  # CrossAttnUpBlock2D
                block.attentions = nn.ModuleList(
                    [Transformer2D(out_ch, cross_dim, heads, groups) for _ in range(layers_per_block + 1)]
                )
            if i < 3:
                block.upsamplers = nn.ModuleList([Upsampler(out_ch)])
            self.up_blocks.append(block)

        self.conv_norm_out = nn.GroupNorm(groups, c[0], eps=1e-5)
        self.conv_out = InflatedConv3d(c[0], out_channels, 3, padding=1)
        self.controlnet_adapter = ControlAdapter(c)

    def forward(
        self,
        sample,  # [B, C, F, H, W]
        timesteps,  # [B] or scalar tensor
        enc,  # [B, L, D]
        down_block_additional_residuals: Optional[List[torch.Tensor]] = None,
        mid_block_additional_residual: Optional[torch.Tensor] = None,
        normal_infer: bool = False,
        inject_spatial_layers: Optional[Set[int]] = None,
        inject_temporal_layers: Optional[Set[int]] = None,
        injection_masks: Optional[Dict[Tuple[int, int], torch.Tensor]] = None,
    ):
        b = sample.shape[0]
        if timesteps.dim() == 0:
            timesteps = timesteps.expand(b)
        temb = self.time_embedding(
            sinusoidal_embedding(timesteps, self.block_out_channels[0])
        )

        attn1_mode = "normal" if normal_infer else "motion_frame"
        inj_s = inject_spatial_layers or set()
        inj_t = inject_temporal_layers or set()

        def attn_kwargs(layer_idx, hw):
            mask_n = None
            if injection_masks is not None:
                mask_n = injection_masks.get(hw)
            return dict(
                attn1_mode=attn1_mode,
                inject_spatial=layer_idx in inj_s and mask_n is not None,
                inject_temporal=layer_idx in inj_t,
                mask_n=mask_n,
            )

        h = self.conv_in(sample)
        res_samples = [h]
        layer_idx = 0

        for i, block in enumerate(self.down_blocks):
            for j, rn in enumerate(block.resnets):
                h = rn(h, temb)
                if hasattr(block, "attentions"):
                    hw = (h.shape[-2], h.shape[-1])
                    h = block.attentions[j](h, enc, **attn_kwargs(layer_idx, hw))
                    layer_idx += 1
                res_samples.append(h)
            if hasattr(block, "downsamplers"):
                h = block.downsamplers[0](h)
                res_samples.append(h)

        # content-aware adapter branch (unet_2d_condition.py:477-494)
        if down_block_additional_residuals is not None:
            residuals = list(down_block_additional_residuals)
            if (
                mid_block_additional_residual is not None
                and mid_block_additional_residual.shape[0] == 4
            ):
                source_hidden = [s[[1, 3]] for s in res_samples]
                motion = self.controlnet_adapter(residuals, source_hidden)
                residuals = [
                    torch.cat(
                        [torch.zeros_like(m[:1]), m[:1], torch.zeros_like(m[:1]), m[1:2]],
                        dim=0,
                    )
                    for m in motion
                ]
            else:
                residuals = self.controlnet_adapter(residuals, res_samples)
            res_samples = [r + d for r, d in zip(res_samples, residuals)]

        h = self.mid_block.resnets[0](h, temb)
        hw = (h.shape[-2], h.shape[-1])
        h = self.mid_block.attentions[0](h, enc, **attn_kwargs(layer_idx, hw))
        layer_idx += 1
        h = self.mid_block.resnets[1](h, temb)

        if mid_block_additional_residual is not None:
            h = h + mid_block_additional_residual

        for i, block in enumerate(self.up_blocks):
            n_res = len(block.resnets)
            skips = res_samples[-n_res:]
            res_samples = res_samples[:-n_res]
            for j, rn in enumerate(block.resnets):
                h = torch.cat([h, skips[-(j + 1)]], dim=1)
                h = rn(h, temb)
                if hasattr(block, "attentions"):
                    hw = (h.shape[-2], h.shape[-1])
                    h = block.attentions[j](h, enc, **attn_kwargs(layer_idx, hw))
                    layer_idx += 1
            if hasattr(block, "upsamplers"):
                h = block.upsamplers[0](h)

        h = self.conv_norm_out(h)  # across-frame 5D GN (unet_2d_condition.py:539)
        h = F.silu(h)
        return self.conv_out(h)


# ---------------------------------------------------------------------------
# ControlNet oracle (diffusers ControlNetModel as used at
# pipeline_motion_editor.py:613-625: per-frame 2D SD encoder + zero-conv
# heads + conditioning-embedding CNN; diffusers-compatible names so
# models/weights.port_controlnet ports state_dict() directly)
# ---------------------------------------------------------------------------


class CondEmbedding(nn.Module):
    """ControlNetConditioningEmbedding: conv stem downsampling the skeleton
    image 8x to the latent resolution."""

    def __init__(self, out_ch, channels=(16, 32, 96, 256)):
        super().__init__()
        self.conv_in = nn.Conv2d(3, channels[0], 3, padding=1)
        blocks = []
        for i in range(len(channels) - 1):
            blocks.append(nn.Conv2d(channels[i], channels[i], 3, padding=1))
            blocks.append(nn.Conv2d(channels[i], channels[i + 1], 3, padding=1, stride=2))
        self.blocks = nn.ModuleList(blocks)
        self.conv_out = nn.Conv2d(channels[-1], out_ch, 3, padding=1)

    def forward(self, image):  # [N, 3, H, W] in [0,1]
        x = F.silu(self.conv_in(image))
        for blk in self.blocks:
            x = F.silu(blk(x))
        return self.conv_out(x)


class OracleControlNet(nn.Module):
    """Tiny 2D per-frame ControlNet mirroring models/controlnet.py's port
    target. NOTE: the zero-initialized modules (zero convs, cond embedding
    conv_out) are RANDOM-initialized so parity exercises live residuals."""

    def __init__(
        self,
        in_channels=4,
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=2,
        cross_dim=16,
        heads=4,
        groups=8,
        cond_channels=(8, 8, 16, 16),  # tiny stand-in for (16, 32, 96, 256)
    ):
        super().__init__()
        c = block_out_channels
        time_dim = c[0] * 4
        self.block_out_channels = c
        self.conv_in = InflatedConv3d(in_channels, c[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(c[0], time_dim)
        self.controlnet_cond_embedding = CondEmbedding(c[0], cond_channels)

        self.down_blocks = nn.ModuleList()
        zero_convs = [nn.Conv2d(c[0], c[0], 1)]
        out_ch = c[0]
        for i in range(4):
            in_ch, out_ch = out_ch, c[i]
            block = nn.Module()
            block.resnets = nn.ModuleList(
                [
                    ResnetBlock(
                        in_ch if j == 0 else out_ch, out_ch, time_dim, groups,
                        video=False,
                    )
                    for j in range(layers_per_block)
                ]
            )
            for _ in range(layers_per_block):
                zero_convs.append(nn.Conv2d(out_ch, out_ch, 1))
            if i < 3:
                block.attentions = nn.ModuleList(
                    [
                        Transformer2D(out_ch, cross_dim, heads, groups, video=False)
                        for _ in range(layers_per_block)
                    ]
                )
                block.downsamplers = nn.ModuleList([Downsampler(out_ch)])
                zero_convs.append(nn.Conv2d(out_ch, out_ch, 1))
            self.down_blocks.append(block)

        mid_ch = c[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock(mid_ch, mid_ch, time_dim, groups, video=False) for _ in range(2)]
        )
        self.mid_block.attentions = nn.ModuleList(
            [Transformer2D(mid_ch, cross_dim, heads, groups, video=False)]
        )
        self.controlnet_down_blocks = nn.ModuleList(zero_convs)
        self.controlnet_mid_block = nn.Conv2d(mid_ch, mid_ch, 1)

    def _per_frame(self, conv, x):  # apply a 2D conv to [B, C, F, H, W]
        b, c, f, h, w = x.shape
        y = conv(x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w))
        return y.reshape(b, f, *y.shape[1:]).permute(0, 2, 1, 3, 4)

    def forward(self, sample, timesteps, enc, cond_image, conditioning_scale=1.0):
        """sample: [B, 4, F, h, w]; cond_image: [B, 3, F, 8h, 8w] in [0,1].
        Returns (12 down residuals, mid residual) as [B, C, F, ., .]."""
        b = sample.shape[0]
        if timesteps.dim() == 0:
            timesteps = timesteps.expand(b)
        temb = self.time_embedding(
            sinusoidal_embedding(timesteps, self.block_out_channels[0])
        )
        kw = dict(
            attn1_mode="normal", inject_spatial=False, inject_temporal=False,
            mask_n=None,
        )

        h = self.conv_in(sample)
        h = h + self._per_frame(self.controlnet_cond_embedding, cond_image)
        res_samples = [h]
        for block in self.down_blocks:
            for j, rn in enumerate(block.resnets):
                h = rn(h, temb)
                if hasattr(block, "attentions"):
                    h = block.attentions[j](h, enc, **kw)
                res_samples.append(h)
            if hasattr(block, "downsamplers"):
                h = block.downsamplers[0](h)
                res_samples.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, enc, **kw)
        h = self.mid_block.resnets[1](h, temb)

        down = [
            self._per_frame(zc, r) * conditioning_scale
            for zc, r in zip(self.controlnet_down_blocks, res_samples)
        ]
        mid = self._per_frame(self.controlnet_mid_block, h) * conditioning_scale
        return down, mid
