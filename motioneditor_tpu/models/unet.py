"""Video-inflated SD-1.5 UNet with ControlNet-residual and motion-adapter
plumbing, as pure functions over explicit param pytrees.

Port map (reference /root/reference):
  UNet2DConditionModel            motion_editor/models/unet_2d_condition.py:76-546
  ResnetBlock2D (video)           motion_editor/models/resnet_2d.py:128-249
  Transformer2DModel              motion_editor/models/attention_2d.py:255-389
  BasicTransformerBlock           motion_editor/models/attention_2d.py:392-547
  Cross/Down/Up/Mid blocks        motion_editor/models/unet_2d_blocks.py
  adapter branch (batch-4 rows)   unet_2d_condition.py:477-494

Layout: video ``[B, F, H, W, C]`` (NHWC per frame). The editing-branch
convention is an explicit size-4 leading axis [recon_u, edit_u, recon_c,
edit_c]. Attention injection is static dispatch via InjectionSpec — see
control/injection.py.

Temporal modules (TemporalConv, attn_temp) are zero-initialized so that a
freshly inflated UNet reproduces per-frame SD-1.5 exactly
(resnet_2d.py:15-16, attention_2d.py:462). Blocks treat these modules as
optional: parameter dicts without them (e.g. the 2D ControlNet) skip the
computation entirely.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from motioneditor_tpu.control.injection import (
    InjectionSpec,
    injected_spatial_attention,
    injected_spatial_attention_auto,
    injected_temporal_kv,
)
from motioneditor_tpu.models.layers import (
    conv2d,
    feed_forward,
    group_norm,
    inflated_conv3d,
    init_conv2d,
    init_feed_forward,
    init_group_norm,
    init_layer_norm,
    init_linear,
    init_temporal_conv,
    init_timestep_embedding_mlp,
    layer_norm,
    linear,
    silu,
    sinusoidal_timestep_embedding,
    temporal_conv,
    timestep_embedding_mlp,
    upsample_conv3d_2x,
)
from motioneditor_tpu.ops.attention import (
    DENSE,
    MOTION_FRAME,
    NORMAL,
    cross_attention,
    init_attention,
    spatial_self_attention,
    temporal_self_attention_video,
)
from motioneditor_tpu.ops.fused_norm import add_layer_norm


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Static architecture config (SD-1.5 defaults + video flags).

    ``use_sc_attn`` selects MotionFrameAttention for attn1 ([prev, cur] K/V —
    despite the name, see attention_2d.py:416); ``use_st_attn`` upgrades the
    st_attn_idx-th block's first attention to dense spatio-temporal
    (unet_2d_condition.py:215/283)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_heads: int = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    transformer_norm_eps: float = 1e-6
    use_sc_attn: bool = True
    use_st_attn: bool = False
    st_attn_idx: int = 0
    video: bool = True  # include temporal modules

    @property
    def down_block_types(self) -> Tuple[str, ...]:
        return ("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",)

    @property
    def up_block_types(self) -> Tuple[str, ...]:
        return ("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3

    def attn1_mode(self, use_st: bool) -> str:
        if use_st:
            return DENSE
        if self.use_sc_attn:
            return MOTION_FRAME
        return NORMAL


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_resnet(key, in_ch, out_ch, temb_ch, video: bool):
    keys = jax.random.split(key, 8)
    p = {
        "norm1": init_group_norm(in_ch),
        "conv1": init_conv2d(keys[0], in_ch, out_ch, 3),
        "norm2": init_group_norm(out_ch),
        "conv2": init_conv2d(keys[1], out_ch, out_ch, 3),
    }
    if temb_ch:
        p["time_emb_proj"] = init_linear(keys[2], temb_ch, out_ch)
    if in_ch != out_ch:
        p["conv_shortcut"] = init_conv2d(keys[3], in_ch, out_ch, 1)
    if video:
        p["temp_conv1"] = init_temporal_conv(keys[4], out_ch)
        p["temp_conv2"] = init_temporal_conv(keys[5], out_ch)
    return p


def _init_basic_transformer_block(key, dim, cross_dim, heads, video: bool):
    keys = jax.random.split(key, 8)
    p = {
        "norm1": init_layer_norm(dim),
        "attn1": init_attention(keys[0], dim, heads=heads),
        "norm2": init_layer_norm(dim),
        "attn2": init_attention(keys[1], dim, cross_dim=cross_dim, heads=heads),
        "norm3": init_layer_norm(dim),
        "ff": init_feed_forward(keys[2], dim),
    }
    if video:
        p["norm_temp"] = init_layer_norm(dim)
        # zero-initialized output proj (attention_2d.py:462)
        p["attn_temp"] = init_attention(keys[3], dim, heads=heads, zero_out=True)
    return p


def _init_transformer2d(key, channels, cross_dim, heads, video: bool):
    keys = jax.random.split(key, 4)
    return {
        "norm": init_group_norm(channels),
        "proj_in": init_conv2d(keys[0], channels, channels, 1),
        "blocks": [
            _init_basic_transformer_block(keys[1], channels, cross_dim, heads, video)
        ],
        "proj_out": init_conv2d(keys[2], channels, channels, 1),
    }


def init_unet(key, config: UNetConfig, include_adapter: bool = True):
    """Build the full UNet parameter pytree (mirrors diffusers names)."""
    from motioneditor_tpu.models.adapter import init_control_adapter

    c = config
    keys = iter(jax.random.split(key, 128))
    time_dim = c.block_out_channels[0] * 4
    params = {
        "conv_in": init_conv2d(next(keys), c.in_channels, c.block_out_channels[0], 3),
        "time_embedding": init_timestep_embedding_mlp(
            next(keys), c.block_out_channels[0], time_dim
        ),
        "down_blocks": [],
        "up_blocks": [],
        "conv_norm_out": init_group_norm(c.block_out_channels[0]),
        "conv_out": init_conv2d(next(keys), c.block_out_channels[0], c.out_channels, 3),
    }

    # down
    out_ch = c.block_out_channels[0]
    for i, btype in enumerate(c.down_block_types):
        in_ch = out_ch
        out_ch = c.block_out_channels[i]
        is_final = i == len(c.block_out_channels) - 1
        block = {"resnets": [], "attentions": []}
        for j in range(c.layers_per_block):
            r_in = in_ch if j == 0 else out_ch
            block["resnets"].append(_init_resnet(next(keys), r_in, out_ch, time_dim, c.video))
            if btype == "CrossAttnDownBlock2D":
                block["attentions"].append(
                    _init_transformer2d(
                        next(keys), out_ch, c.cross_attention_dim, c.attention_heads, c.video
                    )
                )
        if not is_final:
            block["downsamplers"] = [init_conv2d(next(keys), out_ch, out_ch, 3)]
        params["down_blocks"].append(block)

    # mid
    mid_ch = c.block_out_channels[-1]
    params["mid_block"] = {
        "resnets": [
            _init_resnet(next(keys), mid_ch, mid_ch, time_dim, c.video),
            _init_resnet(next(keys), mid_ch, mid_ch, time_dim, c.video),
        ],
        "attentions": [
            _init_transformer2d(
                next(keys), mid_ch, c.cross_attention_dim, c.attention_heads, c.video
            )
        ],
    }

    # up
    rev = list(reversed(c.block_out_channels))
    out_ch = rev[0]
    for i, btype in enumerate(c.up_block_types):
        prev_out = out_ch
        out_ch = rev[i]
        in_ch = rev[min(i + 1, len(rev) - 1)]
        is_final = i == len(rev) - 1
        block = {"resnets": [], "attentions": []}
        for j in range(c.layers_per_block + 1):
            res_skip = in_ch if j == c.layers_per_block else out_ch
            r_in = prev_out if j == 0 else out_ch
            block["resnets"].append(
                _init_resnet(next(keys), r_in + res_skip, out_ch, time_dim, c.video)
            )
            if btype == "CrossAttnUpBlock2D":
                block["attentions"].append(
                    _init_transformer2d(
                        next(keys), out_ch, c.cross_attention_dim, c.attention_heads, c.video
                    )
                )
        if not is_final:
            block["upsamplers"] = [init_conv2d(next(keys), out_ch, out_ch, 3)]
        params["up_blocks"].append(block)

    if include_adapter and c.video:
        params["controlnet_adapter"] = init_control_adapter(
            next(keys), c.block_out_channels
        )
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _gn(params, video, groups, eps):
    b, f, h, w, ch = video.shape
    x = group_norm(params, video.reshape(b * f, h, w, ch), groups, eps)
    return x.reshape(b, f, h, w, ch)


def resnet_block(params, video, temb, *, groups=32, eps=1e-5,
                 per_frame_gn: bool = False):
    """Video resnet (resnet_2d.py:199-249): zero-init temporal convs are
    *residual* adds after each spatial conv; skipped when absent (2D mode).

    GroupNorm semantics: the reference applies torch GroupNorm to the 5D
    [B, C, F, H, W] tensor (resnet_2d.py:160/176), so the stats pool over
    (C/G, F, H, W) — ACROSS frames. ``group_norm`` on the [B, F, H, W, C]
    video reduces all interior axes and matches exactly. ``per_frame_gn``
    restores per-frame stats for the 2D per-frame ControlNet path (the
    reference runs diffusers' 2D ControlNet on a (b f) batch)."""
    def gn(p, x):
        if per_frame_gn:
            return _gn(p, x, groups, eps)
        return group_norm(p, x, groups, eps)

    h = gn(params["norm1"], video)
    h = silu(h)
    h = inflated_conv3d(params["conv1"], h, padding=1)
    if "temp_conv1" in params:
        h = h + temporal_conv(params["temp_conv1"], h)
    if temb is not None and "time_emb_proj" in params:
        t = linear(params["time_emb_proj"], silu(temb))  # [B, C]
        h = h + t[:, None, None, None, :]
    h = gn(params["norm2"], h)
    h = silu(h)
    h = inflated_conv3d(params["conv2"], h, padding=1)
    if "temp_conv2" in params:
        h = h + temporal_conv(params["temp_conv2"], h)
    skip = video
    if "conv_shortcut" in params:
        skip = inflated_conv3d(params["conv_shortcut"], skip, padding=0)
    return skip + h


@dataclasses.dataclass
class AttnContext:
    """Per-call runtime context threaded through transformer blocks."""

    encoder_hidden_states: jnp.ndarray  # [B, L, D_text]
    heads: int
    attn1_mode: str  # NORMAL / MOTION_FRAME / DENSE for this call
    injection: Optional[InjectionSpec] = None
    injection_masks: Optional[Dict[Tuple[int, int], jnp.ndarray]] = None
    use_flash: bool = True
    # running 16x16 cross-attention maps for the MaskAuto editor; a plain
    # python list mutated during the single trace (layers later in the
    # forward consume maps produced by earlier layers, fully_control.py:293)
    cross_maps: Optional[list] = None
    # p2p probability editor (ptp_utils.py:226): applied to attn2 probs at
    # every block and to attn1 probs only in NORMAL mode — the reference
    # registrar patches modules of class CrossAttention only
    # (ptp_utils.py:255-258), which attn1 is iff neither sc nor st attention
    prob_editor: Optional[object] = None
    # frame-sharded kernel execution (parallel/flash_sharding.FrameShardingCtx)
    shard: Optional[object] = None


def basic_transformer_block(
    params, tokens: jnp.ndarray, ctx: AttnContext, layer_idx: int, hw: Tuple[int, int],
    attn1_mode: str,
):
    """tokens: [B, F, N, C]. Order: attn1 -> attn2 -> ff -> temporal
    (attention_2d.py:493-547)."""
    inj = ctx.injection
    spatial_gate = inj is not None and inj.active and inj.spatial_layers[layer_idx]
    temporal_gate = inj is not None and inj.active and inj.temporal_layers[layer_idx]

    h = layer_norm(params["norm1"], tokens)
    if spatial_gate:
        mask_n = None
        if ctx.injection_masks is not None:
            mask_n = ctx.injection_masks.get(hw)
        if inj.mask_mode == "auto":
            attn1_out = injected_spatial_attention_auto(
                params["attn1"], h, ctx.heads, mask_n,
                ctx.cross_maps or [], inj.auto_token_idx, inj.auto_thres,
                # auto mode has no sharded kernel; under a mesh the einsum
                # path shards via GSPMD (an unsharded pallas would replicate)
                use_flash=ctx.use_flash and ctx.shard is None,
            )
        else:
            attn1_out = injected_spatial_attention(
                params["attn1"], h, ctx.heads, mask_n, inj.mask_fgbg,
                use_flash=ctx.use_flash, shard=ctx.shard,
            )
    else:
        attn1_out = spatial_self_attention(
            params["attn1"], h, attn1_mode, ctx.heads, use_flash=ctx.use_flash,
            prob_editor=ctx.prob_editor if attn1_mode == NORMAL else None,
            shard=ctx.shard,
        )

    # fused residual-add + LN (ops/fused_norm.py): DEFAULT-OFF after the
    # round-4 ablation measured it as a regression (add_layer_norm returns
    # the plain add+LN unless MOTIONEDITOR_FUSED_LN=1 opts in); the shape
    # gate keeps the sharded path on GSPMD (pallas under a mesh replicates).
    fuse_ln = ctx.use_flash and ctx.shard is None and tokens.shape[2] >= 512
    if fuse_ln:
        tokens, h = add_layer_norm(params["norm2"], tokens, attn1_out)
    else:
        tokens = tokens + attn1_out
        h = layer_norm(params["norm2"], tokens)
    # collection is driven by the presence of the maps list (set either by
    # auto-mode injection or by unet_apply_with_maps)
    collect = ctx.cross_maps is not None and tokens.shape[2] == 256
    # NOTE: cross-attn stays on the XLA einsum path — flash with kv=77 padded
    # to one 128 block measured slightly SLOWER end-to-end (87.1 vs 85.6
    # ms/step/frame): kernel launch + k/v broadcast outweigh the fp32 score
    # round-trip at this kv length.
    attn2_out = cross_attention(
        params["attn2"], h, ctx.encoder_hidden_states, ctx.heads,
        collect_maps_into=ctx.cross_maps if collect else None,
        prob_editor=ctx.prob_editor,
    )

    if fuse_ln:
        tokens, h = add_layer_norm(params["norm3"], tokens, attn2_out)
    else:
        tokens = tokens + attn2_out
        h = layer_norm(params["norm3"], tokens)
    ff_out = feed_forward(params["ff"], h)

    if "attn_temp" in params:
        # frames are the sequence axis; the Pallas temporal kernel works on
        # the native [B, F, N, C] layout (no transpose round-trip)
        if fuse_ln:
            tokens, ht = add_layer_norm(params["norm_temp"], tokens, ff_out)
        else:
            tokens = tokens + ff_out
            ht = layer_norm(params["norm_temp"], tokens)
        kv_override = injected_temporal_kv(ht) if temporal_gate else None
        tokens = tokens + temporal_self_attention_video(
            params["attn_temp"], ht, ctx.heads, causal=True,
            kv_override=kv_override, use_kernel=ctx.use_flash,
            shard=ctx.shard,
        )
    else:
        tokens = tokens + ff_out
    return tokens


def transformer2d(
    params, video: jnp.ndarray, ctx: AttnContext, layer_idx: int, attn1_mode: str,
    groups=32, eps=1e-6,
):
    """GN -> 1x1 conv in -> transformer blocks on tokens -> 1x1 conv out +
    residual (attention_2d.py:338-389)."""
    b, f, h, w, c = video.shape
    residual = video
    x = _gn(params["norm"], video, groups, eps)
    x = inflated_conv3d(params["proj_in"], x, padding=0)
    tokens = x.reshape(b, f, h * w, c)
    for bp in params["blocks"]:
        tokens = basic_transformer_block(bp, tokens, ctx, layer_idx, (h, w), attn1_mode)
    x = tokens.reshape(b, f, h, w, c)
    x = inflated_conv3d(params["proj_out"], x, padding=0)
    return x + residual


def unet_apply(
    params,
    config: UNetConfig,
    sample: jnp.ndarray,
    timesteps: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    *,
    normal_infer: bool = False,
    injection: Optional[InjectionSpec] = None,
    injection_masks: Optional[Dict[Tuple[int, int], jnp.ndarray]] = None,
    down_block_additional_residuals: Optional[Sequence[jnp.ndarray]] = None,
    mid_block_additional_residual: Optional[jnp.ndarray] = None,
    use_flash: bool = True,
    remat: bool = False,
    prob_editor=None,
    shard_ctx=None,
    _cross_maps_out: Optional[list] = None,
) -> jnp.ndarray:
    """Full UNet forward (unet_2d_condition.py:363-546).

    sample: [B, F, H, W, C_in]; timesteps: scalar or [B];
    encoder_hidden_states: [B, L, 768].

    ControlNet residuals: list of 12 + mid. When the branch axis is size 4 the
    residuals are the 2-row (edit branch) ControlNet outputs and the
    content-aware adapter expands them (unet_2d_condition.py:477-494,
    zero residuals on reconstruction rows). Otherwise (training stage 2) the
    adapter consumes them directly against the UNet's own features.
    """
    from motioneditor_tpu.models.adapter import control_adapter_apply

    c = config
    b = sample.shape[0]
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (b,))
    t_emb = sinusoidal_timestep_embedding(timesteps, c.block_out_channels[0])
    temb = timestep_embedding_mlp(params["time_embedding"], t_emb.astype(sample.dtype))

    ctx = AttnContext(
        encoder_hidden_states=encoder_hidden_states,
        heads=c.attention_heads,
        attn1_mode=NORMAL,
        injection=injection,
        injection_masks=injection_masks,
        use_flash=use_flash,
        prob_editor=prob_editor,
        shard=shard_ctx,
        cross_maps=_cross_maps_out
        if _cross_maps_out is not None
        else (
            []
            if (
                injection is not None
                and injection.active
                and injection.collect_cross_maps
            )
            else None
        ),
    )

    h = inflated_conv3d(params["conv_in"], sample, padding=1)
    res_samples: List[jnp.ndarray] = [h]
    layer_idx = 0

    def mode_for(position_uses_st: bool) -> str:
        if normal_infer:
            return NORMAL
        return c.attn1_mode(position_uses_st)

    # gradient checkpointing (train_bg.py:182-183 / unet_2d_blocks.py:719-727):
    # recompute each block's activations in the backward pass
    def _res(rp, hh, tt):
        return resnet_block(rp, hh, tt, groups=c.norm_num_groups, eps=c.norm_eps)

    def _t2d(layer, mode):
        def f(bp, hh, enc):
            ctx_l = dataclasses.replace(ctx, encoder_hidden_states=enc)
            return transformer2d(
                bp, hh, ctx_l, layer, mode,
                groups=c.norm_num_groups, eps=c.transformer_norm_eps,
            )
        return jax.checkpoint(f) if remat else f

    res_fn = jax.checkpoint(_res) if remat else _res

    # down
    for i, block in enumerate(params["down_blocks"]):
        btype = c.down_block_types[i]
        for j, rp in enumerate(block["resnets"]):
            h = res_fn(rp, h, temb)
            if btype == "CrossAttnDownBlock2D":
                use_st = c.use_st_attn and i == c.st_attn_idx and j == 0
                h = _t2d(layer_idx, mode_for(use_st))(
                    block["attentions"][j], h, encoder_hidden_states
                )
                layer_idx += 1
            res_samples.append(h)
        if "downsamplers" in block:
            bb, ff_, hh, ww, cc = h.shape
            h2 = conv2d(block["downsamplers"][0], h.reshape(bb * ff_, hh, ww, cc),
                        stride=2, padding=1)
            h = h2.reshape(bb, ff_, *h2.shape[1:])
            res_samples.append(h)

    # content-aware motion adapter (unet_2d_condition.py:477-494)
    if down_block_additional_residuals is not None:
        residuals = list(down_block_additional_residuals)
        if mid_block_additional_residual is not None and mid_block_additional_residual.shape[0] == 4:
            # inference batch-4: adapter runs on edit rows, reads edit-row UNet
            # features as "source hidden states" (rows [1,3], :479)
            source_hidden = [s[jnp.array([1, 3])] for s in res_samples]
            motion = control_adapter_apply(
                params["controlnet_adapter"], residuals, source_hidden,
                use_flash=ctx.use_flash, shard=ctx.shard,
            )
            zeros = [jnp.zeros_like(m[:1]) for m in motion]
            residuals = [
                jnp.concatenate([z, m[:1], z, m[1:2]], axis=0)
                for z, m in zip(zeros, motion)
            ]
        else:
            motion = control_adapter_apply(
                params["controlnet_adapter"], residuals, res_samples,
                use_flash=ctx.use_flash, shard=ctx.shard,
            )
            residuals = motion
        res_samples = [r + d for r, d in zip(res_samples, residuals)]

    # mid
    mb = params["mid_block"]
    h = res_fn(mb["resnets"][0], h, temb)
    h = _t2d(layer_idx, mode_for(c.use_st_attn))(
        mb["attentions"][0], h, encoder_hidden_states
    )
    layer_idx += 1
    h = res_fn(mb["resnets"][1], h, temb)

    if mid_block_additional_residual is not None:
        h = h + mid_block_additional_residual

    # up
    for i, block in enumerate(params["up_blocks"]):
        btype = c.up_block_types[i]
        n_res = len(block["resnets"])
        skips = res_samples[-n_res:]
        res_samples = res_samples[:-n_res]
        for j, rp in enumerate(block["resnets"]):
            skip = skips[-(j + 1)]
            h = jnp.concatenate([h, skip], axis=-1)
            h = res_fn(rp, h, temb)
            if btype == "CrossAttnUpBlock2D":
                # get_up_block: use_st_attn iff i-1 == st_attn_idx, first layer
                use_st = c.use_st_attn and (i - 1) == c.st_attn_idx and j == 0
                h = _t2d(layer_idx, mode_for(use_st))(
                    block["attentions"][j], h, encoder_hidden_states
                )
                layer_idx += 1
        if "upsamplers" in block:
            h = upsample_conv3d_2x(block["upsamplers"][0], h)

    # final GN is also across-frame 5D GroupNorm (unet_2d_condition.py:288/539)
    h = group_norm(params["conv_norm_out"], h, c.norm_num_groups, c.norm_eps)
    h = silu(h)
    h = inflated_conv3d(params["conv_out"], h, padding=1)
    return h


def unet_apply_with_maps(params, config, sample, timesteps, encoder_hidden_states,
                         **kwargs):
    """UNet forward that also returns the 16x16 cross-attention maps —
    the functional MutualAttentionStore (fully_control_utils.py:74-107):
    maps are mean-over-heads probabilities [(B F), 256, 77], one per
    16x16 transformer block, in forward order. Works with or without an
    injection spec (the forward math is unchanged by collection)."""
    maps: list = []
    out = unet_apply(
        params, config, sample, timesteps, encoder_hidden_states,
        _cross_maps_out=maps, **kwargs,
    )
    return out, maps
