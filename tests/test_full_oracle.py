"""Full-model golden-oracle parity: the JAX UNet vs. the self-contained torch
reimplementation (tests/torch_oracle.py) of the reference graph
(unet_2d_condition.py:363-546, fully_control.py:372-460).

The torch oracle's state_dict is ported through models/weights.port_unet —
the SAME code path real SD-1.5 checkpoints go through — so these tests pin
the weight-port conventions AND the whole-graph forward semantics (row
conventions, across-frame GN, residual plumbing, injection gating) end to
end. Any off-by-one that per-layer oracles can't see fails here.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from motioneditor_tpu.control.injection import InjectionSpec
from motioneditor_tpu.models.unet import UNetConfig, init_unet, unet_apply
from motioneditor_tpu.models.weights import _merge, port_unet

from torch_oracle import OracleUNet

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

TINY = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    norm_num_groups=8,
    attention_heads=4,
    cross_attention_dim=16,
    use_sc_attn=True,
)

B4, F, HW = 4, 3, 16


def _to_jax_video(t: torch.Tensor) -> jnp.ndarray:
    # [B, C, F, H, W] -> [B, F, H, W, C]
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 4, 1))


def _res_channels():
    c = TINY.block_out_channels
    return [c[0], c[0], c[0], c[0], c[1], c[1], c[1], c[2], c[2], c[2], c[3], c[3]]


@pytest.fixture(scope="module")
def oracle_and_params():
    torch.manual_seed(0)
    oracle = OracleUNet().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = _merge(init_unet(jax.random.PRNGKey(0), TINY), port_unet(sd, video=True))
    return oracle, params


def _inputs(batch):
    g = torch.Generator().manual_seed(1)
    x = torch.randn(batch, 4, F, HW, HW, generator=g)
    enc = torch.randn(batch, 7, 16, generator=g)
    t = torch.tensor(321.0)
    return x, enc, t


def _residual_inputs(batch):
    g = torch.Generator().manual_seed(2)
    sizes = [16, 16, 16, 8, 8, 8, 4, 4, 4, 2, 2, 2]
    down = [
        torch.randn(batch, ch, F, s, s, generator=g) * 0.1
        for s, ch in zip(sizes, _res_channels())
    ]
    mid = torch.randn(batch, 64, F, 2, 2, generator=g) * 0.1
    return down, mid


def _compare(torch_out, jax_out, atol):
    np.testing.assert_allclose(
        np.asarray(jax_out),
        torch_out.detach().numpy().transpose(0, 2, 3, 4, 1),
        atol=atol,
        rtol=1e-4,
    )


def test_plain_forward_parity(oracle_and_params):
    """Motion-frame video forward, no residuals (the stage-1 training graph)."""
    oracle, params = oracle_and_params
    x, enc, t = _inputs(2)
    with torch.no_grad():
        ref = oracle(x, t, enc)
    out = unet_apply(
        params, TINY, _to_jax_video(x), jnp.asarray(t.item()),
        jnp.asarray(enc.numpy()), use_flash=False,
    )
    _compare(ref, out, atol=2e-4)


def test_normal_infer_parity(oracle_and_params):
    """normal_infer=True (the DDIM-inversion graph, attention_2d.py:612-629)."""
    oracle, params = oracle_and_params
    x, enc, t = _inputs(2)
    with torch.no_grad():
        ref = oracle(x, t, enc, normal_infer=True)
    out = unet_apply(
        params, TINY, _to_jax_video(x), jnp.asarray(t.item()),
        jnp.asarray(enc.numpy()), normal_infer=True, use_flash=False,
    )
    _compare(ref, out, atol=2e-4)


def test_batch4_adapter_parity(oracle_and_params):
    """Batch-4 adapter branch: residuals adapted against edit-row UNet
    features, zero-filled on recon rows, mid residual added raw
    (unet_2d_condition.py:477-494)."""
    oracle, params = oracle_and_params
    x, enc, t = _inputs(B4)
    down2, mid2 = _residual_inputs(2)
    # reference convention: residual rows are the 2-row edit-branch ControlNet
    # outputs; mid is expanded to batch 4 with zeros on recon rows
    # (pipeline_motion_editor.py:628-629)
    mid4 = torch.cat(
        [torch.zeros_like(mid2[:1]), mid2[:1], torch.zeros_like(mid2[:1]), mid2[1:2]],
        dim=0,
    )
    with torch.no_grad():
        ref = oracle(
            x, t, enc,
            down_block_additional_residuals=down2,
            mid_block_additional_residual=mid4,
        )
    out = unet_apply(
        params, TINY, _to_jax_video(x), jnp.asarray(t.item()),
        jnp.asarray(enc.numpy()),
        down_block_additional_residuals=[_to_jax_video(d) for d in down2],
        mid_block_additional_residual=_to_jax_video(mid4),
        use_flash=False,
    )
    _compare(ref, out, atol=3e-4)


def test_stage2_adapter_parity(oracle_and_params):
    """batch != 4 adapter path (train_adaptor.py): the adapter consumes the
    ControlNet residuals against the UNet's own res samples."""
    oracle, params = oracle_and_params
    x, enc, t = _inputs(2)
    down2, mid2 = _residual_inputs(2)
    with torch.no_grad():
        ref = oracle(
            x, t, enc,
            down_block_additional_residuals=down2,
            mid_block_additional_residual=mid2,
        )
    out = unet_apply(
        params, TINY, _to_jax_video(x), jnp.asarray(t.item()),
        jnp.asarray(enc.numpy()),
        down_block_additional_residuals=[_to_jax_video(d) for d in down2],
        mid_block_additional_residual=_to_jax_video(mid2),
        use_flash=False,
    )
    _compare(ref, out, atol=3e-4)


def test_injected_step_parity(oracle_and_params):
    """The injected two-branch denoise step: FullySelfAttentionControlMask
    fg/bg K/V decomposition on layers >= 10 + temporal K/V injection
    (fully_control.py:372-460, temporal_control.py:70-88), with the batch-4
    adapter branch active."""
    oracle, params = oracle_and_params
    x, enc, t = _inputs(B4)
    down2, mid2 = _residual_inputs(2)
    mid4 = torch.cat(
        [torch.zeros_like(mid2[:1]), mid2[:1], torch.zeros_like(mid2[:1]), mid2[1:2]],
        dim=0,
    )
    g = torch.Generator().manual_seed(3)
    masks = {
        (s, s): (torch.rand(F, s * s, 1, generator=g) > 0.5).float()
        for s in (16, 8, 4, 2)
    }
    layers = set(range(10, 16))
    with torch.no_grad():
        ref = oracle(
            x, t, enc,
            down_block_additional_residuals=down2,
            mid_block_additional_residual=mid4,
            inject_spatial_layers=layers,
            inject_temporal_layers=layers,
            injection_masks=masks,
        )
    spec = InjectionSpec.from_start_layer(10)
    out = unet_apply(
        params, TINY, _to_jax_video(x), jnp.asarray(t.item()),
        jnp.asarray(enc.numpy()),
        down_block_additional_residuals=[_to_jax_video(d) for d in down2],
        mid_block_additional_residual=_to_jax_video(mid4),
        injection=spec,
        injection_masks={k: jnp.asarray(v.numpy()) for k, v in masks.items()},
        use_flash=False,
    )
    _compare(ref, out, atol=3e-4)


# ---------------------------------------------------------------------------
# multi-step pipeline parity: ControlNet + residual plumbing + CFG + DDIM
# over several injected steps (pipeline_motion_editor.py:599-654)
# ---------------------------------------------------------------------------


def _torch_ddim_step(schedule, eps, t, sample, num_steps):
    """diffusers DDIMScheduler.step (eta=0) closed form, in torch fp64-free
    fp32 — mirrors motioneditor_tpu.schedulers.ddim_step."""
    acp = torch.from_numpy(
        np.cumprod(1.0 - schedule.betas).astype(np.float32)
    )
    step_ratio = schedule.num_train_timesteps // num_steps
    prev_t = t - step_ratio
    alpha_t = acp[t]
    alpha_prev = acp[prev_t] if prev_t >= 0 else acp[0]
    beta_t = 1.0 - alpha_t
    pred_x0 = (sample - beta_t**0.5 * eps) / alpha_t**0.5
    return alpha_prev**0.5 * pred_x0 + (1.0 - alpha_prev) ** 0.5 * eps


def test_multi_step_pipeline_parity(oracle_and_params):
    """THE denoise step loop, 3 injected steps end to end: batch-4 CFG build,
    ControlNet on edit rows [1,3], residual reshape + mid-zeroing on recon
    rows, UNet with fg/bg + temporal injection and the batch-4 adapter
    branch, CFG combine, DDIM update (pipeline_motion_editor.py:599-654).
    The round-2 oracle pinned one UNet forward; this pins the loop around it
    — including the ControlNet port path (models/weights.port_controlnet)."""
    import dataclasses

    from torch_oracle import OracleControlNet
    from motioneditor_tpu.models.controlnet import precompute_cond_embedding
    from motioneditor_tpu.models.weights import port_controlnet
    from motioneditor_tpu.pipelines.editor import _jit_denoise_segment
    from motioneditor_tpu.schedulers import DiffusionSchedule

    oracle, params = oracle_and_params
    torch.manual_seed(7)
    cn = OracleControlNet().eval()
    cn_params = port_controlnet(
        {k: v.detach().numpy() for k, v in cn.state_dict().items()}
    )
    cn_config = dataclasses.replace(
        TINY, video=False, use_sc_attn=False, use_st_attn=False
    )
    schedule = DiffusionSchedule()
    num_steps = 50
    seg_ts = schedule.inference_timesteps(num_steps)[:3]  # [981, 961, 941]

    g = torch.Generator().manual_seed(11)
    lat0 = torch.randn(2, 4, F, HW, HW, generator=g) * 0.3
    cond = torch.randn(2, 7, 16, generator=g) * 0.3
    uncond = torch.randn(2, 7, 16, generator=g) * 0.3
    skel = torch.rand(2, 3, F, 8 * HW, 8 * HW, generator=g)
    masks = {
        (s, s): (torch.rand(F, s * s, 1, generator=g) > 0.5).float()
        for s in (16, 8, 4, 2)
    }
    layers = set(range(10, 16))
    guidance = 7.5

    # -- torch reference loop -------------------------------------------------
    lat = lat0.clone()
    with torch.no_grad():
        for t_val in seg_ts:
            t = torch.tensor(float(t_val))
            latent_in = torch.cat([lat, lat], dim=0)  # [ru, eu, rc, ec]
            text_in = torch.cat([uncond, cond], dim=0)
            down, mid = cn(
                latent_in[[1, 3]], t, text_in[[1, 3]], skel,
                conditioning_scale=1.0,
            )
            zero = torch.zeros_like(mid[:1])
            mid4 = torch.cat([zero, mid[:1], zero, mid[1:2]], dim=0)
            eps = oracle(
                latent_in, t, text_in,
                down_block_additional_residuals=down,
                mid_block_additional_residual=mid4,
                inject_spatial_layers=layers,
                inject_temporal_layers=layers,
                injection_masks=masks,
            )
            eps_u, eps_c = eps.chunk(2, dim=0)
            eps_g = eps_u + guidance * (eps_c - eps_u)
            lat = _torch_ddim_step(schedule, eps_g, int(t_val), lat, num_steps)

    # -- jitted segment ---------------------------------------------------------
    spec = InjectionSpec.from_start_layer(10)
    seg_fn = _jit_denoise_segment(
        TINY, cn_config, schedule, num_steps, spec, guidance, 1.0, False, False
    )
    skel_j = _to_jax_video(skel)
    cond_embedding = precompute_cond_embedding(cn_params, skel_j)
    out, _ = seg_fn(
        params,
        cn_params,
        _to_jax_video(lat0),
        jnp.asarray(seg_ts),
        jnp.asarray(cond.numpy()),
        jnp.asarray(uncond.numpy()),
        jnp.zeros((3, 1, 1, 1)),
        cond_embedding,
        {k: jnp.asarray(v.numpy()) for k, v in masks.items()},
        jnp.zeros(()),
    )
    _compare(lat, out, atol=2e-3)
