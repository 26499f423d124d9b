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
