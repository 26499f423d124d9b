"""Golden-VALUE parity for the evaluation stack (VERDICT round-2 item 6).

The CLIP towers are checked against the REAL HuggingFace transformers
implementations (random-init tiny configs, state_dict ported through the
same functions real checkpoints use) — third-party oracles, not
self-written mirrors. LPIPS is checked against an in-test torch
reimplementation of the lpips 'alex' pipeline (scaling layer, unit
normalization, non-negative 1x1 lins, spatial mean) sharing the same
weights through models/eval ports.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)


def test_clip_image_value_matches_transformers():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from motioneditor_tpu.models.clip_image import (
        CLIPImageConfig,
        clip_image_embed,
        port_clip_image,
    )

    hf_cfg = CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        projection_dim=16,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()
    params = port_clip_image(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    )
    cfg = CLIPImageConfig(
        image_size=32, patch_size=8, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, projection_dim=16,
    )
    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(x)).image_embeds.numpy()
    out = clip_image_embed(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_clip_text_value_matches_transformers():
    from transformers import CLIPTextConfig as HFTextConfig, CLIPTextModel

    from motioneditor_tpu.models.clip_text import (
        CLIPTextConfig,
        clip_text_apply,
    )
    from motioneditor_tpu.models.weights import port_clip_text

    hf_cfg = HFTextConfig(
        vocab_size=100,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=12,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(1)
    hf = CLIPTextModel(hf_cfg).eval()
    params = port_clip_text(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    )
    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=12,
    )
    ids = np.array([[49, 3, 7, 12, 50] + [0] * 7, [49, 9, 50] + [0] * 9])
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    out = clip_text_apply(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_lpips_value_matches_torch_pipeline():
    """End-to-end LPIPS value vs a torch implementation of the published
    'alex' pipeline (Zhang et al. 2018 / the lpips package forward): input
    scaling layer -> 5 conv taps -> per-channel unit norm -> squared diff ->
    non-negative 1x1 lin -> spatial mean -> sum over taps."""
    from motioneditor_tpu.eval.lpips import (
        ALEX_CONVS,
        POOL_AFTER,
        SCALE,
        SHIFT,
        lpips,
        port_lpips_alexnet,
    )

    torch.manual_seed(2)
    # torchvision-layout alexnet.features state dict (random weights)
    conv_ids = (0, 3, 6, 8, 10)
    alex_sd = {}
    in_ch = 3
    convs = []
    for cid, (out_ch, k, s, p) in zip(conv_ids, ALEX_CONVS):
        w = torch.randn(out_ch, in_ch, k, k) * 0.05
        b = torch.randn(out_ch) * 0.05
        alex_sd[f"features.{cid}.weight"] = w.numpy()
        alex_sd[f"features.{cid}.bias"] = b.numpy()
        convs.append((w, b, s, p))
        in_ch = out_ch
    lpips_sd = {
        f"lin{i}.model.1.weight": torch.rand(1, ALEX_CONVS[i][0], 1, 1).numpy() * 0.1
        for i in range(5)
    }
    params = port_lpips_alexnet(alex_sd, lpips_sd)

    def torch_lpips(a, b):
        def feats(x):
            x = x * 2.0 - 1.0  # [0,1] -> [-1,1]
            x = (x - torch.from_numpy(SHIFT)[:, None, None]) / torch.from_numpy(
                SCALE
            )[:, None, None]
            out = []
            for i, (w, bias, s, p) in enumerate(convs):
                x = torch.nn.functional.conv2d(x, w, bias, stride=s, padding=p)
                x = torch.nn.functional.relu(x)
                out.append(x)
                if i in POOL_AFTER:
                    x = torch.nn.functional.max_pool2d(x, 3, 2)
            return out

        fa, fb = feats(a), feats(b)
        total = 0.0
        for xa, xb, i in zip(fa, fb, range(5)):
            na = xa / xa.norm(dim=1, keepdim=True).clamp_min(1e-10)
            nb = xb / xb.norm(dim=1, keepdim=True).clamp_min(1e-10)
            d2 = (na - nb) ** 2
            w = torch.from_numpy(lpips_sd[f"lin{i}.model.1.weight"]).clamp_min(0)
            total = total + torch.nn.functional.conv2d(d2, w).mean(dim=(1, 2, 3))
        return total.mean()

    rs = np.random.RandomState(3)
    a = rs.rand(2, 3, 64, 64).astype(np.float32)
    b = np.clip(a + rs.randn(2, 3, 64, 64).astype(np.float32) * 0.1, 0, 1)
    with torch.no_grad():
        ref = float(torch_lpips(torch.from_numpy(a), torch.from_numpy(b)))
    out = float(
        lpips(params, jnp.asarray(a.transpose(0, 2, 3, 1)),
              jnp.asarray(b.transpose(0, 2, 3, 1)))
    )
    assert out == pytest.approx(ref, rel=1e-4)
    # identical inputs -> exactly zero distance
    zero = float(
        lpips(params, jnp.asarray(a.transpose(0, 2, 3, 1)),
              jnp.asarray(a.transpose(0, 2, 3, 1)))
    )
    assert zero == pytest.approx(0.0, abs=1e-7)
