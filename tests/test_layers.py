import jax
import jax.numpy as jnp
import numpy as np
import torch

from motioneditor_tpu.models import layers as L


def test_linear_matches_torch():
    key = jax.random.PRNGKey(0)
    p = L.init_linear(key, 8, 16)
    x = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    tl = torch.nn.Linear(8, 16)
    with torch.no_grad():
        tl.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T))
        tl.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
    ref = tl(torch.from_numpy(x)).detach().numpy()
    out = np.asarray(L.linear(p, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_conv2d_matches_torch():
    key = jax.random.PRNGKey(0)
    p = L.init_conv2d(key, 3, 5, 3)
    x = np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32)
    tc = torch.nn.Conv2d(3, 5, 3, padding=1)
    with torch.no_grad():
        tc.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1)))
        tc.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
    ref = tc(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    out = np.asarray(L.conv2d(p, jnp.asarray(x), padding=1)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_conv2d_stride2_matches_torch():
    key = jax.random.PRNGKey(1)
    p = L.init_conv2d(key, 4, 4, 3)
    x = np.random.RandomState(1).randn(1, 16, 16, 4).astype(np.float32)
    tc = torch.nn.Conv2d(4, 4, 3, stride=2, padding=1)
    with torch.no_grad():
        tc.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1)))
        tc.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
    ref = tc(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    out = np.asarray(L.conv2d(p, jnp.asarray(x), stride=2, padding=1)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_group_norm_matches_torch():
    p = L.init_group_norm(8)
    x = np.random.RandomState(0).randn(2, 4, 4, 8).astype(np.float32)
    tg = torch.nn.GroupNorm(4, 8, eps=1e-6)
    ref = tg(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    out = np.asarray(L.group_norm(p, jnp.asarray(x), num_groups=4)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_group_norm_high_mean_stats():
    """The fused one-pass E[x^2]-E[x]^2 variance must stay within the
    documented error bound vs the centered two-pass formulation even at
    |mean|/std = 100 — 10x beyond realistic SD activation statistics."""
    p = L.init_group_norm(8)
    rs = np.random.RandomState(1)
    for mean_scale in (10.0, 50.0, 100.0):
        x = (rs.randn(2, 8, 8, 8) + mean_scale).astype(np.float32)
        out = np.asarray(L.group_norm(p, jnp.asarray(x), num_groups=4))
        # centered two-pass oracle in float64
        xg = x.reshape(2, 64, 4, 2).astype(np.float64)
        mu = xg.mean(axis=(1, 3), keepdims=True)
        var = ((xg - mu) ** 2).mean(axis=(1, 3), keepdims=True)
        ref = ((xg - mu) / np.sqrt(var + 1e-6)).reshape(2, 8, 8, 8)
        np.testing.assert_allclose(out, ref, atol=5e-3)


def test_group_norm_video_rank5():
    """GroupNorm on [B,F,H,W,C] must normalize per (batch,frame) to match the
    reference applying torch GroupNorm on (b f) c h w."""
    p = L.init_group_norm(8)
    x = np.random.RandomState(0).randn(2, 3, 4, 4, 8).astype(np.float32)
    out5 = np.asarray(
        L.group_norm(p, jnp.asarray(x.reshape(6, 4, 4, 8)), num_groups=4)
    )
    tg = torch.nn.GroupNorm(4, 8, eps=1e-6)
    ref = (
        tg(torch.from_numpy(x.reshape(6, 4, 4, 8).transpose(0, 3, 1, 2)))
        .detach()
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(out5, ref, atol=1e-4)


def test_layer_norm_matches_torch():
    p = L.init_layer_norm(16)
    x = np.random.RandomState(0).randn(3, 5, 16).astype(np.float32)
    ref = torch.nn.functional.layer_norm(torch.from_numpy(x), (16,)).numpy()
    out = np.asarray(L.layer_norm(p, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_layer_norm_bf16_dot_stats_parity(monkeypatch):
    """The bf16 dot-against-ones stats branch (the branch the TPU bench runs,
    MOTIONEDITOR_LN_DOT_STATS) must match the exact fp32 reduce form within
    bf16 output rounding."""
    monkeypatch.setenv("MOTIONEDITOR_LN_DOT_STATS", "1")
    p = L.init_layer_norm(128)
    p = {"scale": p["scale"] * 1.3, "bias": p["bias"] + 0.2}
    x = np.random.RandomState(0).randn(4, 7, 128).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    out = np.asarray(L.layer_norm(p, xb)).astype(np.float32)
    monkeypatch.setenv("MOTIONEDITOR_LN_DOT_STATS", "0")
    ref = np.asarray(L.layer_norm(p, xb)).astype(np.float32)
    # both paths see the same bf16 input; outputs differ only by the stats
    # formulation (bf16-rounded squares, rel err ~2^-9) + bf16 output rounding
    np.testing.assert_allclose(out, ref, atol=0.04, rtol=0.02)


def test_layer_norm_bf16_high_mean_stats(monkeypatch):
    """One-pass E[x^2]-E[x]^2 variance in the dot-stats branch: pin the
    documented bf16 error model (mirrors test_group_norm_high_mean_stats).

    bf16 squares carry ~2^-9 relative error each; with fp32 accumulation
    over C=128 random-sign roundings the variance error after cancellation
    is ~(mean/std)^2 * 2^-9 / sqrt(C) relative — measured 1.1% normalized
    output error at mean/std=5, 5.4% at 15 (this branch is bf16-only; LN
    inputs in SD transformers are post-residual with |mean|/std < 5, and
    the fp32 parity path keeps the exact reduce form)."""
    monkeypatch.setenv("MOTIONEDITOR_LN_DOT_STATS", "1")
    p = L.init_layer_norm(128)
    rs = np.random.RandomState(1)
    for mean_scale, atol in ((5.0, 0.04), (15.0, 0.25)):
        x = (rs.randn(2, 9, 128) + mean_scale).astype(np.float32)
        xb = jnp.asarray(x).astype(jnp.bfloat16)
        out = np.asarray(L.layer_norm(p, xb)).astype(np.float32)
        # fp64 centered oracle on the bf16-rounded input
        xf = np.asarray(xb).astype(np.float64)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        ref = (xf - mu) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(out, ref, atol=atol, rtol=0.08)


def test_temporal_conv_zero_init_is_zero():
    p = L.init_temporal_conv(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 3, 3, 8))
    out = L.temporal_conv(p, x)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_temporal_conv_matches_torch_conv1d():
    p = L.init_temporal_conv(jax.random.PRNGKey(0), 4)
    w = np.random.RandomState(0).randn(3, 4, 4).astype(np.float32) * 0.1
    b = np.random.RandomState(1).randn(4).astype(np.float32) * 0.1
    p = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    x = np.random.RandomState(2).randn(1, 5, 2, 2, 4).astype(np.float32)

    tc = torch.nn.Conv1d(4, 4, 3, padding=1)
    with torch.no_grad():
        # WIO -> OIW
        tc.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        tc.bias.copy_(torch.from_numpy(b))
    # reference layout: (b h w) c f  (resnet_2d.py:22)
    xt = torch.from_numpy(x.transpose(0, 2, 3, 4, 1).reshape(4, 4, 5))
    ref = tc(xt).detach().numpy().reshape(1, 2, 2, 4, 5).transpose(0, 4, 1, 2, 3)
    out = np.asarray(L.temporal_conv(p, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_temporal_conv_forms_agree(monkeypatch):
    """The TPU matmul form and the off-TPU transpose->conv form are the same
    operator: both must match the torch Conv1d oracle bit-for-tolerance."""
    w = np.random.RandomState(3).randn(3, 4, 4).astype(np.float32) * 0.1
    b = np.random.RandomState(4).randn(4).astype(np.float32) * 0.1
    p = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    x = np.random.RandomState(5).randn(2, 6, 3, 3, 4).astype(np.float32)

    tc = torch.nn.Conv1d(4, 4, 3, padding=1)
    with torch.no_grad():
        tc.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))  # WIO -> OIW
        tc.bias.copy_(torch.from_numpy(b))
    xt = torch.from_numpy(x.transpose(0, 2, 3, 4, 1).reshape(18, 4, 6))
    ref = tc(xt).detach().numpy().reshape(2, 3, 3, 4, 6).transpose(0, 4, 1, 2, 3)

    monkeypatch.setenv("MOTIONEDITOR_TC_MATMUL", "1")
    out_mm = np.asarray(L.temporal_conv(p, jnp.asarray(x)))
    monkeypatch.setenv("MOTIONEDITOR_TC_MATMUL", "0")
    out_cv = np.asarray(L.temporal_conv(p, jnp.asarray(x)))
    np.testing.assert_allclose(out_mm, ref, atol=1e-5)
    np.testing.assert_allclose(out_cv, ref, atol=1e-5)
    np.testing.assert_allclose(out_mm, out_cv, atol=1e-5)


def test_timestep_embedding_matches_diffusers_formula():
    t = jnp.asarray([0, 10, 999])
    emb = np.asarray(L.sinusoidal_timestep_embedding(t, 320))
    half = 160
    expo = np.exp(-np.log(10000.0) * np.arange(half) / half)
    arg = np.asarray(t)[:, None].astype(np.float64) * expo[None]
    ref = np.concatenate([np.cos(arg), np.sin(arg)], axis=-1)
    # host-side fp64 frequencies + 2-pi range reduction keep the embedding
    # within ~1e-4 of the fp64 reference even at t=999 on TPU
    np.testing.assert_allclose(emb, ref, atol=5e-4)


def test_upsample_nearest_2x():
    x = jnp.arange(2 * 1 * 2 * 2 * 1, dtype=jnp.float32).reshape(2, 1, 2, 2, 1)
    out = np.asarray(L.upsample_nearest_2x(x))
    assert out.shape == (2, 1, 4, 4, 1)
    np.testing.assert_array_equal(out[0, 0, :2, :2, 0], x[0, 0, 0, 0, 0])


def test_upsample_conv_forms_agree(monkeypatch):
    """The fused transposed-conv form of nearest-2x + 3x3 conv must equal
    the two-op reference form exactly (fp32; same conv op, reassociated
    kernel sums only)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 5, 7, 6).astype(np.float32))
    params = {
        "kernel": jnp.asarray(rng.randn(3, 3, 6, 4).astype(np.float32) * 0.1),
        "bias": jnp.asarray(rng.randn(4).astype(np.float32)),
    }
    monkeypatch.setenv("MOTIONEDITOR_UPCONV_FUSED", "0")
    ref = np.asarray(L.upsample_conv2d_2x(params, x))
    monkeypatch.setenv("MOTIONEDITOR_UPCONV_FUSED", "1")
    fused = np.asarray(L.upsample_conv2d_2x(params, x))
    assert ref.shape == fused.shape == (3, 10, 14, 4)
    np.testing.assert_allclose(fused, ref, atol=2e-5, rtol=1e-5)


def test_upsample_conv_matches_torch():
    """Fused form vs torch nearest-2x + SAME conv (the reference's
    Upsample3D semantics, resnet_2d.py:60-85)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 5, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 4).astype(np.float32) * 0.1
    b = rng.randn(4).astype(np.float32)
    params = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    out = np.asarray(L.upsample_conv2d_2x(params, jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ut = torch.nn.functional.interpolate(xt, scale_factor=2, mode="nearest")
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)
    ref = torch.nn.functional.conv2d(ut, wt, torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(
        out, ref.permute(0, 2, 3, 1).numpy(), atol=2e-5, rtol=1e-5
    )


def test_upsample_conv_grad_forms_agree(monkeypatch):
    """The fused form must differentiate identically (it sits in the
    stage-1/2 training graphs through the UNet up path)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    params = {
        "kernel": jnp.asarray(rng.randn(3, 3, 3, 3).astype(np.float32) * 0.1),
        "bias": jnp.asarray(rng.randn(3).astype(np.float32)),
    }

    def loss(p, x):
        return jnp.sum(L.upsample_conv2d_2x(p, x) ** 2)

    monkeypatch.setenv("MOTIONEDITOR_UPCONV_FUSED", "0")
    g_ref = jax.grad(loss)(params, x)
    monkeypatch.setenv("MOTIONEDITOR_UPCONV_FUSED", "1")
    g_fused = jax.grad(loss)(params, x)
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_fused[k]), np.asarray(g_ref[k]), atol=2e-4, rtol=1e-4
        )


def test_nearest_resize_matches_torch():
    x = np.random.RandomState(0).randn(1, 7, 9, 2).astype(np.float32)
    out = np.asarray(L.nearest_resize(jnp.asarray(x), (4, 4)))
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(4, 4), mode="nearest"
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_geglu_feed_forward():
    p = L.init_feed_forward(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8))
    out = L.feed_forward(p, x)
    assert out.shape == x.shape
    # oracle via torch's exact gelu
    h = np.asarray(x) @ np.asarray(p["proj_in"]["kernel"]) + np.asarray(p["proj_in"]["bias"])
    a, g = np.split(h, 2, axis=-1)
    ref_h = torch.from_numpy(a) * torch.nn.functional.gelu(torch.from_numpy(g))
    ref = ref_h.numpy() @ np.asarray(p["proj_out"]["kernel"]) + np.asarray(p["proj_out"]["bias"])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
