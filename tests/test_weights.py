import numpy as np
import jax
import jax.numpy as jnp

from motioneditor_tpu.models import weights as W


def test_lin_conv_norm_transposes():
    rs = np.random.RandomState(0)
    sd = {
        "l.weight": rs.randn(6, 4).astype(np.float32),
        "l.bias": rs.randn(6).astype(np.float32),
        "c.weight": rs.randn(8, 3, 3, 3).astype(np.float32),
        "c.bias": rs.randn(8).astype(np.float32),
        "t.weight": rs.randn(5, 5, 3).astype(np.float32),
        "t.bias": rs.randn(5).astype(np.float32),
        "n.weight": rs.randn(7).astype(np.float32),
        "n.bias": rs.randn(7).astype(np.float32),
    }
    lin = W._lin(sd, "l")
    assert lin["kernel"].shape == (4, 6)
    np.testing.assert_array_equal(np.asarray(lin["kernel"]), sd["l.weight"].T)
    conv = W._conv(sd, "c")
    assert conv["kernel"].shape == (3, 3, 3, 8)  # HWIO from OIHW
    np.testing.assert_array_equal(
        np.asarray(conv["kernel"]), sd["c.weight"].transpose(2, 3, 1, 0)
    )
    c1 = W._conv1d(sd, "t")
    assert c1["kernel"].shape == (3, 5, 5)  # WIO from OIW
    norm = W._norm(sd, "n")
    np.testing.assert_array_equal(np.asarray(norm["scale"]), sd["n.weight"])


def test_port_adapter_roundtrip_matches_init_structure():
    """A synthetic reference-format adapter state dict must port into the
    exact structure init_control_adapter builds (so inference.py:238-240
    adapter loading works)."""
    from motioneditor_tpu.models.adapter import init_control_adapter

    target = init_control_adapter(jax.random.PRNGKey(0), (32, 64, 64, 64))
    rs = np.random.RandomState(0)
    sd = {}
    for i, block in enumerate(target["body"]):
        ch = block["norm_temp"]["scale"].shape[0]
        pre = f"body.{i}"
        sd[f"{pre}.block1.weight"] = rs.randn(ch, ch, 3).astype(np.float32)
        sd[f"{pre}.block1.bias"] = rs.randn(ch).astype(np.float32)
        sd[f"{pre}.block2.weight"] = rs.randn(ch, ch, 1).astype(np.float32)
        sd[f"{pre}.block2.bias"] = rs.randn(ch).astype(np.float32)
        for nm in ("norm_temp", "cross_pose_norm", "ff_norm", "norm_self_temp"):
            sd[f"{pre}.{nm}.weight"] = rs.randn(ch).astype(np.float32)
            sd[f"{pre}.{nm}.bias"] = rs.randn(ch).astype(np.float32)
        for attn in ("attn_temp", "attn_pose", "attn_self_temp"):
            for proj in ("to_q", "to_k", "to_v"):
                sd[f"{pre}.{attn}.{proj}.weight"] = rs.randn(ch, ch).astype(np.float32)
            sd[f"{pre}.{attn}.to_out.0.weight"] = rs.randn(ch, ch).astype(np.float32)
            sd[f"{pre}.{attn}.to_out.0.bias"] = rs.randn(ch).astype(np.float32)
        sd[f"{pre}.ff.net.0.proj.weight"] = rs.randn(ch * 8, ch).astype(np.float32)
        sd[f"{pre}.ff.net.0.proj.bias"] = rs.randn(ch * 8).astype(np.float32)
        sd[f"{pre}.ff.net.2.weight"] = rs.randn(ch, ch * 4).astype(np.float32)
        sd[f"{pre}.ff.net.2.bias"] = rs.randn(ch).astype(np.float32)

    ported = W.port_adapter(sd)
    t_struct = jax.tree_util.tree_structure(target)
    p_struct = jax.tree_util.tree_structure(ported)
    assert t_struct == p_struct
    for tl, pl in zip(jax.tree_util.tree_leaves(target), jax.tree_util.tree_leaves(ported)):
        assert tl.shape == pl.shape


def test_port_clip_text_structure():
    from motioneditor_tpu.models.clip_text import CLIPTextConfig, init_clip_text

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=16, num_layers=2, num_heads=4,
                         intermediate_size=32, max_position_embeddings=10)
    target = init_clip_text(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    sd = {
        "text_model.embeddings.token_embedding.weight": rs.randn(100, 16).astype(np.float32),
        "text_model.embeddings.position_embedding.weight": rs.randn(10, 16).astype(np.float32),
        "text_model.final_layer_norm.weight": rs.randn(16).astype(np.float32),
        "text_model.final_layer_norm.bias": rs.randn(16).astype(np.float32),
    }
    for i in range(2):
        lp = f"text_model.encoder.layers.{i}"
        for nm in ("layer_norm1", "layer_norm2"):
            sd[f"{lp}.{nm}.weight"] = rs.randn(16).astype(np.float32)
            sd[f"{lp}.{nm}.bias"] = rs.randn(16).astype(np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{lp}.self_attn.{proj}.weight"] = rs.randn(16, 16).astype(np.float32)
            sd[f"{lp}.self_attn.{proj}.bias"] = rs.randn(16).astype(np.float32)
        sd[f"{lp}.mlp.fc1.weight"] = rs.randn(32, 16).astype(np.float32)
        sd[f"{lp}.mlp.fc1.bias"] = rs.randn(32).astype(np.float32)
        sd[f"{lp}.mlp.fc2.weight"] = rs.randn(16, 32).astype(np.float32)
        sd[f"{lp}.mlp.fc2.bias"] = rs.randn(16).astype(np.float32)

    ported = W.port_clip_text(sd)
    assert jax.tree_util.tree_structure(ported) == jax.tree_util.tree_structure(target)
    for tl, pl in zip(jax.tree_util.tree_leaves(target), jax.tree_util.tree_leaves(ported)):
        assert tl.shape == pl.shape


def test_merge_keeps_zero_init_temporal_modules():
    """Porting a 2D checkpoint over a video pytree must leave the temporal
    modules zero-initialized (the inflation identity invariant)."""
    base = {"a": {"kernel": jnp.ones((2, 2))}, "temp": {"kernel": jnp.zeros((3,))}}
    overlay = {"a": {"kernel": jnp.full((2, 2), 5.0)}}
    merged = W._merge(dict(base), overlay)
    np.testing.assert_array_equal(np.asarray(merged["a"]["kernel"]), 5.0)
    np.testing.assert_array_equal(np.asarray(merged["temp"]["kernel"]), 0.0)
