"""End-to-end prompt-to-prompt wiring: the prob-editor hook on
cross-attention, the self-attn map replacement, and LocalBlend inside the
denoise scan (reference surface: ptp_utils.py:160-278, p2p_stable.py:129-212,
prepare_control at inference.py:74-99)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioneditor_tpu.control.p2p import (
    P2PController,
    make_controller,
    make_local_blend,
)
from motioneditor_tpu.models.clip_text import (
    CLIPTextConfig,
    StubTokenizer,
    init_clip_text,
)
from motioneditor_tpu.models.controlnet import init_controlnet
from motioneditor_tpu.models.unet import UNetConfig, init_unet
from motioneditor_tpu.models.vae import VAEConfig, init_vae
from motioneditor_tpu.pipelines.editor import MotionEditorPipeline

from test_p2p import WordTokenizer

pytestmark = pytest.mark.slow  # pipeline-level p2p compiles (see pytest.ini)


# -- prob editor vs. a direct numpy oracle of p2p_stable.py math ------------


def _oracle_cross(probs, controller, step):
    """AttentionControlEdit.forward for is_cross (p2p_stable.py:145-155):
    conditional half only; edit row blended toward the mapped base row."""
    out = np.array(probs)
    base, edit = out[2], out[3]
    alpha = controller.cross_alpha[step, 0]  # [1, 1, 77]
    if controller.kind == "replace":
        replaced = np.einsum("...pw,wn->...pn", base, controller.mapper[0])
    elif controller.kind == "refine":
        m = np.maximum(controller.mapper[0], 0)
        replaced = (
            base[..., m] * controller.refine_alphas[0]
            + edit * (1 - controller.refine_alphas[0])
        )
    else:  # reweight scales the BASE map (p2p_stable.py:203-206)
        replaced = base * controller.equalizer[0]
    out[3] = alpha * replaced + (1 - alpha) * edit
    return out


def test_cross_editor_matches_oracle_replace():
    tok = WordTokenizer()
    c = make_controller(
        ["a girl is dancing", "a man is dancing"], tok, 10,
        cross_replace_steps=0.8, self_replace_steps=0.4,
    )
    assert c.kind == "replace"
    rs = np.random.RandomState(0)
    probs = rs.dirichlet(np.ones(77), size=(4, 2, 3, 8)).astype(np.float32)
    for step in (0, 5, 9):  # inside and outside the 0.8*10 window
        editor = c.prob_editor(jnp.asarray(step))
        out = np.asarray(editor(jnp.asarray(probs), True))
        np.testing.assert_allclose(out, _oracle_cross(probs, c, step), atol=1e-6)
        # uncond rows and the base row are untouched
        np.testing.assert_array_equal(out[:3], probs[:3])


def test_cross_editor_matches_oracle_refine_and_reweight():
    tok = WordTokenizer()
    refine = make_controller(
        ["a girl is dancing", "a girl is dancing outside"], tok, 10
    )
    assert refine.kind == "refine"
    reweight = make_controller(
        ["a girl is dancing", "a girl is dancing"], tok, 10,
        equalizer_words=["girl"], equalizer_values=[2.0],
    )
    assert reweight.kind == "reweight"
    rs = np.random.RandomState(1)
    probs = rs.dirichlet(np.ones(77), size=(4, 2, 2, 4)).astype(np.float32)
    for c in (refine, reweight):
        editor = c.prob_editor(jnp.asarray(3))
        out = np.asarray(editor(jnp.asarray(probs), True))
        np.testing.assert_allclose(out, _oracle_cross(probs, c, 3), atol=1e-6)


def test_self_editor_replacement_window_and_size_gate():
    tok = WordTokenizer()
    c = make_controller(["a girl is dancing", "a man is dancing"], tok, 10,
                        self_replace_steps=0.4)
    rs = np.random.RandomState(2)
    small = rs.rand(4, 2, 3, 256, 256).astype(np.float32)  # q=256 -> edited
    big = rs.rand(4, 2, 3, 1024, 1024).astype(np.float32)  # q>256 -> untouched
    # step 1 < 0.4*10: edit row replaced by base row
    out = np.asarray(c.prob_editor(jnp.asarray(1))(jnp.asarray(small), False))
    np.testing.assert_allclose(out[3], small[2], atol=1e-6)
    np.testing.assert_array_equal(out[:3], small[:3])
    # step 7 >= 4: untouched
    out7 = np.asarray(c.prob_editor(jnp.asarray(7))(jnp.asarray(small), False))
    np.testing.assert_array_equal(out7, small)
    # q > 16^2 never replaced (p2p_stable.py:135-139)
    outb = np.asarray(c.prob_editor(jnp.asarray(1))(jnp.asarray(big), False))
    np.testing.assert_array_equal(outb, big)


# -- end-to-end pipeline smoke ----------------------------------------------

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    norm_num_groups=8,
    attention_heads=4,
    cross_attention_dim=24,
    use_sc_attn=True,
)
TINY_VAE = VAEConfig(block_out_channels=(16, 16, 32, 32), norm_num_groups=4)
TINY_TEXT = CLIPTextConfig(
    vocab_size=50000, hidden_size=24, num_layers=2, num_heads=4,
    intermediate_size=48, max_position_embeddings=77,
)


@pytest.fixture(scope="module")
def pipe():
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    return MotionEditorPipeline(
        unet_params=init_unet(keys[0], TINY_UNET),
        vae_params=init_vae(keys[1], TINY_VAE),
        text_params=init_clip_text(keys[2], TINY_TEXT),
        controlnet_params=init_controlnet(
            keys[3],
            dataclasses.replace(TINY_UNET, video=False, use_sc_attn=False),
        ),
        tokenizer=StubTokenizer(),
        unet_config=TINY_UNET,
        vae_config=TINY_VAE,
        text_config=TINY_TEXT,
        use_flash=False,
    )


@pytest.mark.slow
def test_p2p_edit_end_to_end(pipe):
    """AttentionReplace + LocalBlend through the denoise scan: the edit
    branch changes, the reconstruction branch is bit-stable (p2p edits only
    the conditional edit row; LocalBlend keeps row 0, p2p_stable.py:31-32)."""
    f = 2
    prompts = ["a girl is dancing", "a man is dancing"]
    # 16x16 latents so the 256-token map collection sites exist for LocalBlend
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, f, 16, 16, 4)) * 0.2
    seed = jnp.concatenate([lat, lat], axis=0)
    skel = jax.random.uniform(jax.random.PRNGKey(2), (f, 128, 128, 3))
    masks = (jax.random.uniform(jax.random.PRNGKey(3), (f, 128, 128)) > 0.5).astype(
        jnp.float32
    )
    controller = make_controller(
        prompts, pipe.tokenizer, 4, cross_replace_steps=0.8, self_replace_steps=0.4
    )
    assert controller.kind == "replace"
    blend = make_local_blend(prompts, [["man"], ["man"]], pipe.tokenizer)
    kwargs = dict(
        source_masks=masks,
        num_inference_steps=4,
        start_step=2,
        start_layer=10,
        decode=False,
    )
    out_p2p = pipe(prompts, seed, skel, p2p_controller=controller,
                   local_blend=blend, **kwargs)
    out_plain = pipe(prompts, seed, skel, **kwargs)
    assert out_p2p.shape == seed.shape
    assert np.isfinite(np.asarray(out_p2p)).all()
    # reconstruction branch (row 0) unaffected by p2p + LocalBlend
    np.testing.assert_allclose(
        np.asarray(out_p2p[0]), np.asarray(out_plain[0]), atol=1e-5
    )
    # the edit branch must actually change
    assert not np.allclose(np.asarray(out_p2p[1]), np.asarray(out_plain[1]), atol=1e-5)
