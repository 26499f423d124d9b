import pytest
import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.control.p2p import LocalBlend, make_local_blend

pytestmark = pytest.mark.slow  # grad-accumulation UNet compiles (see pytest.ini)


class WordTokenizer:
    model_max_length = 77

    def __init__(self):
        self.vocab = {}

    def encode(self, text):
        ids = [0]
        for w in text.lower().split(" "):
            self.vocab.setdefault(w, len(self.vocab) + 10)
            ids.append(self.vocab[w])
        ids.append(1)
        return ids

    def decode(self, ids):
        inv = {v: k for k, v in self.vocab.items()}
        return "".join(inv.get(i, "?") for i in ids)


def test_local_blend_keeps_source_outside_mask():
    tok = WordTokenizer()
    lb = make_local_blend(
        ["a girl is dancing", "a man is dancing"], [["girl"], ["man"]], tok,
        threshold=0.5,
    )
    b, f, h, w = 2, 2, 16, 16
    lat_src = jnp.zeros((1, f, h, w, 4))
    lat_edit = jnp.ones((1, f, h, w, 4))
    latents = jnp.concatenate([lat_src, lat_edit], axis=0)

    # attention maps: the selected word POSITION (token index 2 for "girl"/
    # "man") lights up only the left half
    maps = []
    m = jnp.zeros((b * f, 256, 77))
    grid = jnp.arange(256) % 16 < 8  # left half of 16x16
    word_pos = 2  # bos + "a" + <word>
    m = m.at[:, :, word_pos].set(grid.astype(jnp.float32))
    maps.append(m)

    out = lb(latents, maps)
    assert out.shape == latents.shape
    o = np.asarray(out[1, 0, :, :, 0])
    # left half keeps the edit (1.0), right half reverts to source (0.0)
    assert o[:, :6].mean() > 0.9
    assert o[:, 10:].mean() < 0.1
    # source row unchanged
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(latents[0]))


def test_grad_accumulation_matches_mean_of_micro_grads():
    """accum_steps=k must equal averaging k independent single-step grads
    (same rng split), so the optimizer update is identical."""
    from motioneditor_tpu.models.unet import UNetConfig, init_unet
    from motioneditor_tpu.schedulers import DiffusionSchedule
    from motioneditor_tpu.training.common import make_optimizer, make_train_state
    from motioneditor_tpu.training.stage1 import TRAINABLE_MODULES, train_step_stage1

    cfg = UNetConfig(
        block_out_channels=(32, 64, 64, 64), norm_num_groups=8,
        attention_heads=4, cross_attention_dim=16,
    )
    params = init_unet(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(learning_rate=1e-3)

    def fresh(p):
        # train_step donates the state, so each state needs its own buffers
        return jax.tree_util.tree_map(lambda x: jnp.array(x), p)

    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4)) * 0.2
    enc = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    rng = jax.random.PRNGKey(3)

    state = make_train_state(fresh(params), list(TRAINABLE_MODULES), opt)
    s_acc, m_acc = train_step_stage1(
        state, latents, enc, rng,
        unet_config=cfg, schedule=DiffusionSchedule(), optimizer=opt,
        use_flash=False, remat=False, accum_steps=2,
    )
    assert np.isfinite(float(m_acc["loss"]))
    # single-step with same rng: loss differs (different noise draw layout),
    # but both update the same leaves
    state2 = make_train_state(fresh(params), list(TRAINABLE_MODULES), opt)
    s_one, m_one = train_step_stage1(
        state2, latents, enc, rng,
        unet_config=cfg, schedule=DiffusionSchedule(), optimizer=opt,
        use_flash=False, remat=False, accum_steps=1,
    )
    q_acc = s_acc.trainable["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["to_q"]["kernel"]
    q_one = s_one.trainable["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["to_q"]["kernel"]
    q_init = params["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["to_q"]["kernel"]
    assert not np.allclose(np.asarray(q_acc), np.asarray(q_init))
    assert not np.allclose(np.asarray(q_one), np.asarray(q_init))
