import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.schedulers import (
    DiffusionSchedule,
    cfg_combine,
    ddim_inverse_step,
    ddim_step,
    ddpm_add_noise,
)


def _torch_like_alphas():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    return np.cumprod(1 - betas)


def test_schedule_matches_sd15_config():
    s = DiffusionSchedule()
    acp = np.asarray(s.alphas_cumprod)
    ref = _torch_like_alphas()
    np.testing.assert_allclose(acp, ref, rtol=1e-5)
    assert float(s.final_alpha_cumprod) == acp[0]


def test_inference_timesteps_offset():
    s = DiffusionSchedule()
    ts = s.inference_timesteps(50)
    assert ts[0] == 981 and ts[-1] == 1
    assert len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_ddim_roundtrip_identity_model():
    """With a model that always predicts the same eps, invert then denoise
    must return the original latent (closed-form DDIM is exactly invertible
    when the model output matches at each step)."""
    s = DiffusionSchedule()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 2, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)

    n = 50
    ts = s.inference_timesteps(n)
    # invert: ascend
    lat = x0
    fwd = [lat]
    for i in range(n):
        t = jnp.asarray(ts[n - i - 1])
        lat = ddim_inverse_step(s, eps, t, lat, n)
        fwd.append(lat)
    # denoise: descend
    for i in range(n):
        t = jnp.asarray(ts[i])
        lat = ddim_step(s, eps, t, lat, n)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(x0), atol=1e-3, rtol=1e-3)


def test_ddim_step_formula():
    s = DiffusionSchedule()
    acp = np.asarray(s.alphas_cumprod)
    x = np.ones((1, 4)) * 0.5
    eps = np.ones((1, 4)) * 0.1
    t = 981
    prev_t = 961
    a_t, a_p = acp[t], acp[prev_t]
    x0 = (x - (1 - a_t) ** 0.5 * eps) / a_t**0.5
    expected = a_p**0.5 * x0 + (1 - a_p) ** 0.5 * eps
    got = ddim_step(s, jnp.asarray(eps), jnp.asarray(t), jnp.asarray(x), 50)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)


def test_add_noise_broadcast():
    s = DiffusionSchedule()
    x = jnp.ones((2, 3, 4, 4, 4))
    noise = jnp.zeros_like(x)
    t = jnp.asarray([0, 999])
    out = ddpm_add_noise(s, x, noise, t)
    acp = np.asarray(s.alphas_cumprod)
    np.testing.assert_allclose(np.asarray(out[0]), acp[0] ** 0.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), acp[999] ** 0.5, rtol=1e-5)


def test_cfg_combine():
    uncond = jnp.stack([jnp.zeros((2, 2)), jnp.ones((2, 2))])
    cond = jnp.stack([jnp.ones((2, 2)) * 2, jnp.ones((2, 2)) * 3])
    pred = jnp.concatenate([uncond, cond], axis=0)
    out = cfg_combine(pred, 7.5)
    np.testing.assert_allclose(np.asarray(out[0]), 0 + 7.5 * 2)
    np.testing.assert_allclose(np.asarray(out[1]), 1 + 7.5 * 2)
