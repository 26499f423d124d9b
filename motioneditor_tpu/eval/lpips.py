"""LPIPS perceptual distance (AlexNet backbone), JAX.

The paper's perceptual-quality metric (BASELINE.md north star: LPIPS parity).
Architecture follows Zhang et al. 2018: AlexNet conv features at 5 taps,
unit-normalized per channel, squared differences weighted by learned 1x1
"lin" layers, spatially averaged and summed.

Weights: ``port_lpips_alexnet(alexnet_sd, lpips_sd)`` converts torchvision
alexnet.features + the lpips linear calibration weights. Without local
checkpoints the functional form still runs on random weights (useful for
shape tests only).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (out_ch, kernel, stride, pad) of torchvision alexnet.features convs
ALEX_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# maxpool after taps 0, 1 (3x3 stride 2)
POOL_AFTER = (0, 1)

SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def init_lpips(key):
    keys = iter(jax.random.split(key, 16))
    in_ch = 3
    convs = []
    lins = []
    for (out_ch, k, s, p) in ALEX_CONVS:
        w = jax.random.normal(next(keys), (k, k, in_ch, out_ch)) * 0.02
        b = jnp.zeros((out_ch,))
        convs.append({"kernel": w, "bias": b})
        lins.append({"kernel": jnp.abs(jax.random.normal(next(keys), (out_ch, 1))) * 0.01})
        in_ch = out_ch
    return {"convs": convs, "lins": lins}


def _alexnet_features(params, x) -> List[jnp.ndarray]:
    feats = []
    for i, ((out_ch, k, s, p), cp) in enumerate(zip(ALEX_CONVS, params["convs"])):
        x = jax.lax.conv_general_dilated(
            x, cp["kernel"].astype(x.dtype), (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + cp["bias"].astype(x.dtype)
        x = jax.nn.relu(x)
        feats.append(x)
        if i in POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips(params, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a/b: [N, H, W, 3] in [0, 1]. Returns mean LPIPS distance."""
    def norm_input(x):
        x = x.astype(jnp.float32) * 2.0 - 1.0
        return (x - SHIFT) / SCALE

    fa = _alexnet_features(params, norm_input(a))
    fb = _alexnet_features(params, norm_input(b))
    total = 0.0
    for xa, xb, lin in zip(fa, fb, params["lins"]):
        na = xa / jnp.maximum(jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10)
        nb = xb / jnp.maximum(jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10)
        d2 = (na - nb) ** 2
        w = jnp.maximum(lin["kernel"], 0.0)  # lpips lins are non-negative
        total = total + (d2 @ w).mean(axis=(1, 2, 3))
    return total.mean()


def port_lpips_alexnet(alexnet_sd, lpips_sd) -> dict:
    """torchvision alexnet.features + lpips 'alex' linear weights -> params.

    alexnet_sd keys: features.{0,3,6,8,10}.{weight,bias} (OIHW)
    lpips_sd keys:   lin{0..4}.model.1.weight ([1, C, 1, 1])
    """
    conv_ids = (0, 3, 6, 8, 10)
    convs = []
    for cid in conv_ids:
        w = np.asarray(alexnet_sd[f"features.{cid}.weight"]).transpose(2, 3, 1, 0)
        b = np.asarray(alexnet_sd[f"features.{cid}.bias"])
        convs.append({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)})
    lins = []
    for i in range(5):
        w = np.asarray(lpips_sd[f"lin{i}.model.1.weight"])[0, :, 0, 0]
        lins.append({"kernel": jnp.asarray(w[:, None])})
    return {"convs": convs, "lins": lins}
