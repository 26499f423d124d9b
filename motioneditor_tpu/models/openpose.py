"""Functional OpenPose body estimator — JAX port of the skeleton stage.

The reference extracts per-frame skeleton conditions through controlnet_aux's
OpenposeDetector (data_preparation/video_skeletons.py:13-21, :63-83), which
wraps the CMU two-branch body network (pytorch-openpose ``body.py``): a
truncated VGG-19 feature stem followed by six refinement stages that each
emit 38 part-affinity-field (PAF) channels and 19 keypoint heatmap channels.
This module re-implements that stack in the repo's functional style (param
pytrees, NHWC, pure functions) plus the host-side decoding — heatmap peak
extraction, PAF limb scoring, greedy multi-person assembly — and the
skeleton rendering that produces the PNGs the ControlNet conditioning
expects.

TPU notes: the network is all 3x3/7x7 convs at 1/8 resolution — pure MXU
work; one jit per input shape (a video's frames share one shape, so the
whole clip compiles once). Decoding and drawing are tiny host-side numpy,
matching the L1 "host-side preprocessing" layering of SURVEY.md.

Weight mapping accepts the pytorch-openpose ``body_pose_model.pth`` layout
(``model0.conv1_1.weight`` / ``model{t}_{b}.Mconv1_stage{t}_L{b}.weight``,
OIHW) used by the lllyasviel/Annotators checkpoint controlnet_aux loads.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.models.layers import conv2d, init_conv2d

# ---------------------------------------------------------------------------
# architecture tables (pytorch-openpose body.py make_layers blocks)
# ---------------------------------------------------------------------------

# name -> (in_ch, out_ch, kernel, followed_by_relu); "pool" entries downsample.
_STEM: Tuple = (
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3), "pool1",
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3), "pool2",
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3), "pool3",
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3_CPM", 512, 256, 3), ("conv4_4_CPM", 256, 128, 3),
)

N_PAF = 38
N_HEAT = 19
_STAGE1_OUT = {1: N_PAF, 2: N_HEAT}
STRIDE = 8  # three 2x2 pools


def _stage1_layers(branch: int) -> List[Tuple[str, int, int, int]]:
    s = f"_CPM_L{branch}"
    return [
        (f"conv5_1{s}", 128, 128, 3), (f"conv5_2{s}", 128, 128, 3),
        (f"conv5_3{s}", 128, 128, 3), (f"conv5_4{s}", 128, 512, 1),
        (f"conv5_5{s}", 512, _STAGE1_OUT[branch], 1),
    ]


def _stageT_layers(stage: int, branch: int) -> List[Tuple[str, int, int, int]]:
    s = f"_stage{stage}_L{branch}"
    cin = N_PAF + N_HEAT + 128
    return [
        (f"Mconv1{s}", cin, 128, 7), (f"Mconv2{s}", 128, 128, 7),
        (f"Mconv3{s}", 128, 128, 7), (f"Mconv4{s}", 128, 128, 7),
        (f"Mconv5{s}", 128, 128, 7), (f"Mconv6{s}", 128, 128, 1),
        (f"Mconv7{s}", 128, _STAGE1_OUT[branch], 1),
    ]


def _branch_layers(stage: int, branch: int):
    return _stage1_layers(branch) if stage == 1 else _stageT_layers(stage, branch)


def init_body_params(key) -> Dict:
    """Random-init pytree with the torch module structure (for tests)."""
    params: Dict = {"model0": {}}
    for item in _STEM:
        if isinstance(item, str):
            continue
        name, cin, cout, k = item
        key, sub = jax.random.split(key)
        params["model0"][name] = init_conv2d(sub, cin, cout, k)
    for stage in range(1, 7):
        for branch in (1, 2):
            mod = f"model{stage}_{branch}"
            params[mod] = {}
            for name, cin, cout, k in _branch_layers(stage, branch):
                key, sub = jax.random.split(key)
                params[mod][name] = init_conv2d(sub, cin, cout, k)
    return params


def _body_module_for_layer(layer: str) -> str:
    """Derive the torch sub-module name from a body layer name — the
    on-disk ``body_pose_model.pth`` (lllyasviel/Annotators) stores
    prefix-STRIPPED keys (``conv1_1.weight``); the reference stack re-adds
    the module prefix via util.transfer() against model.state_dict()."""
    if layer.startswith(("conv1_", "conv2_", "conv3_", "conv4_")):
        return "model0"
    if layer.startswith("conv5_") and "_CPM_L" in layer:
        return f"model1_{layer.rsplit('L', 1)[1]}"
    if layer.startswith("Mconv") and "_stage" in layer:
        stage, branch = layer.rsplit("_stage", 1)[1].split("_L")
        return f"model{stage}_{branch}"
    raise ValueError(f"unexpected body checkpoint layer {layer!r}")


def convert_body_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """pytorch-openpose Body state dict (OIHW) -> param pytree (HWIO).

    Accepts BOTH key layouts: the module-prefixed form a torch mirror's
    state_dict() emits (``model0.conv1_1.weight``) and the prefix-stripped
    form the real checkpoint stores (``conv1_1.weight``,
    ``Mconv1_stage2_L1.weight``) — the layer name alone determines the
    module (see _body_module_for_layer)."""
    params: Dict = {}
    for key, value in sd.items():
        parts = key.split(".")
        if len(parts) == 3 and parts[2] in ("weight", "bias"):
            mod, layer, kind = parts
        elif len(parts) == 2 and parts[1] in ("weight", "bias"):
            layer, kind = parts
            mod = _body_module_for_layer(layer)
        else:
            raise ValueError(f"unexpected body checkpoint key {key!r}")
        value = np.asarray(value)
        entry = params.setdefault(mod, {}).setdefault(layer, {})
        if kind == "weight":
            entry["kernel"] = jnp.asarray(value.transpose(2, 3, 1, 0))
        else:
            entry["bias"] = jnp.asarray(value)
    return params


def _run_layers(params: Dict, layers: Sequence, x: jnp.ndarray) -> jnp.ndarray:
    last = layers[-1][0] if isinstance(layers[-1], tuple) else None
    for item in layers:
        if isinstance(item, str):  # 2x2 stride-2 max pool
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        name = item[0]
        x = conv2d(params[name], x, padding=item[3] // 2)
        if name != last or name.startswith(("conv1", "conv2", "conv3", "conv4")):
            x = jax.nn.relu(x)
    return x


def body_forward(params: Dict, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, H, W, 3] (H, W multiples of 8), already ``img/256 - 0.5``.

    Returns (paf [B, H/8, W/8, 38], heatmap [B, H/8, W/8, 19]) — the stage-6
    Mconv7 outputs, matching body.py's ``Mconv7_stage6_L1/L2``.
    """
    feat = _run_layers(params["model0"], _STEM, x)
    paf = _run_layers(params["model1_1"], _stage1_layers(1), feat)
    heat = _run_layers(params["model1_2"], _stage1_layers(2), feat)
    for stage in range(2, 7):
        inp = jnp.concatenate([paf, heat, feat], axis=-1)
        paf = _run_layers(params[f"model{stage}_1"], _stageT_layers(stage, 1), inp)
        heat = _run_layers(params[f"model{stage}_2"], _stageT_layers(stage, 2), inp)
    return paf, heat


_jit_body_forward = jax.jit(body_forward)


# ---------------------------------------------------------------------------
# host-side decoding (body.py __call__ post-processing, numpy)
# ---------------------------------------------------------------------------

# limb part pairs (1-indexed) and their PAF channel pairs (body.py limbSeq /
# mapIdx, with the reference's +19 offset already removed).
LIMB_SEQ = np.array([
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18], [3, 17], [6, 18],
])
MAP_IDX = np.array([
    [12, 13], [20, 21], [14, 15], [16, 17], [22, 23], [24, 25], [0, 1],
    [2, 3], [4, 5], [6, 7], [8, 9], [10, 11], [28, 29], [30, 31], [34, 35],
    [32, 33], [36, 37], [18, 19], [26, 27],
])


def gaussian_blur(x: np.ndarray, sigma: float = 3.0) -> np.ndarray:
    """Separable reflect-padded gaussian (scipy.ndimage.gaussian_filter
    semantics: truncate=4.0) on a 2D map."""
    radius = int(4.0 * sigma + 0.5)
    t = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k /= k.sum()
    # scipy's "reflect" boundary == numpy's "symmetric" (edge repeated)
    pad = np.pad(x.astype(np.float64), radius, mode="symmetric")
    out = np.apply_along_axis(lambda r: np.convolve(r, k, mode="valid"), 1, pad)
    out = np.apply_along_axis(lambda c: np.convolve(c, k, mode="valid"), 0, out)
    return out


def find_peaks(heatmap: np.ndarray, thre1: float = 0.1):
    """Per-part local maxima (body.py peak loop): for each of the 18 parts,
    peaks where the blurred map exceeds its 4 neighbours and thre1.
    Returns list (len 18) of [x, y, score, peak_id] arrays; scores are read
    from the UNBLURRED map, as the reference does."""
    all_peaks = []
    peak_counter = 0
    for part in range(N_HEAT - 1):
        map_ori = heatmap[:, :, part]
        m = gaussian_blur(map_ori)
        up = np.zeros_like(m); up[1:, :] = m[:-1, :]
        down = np.zeros_like(m); down[:-1, :] = m[1:, :]
        left = np.zeros_like(m); left[:, 1:] = m[:, :-1]
        right = np.zeros_like(m); right[:, :-1] = m[:, 1:]
        binary = (m >= up) & (m >= down) & (m >= left) & (m >= right) & (m > thre1)
        ys, xs = np.nonzero(binary)
        peaks = [
            (x, y, float(map_ori[y, x]), peak_counter + i)
            for i, (x, y) in enumerate(zip(xs, ys))
        ]
        peak_counter += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def score_limbs(paf: np.ndarray, all_peaks, img_h: int, thre2: float = 0.05):
    """PAF line-integral limb scoring + greedy per-type matching
    (body.py connection loop). Returns connection_all, special_k."""
    mid_num = 10
    connection_all = []
    special_k = []
    for k in range(len(MAP_IDX)):
        score_mid = paf[:, :, MAP_IDX[k]]
        cand_a = all_peaks[LIMB_SEQ[k][0] - 1]
        cand_b = all_peaks[LIMB_SEQ[k][1] - 1]
        if not cand_a or not cand_b:
            special_k.append(k)
            connection_all.append([])
            continue
        candidates = []
        for i, a in enumerate(cand_a):
            for j, b in enumerate(cand_b):
                vec = np.subtract(b[:2], a[:2], dtype=np.float64)
                norm = max(math.sqrt(vec @ vec), 1e-8)
                vecn = vec / norm
                xs = np.linspace(a[0], b[0], num=mid_num)
                ys = np.linspace(a[1], b[1], num=mid_num)
                pts = np.stack([np.round(ys), np.round(xs)], -1).astype(int)
                vec_paf = score_mid[pts[:, 0], pts[:, 1]]  # [mid, 2]
                score_midpts = vec_paf @ vecn
                prior = score_midpts.mean() + min(0.5 * img_h / norm - 1, 0)
                crit1 = np.count_nonzero(score_midpts > thre2) > 0.8 * mid_num
                if crit1 and prior > 0:
                    candidates.append(
                        (i, j, prior, prior + a[2] + b[2])
                    )
        candidates.sort(key=lambda c: c[2], reverse=True)
        connection = []
        used_a, used_b = set(), set()
        for i, j, s, _ in candidates:
            if i in used_a or j in used_b:
                continue
            connection.append([cand_a[i][3], cand_b[j][3], s, i, j])
            used_a.add(i); used_b.add(j)
            if len(connection) >= min(len(cand_a), len(cand_b)):
                break
        connection_all.append(np.array(connection, dtype=np.float64))
    return connection_all, special_k


def assemble_subsets(all_peaks, connection_all, special_k):
    """Greedy multi-person assembly (body.py subset loop). Returns
    (candidate [num_peaks, 4], subset [num_people, 20])."""
    flat = [p for part in all_peaks for p in part]
    candidate = np.array(flat, dtype=np.float64).reshape(-1, 4)
    subset = np.empty((0, 20), dtype=np.float64)
    for k in range(len(MAP_IDX)):
        if k in special_k or len(connection_all[k]) == 0:
            continue
        part_as = connection_all[k][:, 0]
        part_bs = connection_all[k][:, 1]
        idx_a, idx_b = LIMB_SEQ[k] - 1
        for i in range(len(connection_all[k])):
            found = 0
            subset_idx = [-1, -1]
            for j in range(len(subset)):
                if subset[j][idx_a] == part_as[i] or subset[j][idx_b] == part_bs[i]:
                    subset_idx[found] = j
                    found += 1
            if found == 1:
                j = subset_idx[0]
                if subset[j][idx_b] != part_bs[i]:
                    subset[j][idx_b] = part_bs[i]
                    subset[j][-1] += 1
                    subset[j][-2] += candidate[int(part_bs[i]), 2] + connection_all[k][i][2]
            elif found == 2:
                j1, j2 = subset_idx
                membership = ((subset[j1] >= 0).astype(int) + (subset[j2] >= 0).astype(int))[:-2]
                if not np.any(membership == 2):  # disjoint -> merge
                    subset[j1][:-2] += subset[j2][:-2] + 1
                    subset[j1][-2:] += subset[j2][-2:]
                    subset[j1][-2] += connection_all[k][i][2]
                    subset = np.delete(subset, j2, 0)
                else:
                    subset[j1][idx_b] = part_bs[i]
                    subset[j1][-1] += 1
                    subset[j1][-2] += candidate[int(part_bs[i]), 2] + connection_all[k][i][2]
            elif found == 0 and k < 17:
                row = -1 * np.ones(20)
                row[idx_a] = part_as[i]
                row[idx_b] = part_bs[i]
                row[-1] = 2
                row[-2] = (
                    candidate[connection_all[k][i, :2].astype(int), 2].sum()
                    + connection_all[k][i][2]
                )
                subset = np.vstack([subset, row])
    keep = [
        i for i in range(len(subset))
        if subset[i][-1] >= 4 and subset[i][-2] / subset[i][-1] >= 0.4
    ]
    return candidate, subset[keep]


# ---------------------------------------------------------------------------
# end-to-end estimation + rendering
# ---------------------------------------------------------------------------

def _resize_np(img: np.ndarray, h: int, w: int) -> np.ndarray:
    out = jax.image.resize(jnp.asarray(img, jnp.float32), (h, w) + img.shape[2:], "cubic")
    return np.asarray(out)


def _pad_to_stride(img: np.ndarray, pad_value: float = 0.0):
    h, w = img.shape[:2]
    ph = (STRIDE - h % STRIDE) % STRIDE
    pw = (STRIDE - w % STRIDE) % STRIDE
    if ph or pw:  # pad right/down (body.py padRightDownCorner, padValue 128/256-0.5)
        img = np.pad(
            img, ((0, ph), (0, pw), (0, 0)), mode="constant", constant_values=pad_value
        )
    return img, (ph, pw)


def estimate_body(
    params: Dict,
    image_rgb: np.ndarray,
    boxsize: int = 368,
    scale_search: Sequence[float] = (0.5,),
    thre1: float = 0.1,
    thre2: float = 0.05,
):
    """Full body estimation on one uint8 RGB frame (body.py __call__).

    controlnet_aux runs a single 0.5 scale (scale_search=[0.5]); pass more
    scales for the original CMU multi-scale averaging. Returns
    (candidate, subset) in image coordinates.
    """
    ori_h, ori_w = image_rgb.shape[:2]
    heat_avg = np.zeros((ori_h, ori_w, N_HEAT), np.float64)
    paf_avg = np.zeros((ori_h, ori_w, N_PAF), np.float64)
    for scale in [s * boxsize / ori_h for s in scale_search]:
        h, w = int(round(ori_h * scale)), int(round(ori_w * scale))
        img = _resize_np(image_rgb.astype(np.float32), h, w) / 256.0 - 0.5
        img, _ = _pad_to_stride(img, pad_value=0.0)
        paf, heat = _jit_body_forward(params, jnp.asarray(img)[None])
        paf = np.asarray(paf[0], np.float32)
        heat = np.asarray(heat[0], np.float32)
        # upsample by stride, crop padding, resize to original frame
        heat = _resize_np(heat, img.shape[0], img.shape[1])[:h, :w]
        paf = _resize_np(paf, img.shape[0], img.shape[1])[:h, :w]
        heat_avg += _resize_np(heat, ori_h, ori_w) / len(scale_search)
        paf_avg += _resize_np(paf, ori_h, ori_w) / len(scale_search)
    all_peaks = find_peaks(heat_avg, thre1=thre1)
    connection_all, special_k = score_limbs(paf_avg, all_peaks, ori_h, thre2=thre2)
    return assemble_subsets(all_peaks, connection_all, special_k)


# controlnet_aux util.draw_bodypose colors (18 parts / 17 drawn limbs)
_COLORS = [
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
    (85, 255, 0), (0, 255, 0), (0, 255, 85), (0, 255, 170), (0, 255, 255),
    (0, 170, 255), (0, 85, 255), (0, 0, 255), (85, 0, 255), (170, 0, 255),
    (255, 0, 255), (255, 0, 170), (255, 0, 85),
]


def _fill_ellipse(canvas, cx, cy, a, b, angle, color):
    """Filled rotated ellipse via a coordinate mask (cv2.ellipse2Poly+fill)."""
    h, w = canvas.shape[:2]
    r = int(math.ceil(max(a, b))) + 1
    x0, x1 = max(int(cx) - r, 0), min(int(cx) + r + 1, w)
    y0, y1 = max(int(cy) - r, 0), min(int(cy) + r + 1, h)
    if x0 >= x1 or y0 >= y1:
        return
    ys, xs = np.mgrid[y0:y1, x0:x1]
    dx, dy = xs - cx, ys - cy
    ca, sa = math.cos(angle), math.sin(angle)
    u = dx * ca + dy * sa
    v = -dx * sa + dy * ca
    mask = (u / max(a, 1e-6)) ** 2 + (v / max(b, 1e-6)) ** 2 <= 1.0
    canvas[y0:y1, x0:x1][mask] = color


def draw_bodypose(
    candidate: np.ndarray, subset: np.ndarray, height: int, width: int
) -> np.ndarray:
    """Render the skeleton PNG (controlnet_aux util.draw_bodypose): 17 limb
    ellipses alpha-blended at 0.6 then 18 keypoint circles."""
    canvas = np.zeros((height, width, 3), np.float64)
    stickwidth = 4
    for i in range(17):
        for n in range(len(subset)):
            index = subset[n][LIMB_SEQ[i] - 1]
            if -1 in index:
                continue
            ys = candidate[index.astype(int), 1]
            xs = candidate[index.astype(int), 0]
            m_x, m_y = xs.mean(), ys.mean()
            length = math.hypot(xs[0] - xs[1], ys[0] - ys[1])
            angle = math.atan2(ys[0] - ys[1], xs[0] - xs[1])
            cur = canvas.copy()
            _fill_ellipse(cur, m_x, m_y, length / 2, stickwidth, angle, _COLORS[i])
            canvas = canvas * 0.4 + cur * 0.6
    for i in range(18):
        for n in range(len(subset)):
            index = int(subset[n][i])
            if index == -1:
                continue
            x, y = candidate[index][0:2]
            _fill_ellipse(canvas, x, y, 4, 4, 0.0, _COLORS[i])
    return canvas.clip(0, 255).astype(np.uint8)


def render_skeleton(params: Dict, image_rgb: np.ndarray, **kwargs) -> np.ndarray:
    candidate, subset = estimate_body(params, image_rgb, **kwargs)
    return draw_bodypose(candidate, subset, *image_rgb.shape[:2])


def load_body_params(path: str) -> Dict:
    """Load a pytorch-openpose body_pose_model.pth into a JAX pytree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_body_state_dict({k: v.numpy() for k, v in sd.items()})


# ===========================================================================
# hand keypoint network (pytorch-openpose hand.py — the controlnet_aux
# OpenposeDetector's hand_and_face=True path; the SHIPPED reference configs
# run hand_and_face=False at data_preparation/video_skeletons.py:78, so this
# is optional capability surface, default-off to match)
# ===========================================================================

N_HAND = 22  # 21 keypoints + background

_HAND_STEM: Tuple = (
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3), "pool1",
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3), "pool2",
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3), "pool3",
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3", 512, 512, 3), ("conv4_4", 512, 512, 3),
    ("conv5_1", 512, 512, 3), ("conv5_2", 512, 512, 3),
    ("conv5_3_CPM", 512, 128, 3),
)
_HAND_STAGE1 = [("conv6_1_CPM", 128, 512, 1), ("conv6_2_CPM", 512, N_HAND, 1)]


def _hand_stageT_layers(stage: int) -> List[Tuple[str, int, int, int]]:
    s = f"_stage{stage}"
    cin = N_HAND + 128
    return [
        (f"Mconv1{s}", cin, 128, 7), (f"Mconv2{s}", 128, 128, 7),
        (f"Mconv3{s}", 128, 128, 7), (f"Mconv4{s}", 128, 128, 7),
        (f"Mconv5{s}", 128, 128, 7), (f"Mconv6{s}", 128, 128, 1),
        (f"Mconv7{s}", 128, N_HAND, 1),
    ]


def init_hand_params(key) -> Dict:
    params: Dict = {"model1_0": {}, "model1_1": {}}
    for item in _HAND_STEM:
        if isinstance(item, str):
            continue
        name, cin, cout, k = item
        key, sub = jax.random.split(key)
        params["model1_0"][name] = init_conv2d(sub, cin, cout, k)
    for name, cin, cout, k in _HAND_STAGE1:
        key, sub = jax.random.split(key)
        params["model1_1"][name] = init_conv2d(sub, cin, cout, k)
    for stage in range(2, 7):
        mod = f"model{stage}"
        params[mod] = {}
        for name, cin, cout, k in _hand_stageT_layers(stage):
            key, sub = jax.random.split(key)
            params[mod][name] = init_conv2d(sub, cin, cout, k)
    return params


def _hand_module_for_layer(layer: str) -> str:
    if layer.startswith(("conv1_", "conv2_", "conv3_", "conv4_", "conv5_")):
        return "model1_0"
    if layer.startswith("conv6_"):
        return "model1_1"
    if layer.startswith("Mconv") and "_stage" in layer:
        return f"model{layer.rsplit('_stage', 1)[1]}"
    raise ValueError(f"unexpected hand checkpoint layer {layer!r}")


def convert_hand_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """hand_pose_model.pth (OIHW; prefixed or prefix-stripped keys) -> pytree."""
    params: Dict = {}
    for key, value in sd.items():
        parts = key.split(".")
        if len(parts) == 3 and parts[2] in ("weight", "bias"):
            mod, layer, kind = parts
        elif len(parts) == 2 and parts[1] in ("weight", "bias"):
            layer, kind = parts
            mod = _hand_module_for_layer(layer)
        else:
            raise ValueError(f"unexpected hand checkpoint key {key!r}")
        value = np.asarray(value)
        entry = params.setdefault(mod, {}).setdefault(layer, {})
        if kind == "weight":
            entry["kernel"] = jnp.asarray(value.transpose(2, 3, 1, 0))
        else:
            entry["bias"] = jnp.asarray(value)
    return params


def _run_hand_layers(params, layers, x, last_no_relu: str):
    for item in layers:
        if isinstance(item, str):
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        name = item[0]
        x = conv2d(params[name], x, padding=item[3] // 2)
        if name != last_no_relu:
            x = jax.nn.relu(x)
    return x


def hand_forward(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, W, 3] (H, W multiples of 8), ``img/256 - 0.5``.
    Returns the stage-6 heatmaps [B, H/8, W/8, 22] (hand.py forward:
    out1_0 stem -> stage-1 -> cat([out, feat]) refinement x5; the stage-1
    cat order is [heatmap, features])."""
    feat = _run_hand_layers(params["model1_0"], _HAND_STEM, x, last_no_relu="")
    out = _run_hand_layers(
        params["model1_1"], _HAND_STAGE1, feat, last_no_relu="conv6_2_CPM"
    )
    for stage in range(2, 7):
        inp = jnp.concatenate([out, feat], axis=-1)
        out = _run_hand_layers(
            params[f"model{stage}"], _hand_stageT_layers(stage), inp,
            last_no_relu=f"Mconv7_stage{stage}",
        )
    return out


_jit_hand_forward = jax.jit(hand_forward)


def estimate_hand(
    params: Dict,
    image_rgb: np.ndarray,
    boxsize: int = 368,
    scale_search: Sequence[float] = (0.5, 1.0, 1.5, 2.0),
    thre: float = 0.05,
) -> np.ndarray:
    """Hand keypoints on one cropped hand image (hand.py __call__): multi-
    scale heatmap averaging, then per-part gaussian blur + largest connected
    component + argmax. Returns [21, 2] (x, y) with (0, 0) for misses."""
    from scipy.ndimage import label as cc_label

    ori_h, ori_w = image_rgb.shape[:2]
    heat_avg = np.zeros((ori_h, ori_w, N_HAND), np.float64)
    for scale in [s * boxsize / ori_h for s in scale_search]:
        h, w = int(round(ori_h * scale)), int(round(ori_w * scale))
        img = _resize_np(image_rgb.astype(np.float32), h, w) / 256.0 - 0.5
        img, _ = _pad_to_stride(img, pad_value=0.0)
        heat = np.asarray(_jit_hand_forward(params, jnp.asarray(img)[None])[0])
        heat = _resize_np(heat, img.shape[0], img.shape[1])[:h, :w]
        heat_avg += _resize_np(heat, ori_h, ori_w) / len(scale_search)

    peaks = np.zeros((N_HAND - 1, 2), np.float64)
    for part in range(N_HAND - 1):
        map_ori = heat_avg[:, :, part].copy()
        blurred = gaussian_blur(map_ori, sigma=3.0)
        binary = blurred > thre
        if not binary.any():
            continue
        labels, n_labels = cc_label(binary)
        sums = [map_ori[labels == i].sum() for i in range(1, n_labels + 1)]
        best = int(np.argmax(sums)) + 1
        map_ori[labels != best] = 0
        y, x = np.unravel_index(np.argmax(map_ori), map_ori.shape)
        peaks[part] = (x, y)
    return peaks


def hand_detect(candidate: np.ndarray, subset: np.ndarray, height: int, width: int):
    """Hand box proposals from body keypoints (pytorch-openpose
    util.handDetect): box centered past the wrist along the elbow->wrist
    direction, width from wrist-elbow / elbow-shoulder distances. Returns
    [(x, y, w, is_left), ...]."""
    ratio_wrist_elbow = 0.33
    results = []
    for person in subset.astype(int):
        hands = []
        if np.all(person[[5, 6, 7]] >= 0):  # left shoulder/elbow/wrist
            hands.append((*candidate[person[5]][:2], *candidate[person[6]][:2],
                          *candidate[person[7]][:2], True))
        if np.all(person[[2, 3, 4]] >= 0):  # right
            hands.append((*candidate[person[2]][:2], *candidate[person[3]][:2],
                          *candidate[person[4]][:2], False))
        for x1, y1, x2, y2, x3, y3, is_left in hands:
            x = x3 + ratio_wrist_elbow * (x3 - x2)
            y = y3 + ratio_wrist_elbow * (y3 - y2)
            d_we = math.hypot(x3 - x2, y3 - y2)
            d_es = math.hypot(x2 - x1, y2 - y1)
            w = 1.5 * max(d_we, 0.9 * d_es)
            x, y = x - w / 2, y - w / 2
            if x < 0:
                w += x; x = 0
            if y < 0:
                w += y; y = 0
            w = min(w, width - x, height - y)
            if w >= 20:
                results.append((int(x), int(y), int(w), is_left))
    return results


# controlnet_aux util.draw_handpose edge list + hsv edge coloring
_HAND_EDGES = [
    [0, 1], [1, 2], [2, 3], [3, 4], [0, 5], [5, 6], [6, 7], [7, 8], [0, 9],
    [9, 10], [10, 11], [11, 12], [0, 13], [13, 14], [14, 15], [15, 16],
    [0, 17], [17, 18], [18, 19], [19, 20],
]


def _hsv_to_rgb(h: float) -> Tuple[int, int, int]:
    i = int(h * 6.0) % 6
    f = h * 6.0 - int(h * 6.0)
    q, t = 1.0 - f, f
    rgb = [(1, t, 0), (q, 1, 0), (0, 1, t), (0, q, 1), (t, 0, 1), (1, 0, q)][i]
    return tuple(int(255 * c) for c in rgb)


def _draw_line(canvas, x0, y0, x1, y1, color, thickness=2):
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    h, w = canvas.shape[:2]
    r = thickness // 2
    for x, y in zip(xs, ys):
        xi, yi = int(round(x)), int(round(y))
        canvas[max(yi - r, 0):min(yi + r + 1, h),
               max(xi - r, 0):min(xi + r + 1, w)] = color


def draw_handpose(canvas: np.ndarray, peaks: np.ndarray, x0: int, y0: int):
    """Render one hand's 21 keypoints onto the canvas in place
    (controlnet_aux util.draw_handpose: hsv-colored bones + red joints)."""
    for ie, (a, b) in enumerate(_HAND_EDGES):
        pa, pb = peaks[a], peaks[b]
        if (pa == 0).all() or (pb == 0).all():
            continue
        color = _hsv_to_rgb(ie / len(_HAND_EDGES))
        _draw_line(canvas, pa[0] + x0, pa[1] + y0, pb[0] + x0, pb[1] + y0, color)
    for p in peaks:
        if (p == 0).all():
            continue
        _fill_ellipse(canvas, p[0] + x0, p[1] + y0, 4, 4, 0.0, (0, 0, 255))
    return canvas


# ===========================================================================
# face landmark network (controlnet_aux open_pose/face.py FaceNet — same
# optional hand_and_face surface as above)
# ===========================================================================

N_FACE = 71  # 70 landmarks + background

_FACE_STEM: Tuple = _HAND_STEM  # identical VGG stem through conv5_3_CPM
_FACE_STAGE1 = [("conv6_1_CPM", 128, 512, 1), ("conv6_2_CPM", 512, N_FACE, 1)]


def _face_stageT_layers(stage: int) -> List[Tuple[str, int, int, int]]:
    s = f"_stage{stage}"
    cin = N_FACE + 128
    return [
        (f"Mconv1{s}", cin, 128, 7), (f"Mconv2{s}", 128, 128, 7),
        (f"Mconv3{s}", 128, 128, 7), (f"Mconv4{s}", 128, 128, 7),
        (f"Mconv5{s}", 128, 128, 7), (f"Mconv6{s}", 128, 128, 1),
        (f"Mconv7{s}", 128, N_FACE, 1),
    ]


def init_face_params(key) -> Dict:
    """FaceNet stores layers FLAT (facenet.pth keys are 'conv1_1.weight')."""
    params: Dict = {}
    for item in _FACE_STEM:
        if isinstance(item, str):
            continue
        name, cin, cout, k = item
        key, sub = jax.random.split(key)
        params[name] = init_conv2d(sub, cin, cout, k)
    for name, cin, cout, k in _FACE_STAGE1:
        key, sub = jax.random.split(key)
        params[name] = init_conv2d(sub, cin, cout, k)
    for stage in range(2, 7):
        for name, cin, cout, k in _face_stageT_layers(stage):
            key, sub = jax.random.split(key)
            params[name] = init_conv2d(sub, cin, cout, k)
    return params


def convert_face_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """facenet.pth (flat 'layer.weight' keys, OIHW) -> flat pytree."""
    params: Dict = {}
    for key, value in sd.items():
        parts = key.split(".")
        if len(parts) != 2 or parts[1] not in ("weight", "bias"):
            raise ValueError(f"unexpected face checkpoint key {key!r}")
        layer, kind = parts
        value = np.asarray(value)
        entry = params.setdefault(layer, {})
        if kind == "weight":
            entry["kernel"] = jnp.asarray(value.transpose(2, 3, 1, 0))
        else:
            entry["bias"] = jnp.asarray(value)
    return params


def face_forward(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, W, 3], ``img/256 - 0.5``. Returns stage-6 heatmaps
    [B, H/8, W/8, 71] (face.py FaceNet.forward: stem -> stage1 ->
    cat([heatmap, features]) refinement x5)."""
    feat = _run_hand_layers(params, _FACE_STEM, x, last_no_relu="")
    out = _run_hand_layers(params, _FACE_STAGE1, feat, last_no_relu="conv6_2_CPM")
    for stage in range(2, 7):
        inp = jnp.concatenate([out, feat], axis=-1)
        out = _run_hand_layers(
            params, _face_stageT_layers(stage), inp,
            last_no_relu=f"Mconv7_stage{stage}",
        )
    return out


_jit_face_forward = jax.jit(face_forward)


def estimate_face(
    params: Dict,
    image_rgb: np.ndarray,
    inference_size: int = 384,
    thre: float = 0.05,
) -> np.ndarray:
    """Face landmarks on one cropped face image (controlnet_aux
    face.Face.__call__): single fixed-size forward, heatmaps resized back,
    per-channel thresholded argmax. Returns [70, 2] with (0, 0) misses."""
    ori_h, ori_w = image_rgb.shape[:2]
    img = _resize_np(image_rgb.astype(np.float32), inference_size, inference_size)
    img = img / 256.0 - 0.5
    heat = np.asarray(_jit_face_forward(params, jnp.asarray(img)[None])[0])
    heat = _resize_np(heat, ori_h, ori_w)
    peaks = np.zeros((N_FACE - 1, 2), np.float64)
    for part in range(N_FACE - 1):
        m = heat[:, :, part]
        if m.max() <= thre:
            continue
        y, x = np.unravel_index(np.argmax(m), m.shape)
        peaks[part] = (x, y)
    return peaks


def face_detect(candidate: np.ndarray, subset: np.ndarray, height: int, width: int):
    """Face box proposals from body keypoints (controlnet_aux
    util.faceDetect semantics): square box around the nose, sized by the
    nose-eye (x3) and nose-ear (x1.5) distances. Returns [(x, y, w), ...]."""
    results = []
    for person in subset.astype(int):
        if person[0] < 0:  # nose
            continue
        x0, y0 = candidate[person[0]][:2]
        w = 0.0
        for idx, factor in ((14, 3.0), (15, 3.0), (16, 1.5), (17, 1.5)):
            if person[idx] >= 0:
                x1, y1 = candidate[person[idx]][:2]
                w = max(w, math.hypot(x1 - x0, y1 - y0) * factor)
        if w < 20:
            continue
        x, y = x0 - w / 2, y0 - w / 2
        if x < 0:
            w += x; x = 0
        if y < 0:
            w += y; y = 0
        w = min(w, width - x, height - y)
        if w >= 20:
            results.append((int(x), int(y), int(w)))
    return results


def draw_facepose(canvas: np.ndarray, peaks: np.ndarray, x0: int, y0: int):
    """White 3px landmark dots (controlnet_aux util.draw_facepose)."""
    for p in peaks:
        if (p == 0).all():
            continue
        _fill_ellipse(canvas, p[0] + x0, p[1] + y0, 3, 3, 0.0, (255, 255, 255))
    return canvas


def render_skeleton_full(
    body_params: Dict,
    image_rgb: np.ndarray,
    hand_params: Optional[Dict] = None,
    face_params: Optional[Dict] = None,
    **kwargs,
) -> np.ndarray:
    """openposefull rendering: body skeleton, plus hand/face overlays when
    those params are given (OpenposeDetector(hand_and_face=...) — the
    shipped reference configs run body-only, video_skeletons.py:78)."""
    candidate, subset = estimate_body(body_params, image_rgb, **kwargs)
    h, w = image_rgb.shape[:2]
    canvas = draw_bodypose(candidate, subset, h, w).astype(np.float64)
    if hand_params is not None:
        for (x, y, bw, is_left) in hand_detect(candidate, subset, h, w):
            crop = image_rgb[y:y + bw, x:x + bw]
            if min(crop.shape[:2]) < 20:
                continue
            peaks = estimate_hand(hand_params, crop)
            draw_handpose(canvas, peaks, x, y)
    if face_params is not None:
        for (x, y, bw) in face_detect(candidate, subset, h, w):
            crop = image_rgb[y:y + bw, x:x + bw]
            if min(crop.shape[:2]) < 20:
                continue
            peaks = estimate_face(face_params, crop)
            draw_facepose(canvas, peaks, x, y)
    return canvas.clip(0, 255).astype(np.uint8)


def load_hand_params(path: str) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_hand_state_dict({k: v.numpy() for k, v in sd.items()})


def load_face_params(path: str) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_face_state_dict({k: v.numpy() for k, v in sd.items()})
