"""OpenPose port tests (models/openpose.py).

Oracles: a self-contained torch mirror of the pytorch-openpose two-branch
body network (the stack controlnet_aux drives in
data_preparation/video_skeletons.py:13-21), scipy's gaussian_filter for the
peak blur, and a synthetic stick figure for the full PAF decode.
"""

import collections
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from motioneditor_tpu.models.openpose import (
    LIMB_SEQ,
    MAP_IDX,
    N_HEAT,
    N_PAF,
    assemble_subsets,
    body_forward,
    convert_body_state_dict,
    draw_bodypose,
    find_peaks,
    gaussian_blur,
    score_limbs,
)

pytestmark = pytest.mark.slow  # 6-stage body/hand/face network compiles (see pytest.ini)

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torch mirror of pytorch-openpose body.py (built from the same layer tables)
# ---------------------------------------------------------------------------

def _torch_seq(layers):
    mods = collections.OrderedDict()
    last = layers[-1][0] if isinstance(layers[-1], tuple) else None
    for item in layers:
        if isinstance(item, str):
            mods[item] = nn.MaxPool2d(2, 2)
            continue
        name, cin, cout, k = item
        mods[name] = nn.Conv2d(cin, cout, k, padding=k // 2)
        if name != last or name.startswith(("conv1", "conv2", "conv3", "conv4")):
            mods["relu_" + name] = nn.ReLU()
    return nn.Sequential(mods)


class TorchBody(nn.Module):
    def __init__(self):
        super().__init__()
        from motioneditor_tpu.models import openpose as op

        self.model0 = _torch_seq(op._STEM)
        for stage in range(1, 7):
            for branch in (1, 2):
                setattr(
                    self, f"model{stage}_{branch}",
                    _torch_seq(op._branch_layers(stage, branch)),
                )

    def forward(self, x):
        feat = self.model0(x)
        paf, heat = self.model1_1(feat), self.model1_2(feat)
        for stage in range(2, 7):
            inp = torch.cat([paf, heat, feat], dim=1)
            paf = getattr(self, f"model{stage}_1")(inp)
            heat = getattr(self, f"model{stage}_2")(inp)
        return paf, heat


def test_body_forward_matches_torch():
    """Full 6-stage forward + OIHW->HWIO weight mapping vs the torch
    mirror on a tiny input."""
    model = TorchBody().eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # state-dict keys carry nn.Sequential names: "model0.conv1_1.weight"
    assert "model0.conv1_1.weight" in sd
    assert "model2_1.Mconv1_stage2_L1.weight" in sd
    params = convert_body_state_dict(sd)

    x = np.random.RandomState(0).randn(1, 3, 32, 24).astype(np.float32) * 0.1
    with torch.no_grad():
        paf_t, heat_t = model(torch.from_numpy(x))
    paf_j, heat_j = body_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert paf_j.shape == (1, 4, 3, N_PAF)
    assert heat_j.shape == (1, 4, 3, N_HEAT)
    np.testing.assert_allclose(
        np.asarray(paf_j), paf_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(heat_j), heat_t.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )


def test_body_state_dict_accepts_stripped_keys():
    """The REAL body_pose_model.pth (lllyasviel/Annotators) stores
    prefix-stripped keys ('conv1_1.weight', 'Mconv1_stage2_L1.weight'); the
    converter must derive the module from the layer name (the reference's
    util.transfer() re-adds the prefix from model.state_dict())."""
    model = TorchBody().eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    stripped = {k.split(".", 1)[1]: v for k, v in sd.items()}
    assert "conv1_1.weight" in stripped and "Mconv1_stage2_L1.weight" in stripped
    p_pref = convert_body_state_dict(sd)
    p_strip = convert_body_state_dict(stripped)
    flat_a = jax.tree_util.tree_leaves_with_path(p_pref)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(p_strip))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[path]))


# ---------------------------------------------------------------------------
# hand / face networks (pytorch-openpose hand.py, controlnet_aux FaceNet)
# ---------------------------------------------------------------------------


class TorchHand(nn.Module):
    def __init__(self):
        super().__init__()
        from motioneditor_tpu.models import openpose as op

        def seq(layers, no_relu):
            mods = collections.OrderedDict()
            for item in layers:
                if isinstance(item, str):
                    mods[item] = nn.MaxPool2d(2, 2)
                    continue
                name, cin, cout, k = item
                mods[name] = nn.Conv2d(cin, cout, k, padding=k // 2)
                if name != no_relu:
                    mods["relu_" + name] = nn.ReLU()
            return nn.Sequential(mods)

        self.model1_0 = seq(op._HAND_STEM, no_relu="")
        self.model1_1 = seq(op._HAND_STAGE1, no_relu="conv6_2_CPM")
        for stage in range(2, 7):
            setattr(
                self, f"model{stage}",
                seq(op._hand_stageT_layers(stage), no_relu=f"Mconv7_stage{stage}"),
            )

    def forward(self, x):
        feat = self.model1_0(x)
        out = self.model1_1(feat)
        for stage in range(2, 7):
            out = getattr(self, f"model{stage}")(torch.cat([out, feat], dim=1))
        return out


def test_hand_forward_matches_torch():
    from motioneditor_tpu.models.openpose import (
        N_HAND,
        convert_hand_state_dict,
        hand_forward,
    )

    model = TorchHand().eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # prefixed keys AND the real checkpoint's stripped layout both load
    params = convert_hand_state_dict(sd)
    stripped = {k.split(".", 1)[1]: v for k, v in sd.items()}
    params_s = convert_hand_state_dict(stripped)
    x = np.random.RandomState(0).randn(1, 3, 32, 24).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    out = hand_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert out.shape == (1, 4, 3, N_HAND)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
    out_s = hand_forward(params_s, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out))


class TorchFace(nn.Module):
    """controlnet_aux FaceNet mirror: flat conv attributes, stem + stage1 +
    5 cat([heatmap, feat]) refinement stages, 71 output channels."""

    def __init__(self):
        super().__init__()
        from motioneditor_tpu.models import openpose as op

        self._stem = [i for i in op._FACE_STEM]
        for item in list(op._FACE_STEM) + op._FACE_STAGE1 + [
            l for s in range(2, 7) for l in op._face_stageT_layers(s)
        ]:
            if isinstance(item, str):
                continue
            name, cin, cout, k = item
            setattr(self, name, nn.Conv2d(cin, cout, k, padding=k // 2))

    def _run(self, layers, x, no_relu):
        for item in layers:
            if isinstance(item, str):
                x = nn.functional.max_pool2d(x, 2, 2)
                continue
            x = getattr(self, item[0])(x)
            if item[0] != no_relu:
                x = nn.functional.relu(x)
        return x

    def forward(self, x):
        from motioneditor_tpu.models import openpose as op

        feat = self._run(op._FACE_STEM, x, no_relu="")
        out = self._run(op._FACE_STAGE1, feat, no_relu="conv6_2_CPM")
        for stage in range(2, 7):
            out = self._run(
                op._face_stageT_layers(stage), torch.cat([out, feat], dim=1),
                no_relu=f"Mconv7_stage{stage}",
            )
        return out


def test_face_forward_matches_torch():
    from motioneditor_tpu.models.openpose import (
        N_FACE,
        convert_face_state_dict,
        face_forward,
    )

    model = TorchFace().eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    assert "conv1_1.weight" in sd and "Mconv7_stage6.weight" in sd
    params = convert_face_state_dict(sd)
    x = np.random.RandomState(1).randn(1, 3, 24, 32).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    out = face_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert out.shape == (1, 3, 4, N_FACE)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_hand_peak_extraction():
    """estimate_hand's decode (blur -> largest component -> argmax) finds a
    planted peak; exercised through the real forward with a delta-weight
    trick is overkill — decode directly on synthetic heatmaps."""
    from motioneditor_tpu.models import openpose as op
    from scipy.ndimage import label as cc_label

    h = np.zeros((64, 64), np.float64)
    yy, xx = np.mgrid[0:64, 0:64]
    h += np.exp(-((yy - 31) ** 2 + (xx - 17) ** 2) / 8.0)
    blurred = op.gaussian_blur(h, 3.0)
    labels, n = cc_label(blurred > 0.05)
    assert n == 1
    y, x = np.unravel_index(np.argmax(h), h.shape)
    assert (x, y) == (17, 31)


def test_hand_detect_box_from_wrist_elbow():
    from motioneditor_tpu.models.openpose import hand_detect

    pts = _stick_figure()
    candidate = np.array(
        [[x, y, 1.0, i] for i, (x, y) in sorted(pts.items())], np.float64
    )
    subset = np.concatenate([np.arange(18.0), [18.0, 18.0]])[None]
    boxes = hand_detect(candidate, subset, 128, 128)
    assert len(boxes) == 2  # left + right hand
    sides = sorted(b[3] for b in boxes)
    assert sides == [False, True]
    for (x, y, w, _) in boxes:
        assert w >= 20 and 0 <= x < 128 and 0 <= y < 128


def test_face_detect_box_from_head():
    from motioneditor_tpu.models.openpose import face_detect

    pts = _stick_figure()
    candidate = np.array(
        [[x, y, 1.0, i] for i, (x, y) in sorted(pts.items())], np.float64
    )
    subset = np.concatenate([np.arange(18.0), [18.0, 18.0]])[None]
    boxes = face_detect(candidate, subset, 128, 128)
    assert len(boxes) == 1
    x, y, w = boxes[0]
    # the square must contain the nose
    assert x <= pts[0][0] <= x + w and y <= pts[0][1] <= y + w


def test_gaussian_blur_matches_scipy():
    from scipy.ndimage import gaussian_filter

    x = np.random.RandomState(1).rand(37, 29)
    np.testing.assert_allclose(
        gaussian_blur(x, 3.0), gaussian_filter(x, 3.0), atol=1e-6
    )


def test_find_peaks_locations_and_scores():
    h = np.zeros((64, 64, N_HEAT), np.float64)
    yy, xx = np.mgrid[0:64, 0:64]
    for (cy, cx) in [(20, 12), (40, 50)]:
        h[:, :, 0] += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0)
    peaks = find_peaks(h, thre1=0.1)
    assert len(peaks) == N_HEAT - 1
    got = sorted((p[0], p[1]) for p in peaks[0])
    assert got == [(12, 20), (50, 40)]
    # scores come from the unblurred map
    for x, y, score, _ in peaks[0]:
        assert score == pytest.approx(h[y, x, 0])
    assert all(len(p) == 0 for p in peaks[1:])


def _stick_figure():
    """18 COCO keypoints of one synthetic person in a 128x128 frame."""
    pts = {
        0: (64, 20), 1: (64, 34), 2: (50, 36), 3: (44, 56), 4: (40, 74),
        5: (78, 36), 6: (84, 56), 7: (88, 74), 8: (54, 70), 9: (52, 92),
        10: (52, 112), 11: (74, 70), 12: (76, 92), 13: (76, 112),
        14: (58, 16), 15: (70, 16), 16: (52, 18), 17: (76, 18),
    }
    return pts


def _synthesize_maps(pts, h=128, w=128):
    heat = np.zeros((h, w, N_HEAT), np.float64)
    paf = np.zeros((h, w, N_PAF), np.float64)
    yy, xx = np.mgrid[0:h, 0:w]
    for part, (px, py) in pts.items():
        heat[:, :, part] = np.exp(-((yy - py) ** 2 + (xx - px) ** 2) / 8.0)
    for k in range(len(MAP_IDX)):
        a = np.array(pts[LIMB_SEQ[k][0] - 1], np.float64)
        b = np.array(pts[LIMB_SEQ[k][1] - 1], np.float64)
        vec = b - a
        vecn = vec / max(np.linalg.norm(vec), 1e-8)
        for t in np.linspace(0.0, 1.0, 24):
            x, y = a + t * vec
            x0, x1 = max(int(x) - 2, 0), min(int(x) + 3, w)
            y0, y1 = max(int(y) - 2, 0), min(int(y) + 3, h)
            paf[y0:y1, x0:x1, MAP_IDX[k][0]] = vecn[0]
            paf[y0:y1, x0:x1, MAP_IDX[k][1]] = vecn[1]
    return heat, paf


def test_full_decode_recovers_stick_figure():
    """find_peaks -> score_limbs -> assemble_subsets reconstructs the
    synthetic person with all 18 parts at the planted coordinates."""
    pts = _stick_figure()
    heat, paf = _synthesize_maps(pts)
    peaks = find_peaks(heat)
    conn, special = score_limbs(paf, peaks, img_h=128)
    assert special == []
    candidate, subset = assemble_subsets(peaks, conn, special)
    assert subset.shape == (1, 20)
    assert subset[0][-1] == 18  # every part assigned
    for part, (px, py) in pts.items():
        idx = int(subset[0][part])
        assert idx >= 0
        assert abs(candidate[idx][0] - px) <= 1 and abs(candidate[idx][1] - py) <= 1


def test_assembly_separates_two_people():
    pts1 = _stick_figure()
    h = w = 300
    heat1, paf1 = _synthesize_maps(pts1, h, w)
    # second person far down-right
    pts2 = {k: (x + 150, y + 100) for k, (x, y) in pts1.items()}
    heat2, paf2 = _synthesize_maps(pts2, h, w)
    heat = np.maximum(heat1, heat2)
    paf = np.where(np.abs(paf2) > 0, paf2, paf1)
    peaks = find_peaks(heat)
    conn, special = score_limbs(paf, peaks, img_h=h)
    candidate, subset = assemble_subsets(peaks, conn, special)
    assert subset.shape[0] == 2
    assert sorted(subset[:, -1].tolist()) == [18.0, 18.0]


def test_draw_bodypose_renders_keypoints():
    pts = _stick_figure()
    candidate = np.array(
        [[x, y, 1.0, i] for i, (x, y) in sorted(pts.items())], np.float64
    )
    subset = np.concatenate([np.arange(18.0), [18.0, 18.0]])[None]
    canvas = draw_bodypose(candidate, subset, 128, 128)
    assert canvas.shape == (128, 128, 3) and canvas.dtype == np.uint8
    # keypoint circles are drawn last, unblended -> exact part colors
    from motioneditor_tpu.models.openpose import _COLORS

    for i, (px, py) in pts.items():
        assert tuple(canvas[py, px]) == _COLORS[i]
    # limbs blended somewhere between the neck and nose
    mid = canvas[27, 64]
    assert mid.sum() > 0
