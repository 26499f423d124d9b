import pytest
import numpy as np
import jax
import jax.numpy as jnp
import torch

from motioneditor_tpu.ops.ms_deform_attn import _bilinear_sample, ms_deform_attn
from motioneditor_tpu.prep.alignment import align_pose_frame, find_person_boundaries

pytestmark = pytest.mark.slow  # deformable-attention torch oracles (see pytest.ini)


def test_bilinear_sample_matches_torch_grid_sample():
    rs = np.random.RandomState(0)
    value = rs.randn(2, 5, 7, 3).astype(np.float32)
    grid = (rs.rand(2, 11, 2).astype(np.float32) * 2.4 - 1.2)  # includes OOB
    out = np.asarray(_bilinear_sample(jnp.asarray(value), jnp.asarray(grid)))
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(value.transpose(0, 3, 1, 2)),
        torch.from_numpy(grid[:, None]),  # [N, 1, P, 2]
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()[:, :, 0].transpose(0, 2, 1)  # [N, P, C]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_ms_deform_attn_matches_torch_fallback():
    """Oracle: the reference's own PyTorch fallback semantics
    (GroundedSAM ms_deform_attn.py:338 multi_scale_deformable_attn_pytorch)."""
    rs = np.random.RandomState(1)
    b, heads, dim = 2, 2, 4
    shapes = [(4, 6), (2, 3)]
    total = sum(h * w for h, w in shapes)
    nq, pts = 5, 3
    value = rs.randn(b, total, heads, dim).astype(np.float32)
    locs = rs.rand(b, nq, heads, len(shapes), pts, 2).astype(np.float32)
    weights = rs.rand(b, nq, heads, len(shapes), pts).astype(np.float32)
    weights /= weights.sum(axis=(-2, -1), keepdims=True)

    out = np.asarray(
        ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(weights))
    )

    # torch oracle
    v = torch.from_numpy(value)
    value_list = v.split([h * w for h, w in shapes], dim=1)
    sampling_grids = 2 * torch.from_numpy(locs) - 1
    outs = []
    for lid, (h, w) in enumerate(shapes):
        v_l = value_list[lid].flatten(2).transpose(1, 2).reshape(b * heads, dim, h, w)
        grid_l = sampling_grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled = torch.nn.functional.grid_sample(
            v_l, grid_l, mode="bilinear", padding_mode="zeros", align_corners=False
        )
        outs.append(sampled)
    att = torch.from_numpy(weights).transpose(1, 2).reshape(
        b * heads, 1, nq, len(shapes) * pts
    )
    ref = (
        (torch.stack(outs, dim=-2).flatten(-2) * att)
        .sum(-1)
        .view(b, heads * dim, nq)
        .transpose(1, 2)
        .numpy()
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_find_person_boundaries():
    mask = np.zeros((10, 12), np.float32)
    mask[3:7, 4:9] = 1
    left, right, top, bottom = find_person_boundaries(mask)
    assert (left, right, top, bottom) == (4, 8, 3, 6)


def test_align_pose_frame_places_target_at_target_position():
    h = w = 64
    sm = np.zeros((h, w), np.float32)
    sm[20:40, 10:20] = 1  # source person: left side
    tm = np.zeros((h, w), np.float32)
    tm[25:45, 40:50] = 1  # target person: right side
    pose = np.zeros((h, w, 3), np.uint8)
    pose[25:45, 40:50] = 255
    out = align_pose_frame(sm, tm, pose, canvas_hw=(h, w))
    assert out.shape == pose.shape
    ys, xs = np.nonzero(out[..., 0] > 0)
    assert len(xs) > 0
    # bottom of the pasted pose should land near the target bottom (44)
    assert abs(int(ys.max()) - 44) <= 2
    # horizontal center near the target center (45)
    cx = (xs.min() + xs.max()) / 2
    assert abs(cx - 45) <= 6
