"""The evaluate CLI must survive the reference's on-disk case layout.

``data/case-N`` keeps non-image entries (``frame_list.txt`` — written by the
dataset's frame-list cache, motion_editor/data/dataset.py:50-61 — plus the
``man.mask``/``source_condition``/... subdirs) next to an ``images/`` frame
dir. Round-3 review reproduced a crash pointing scripts/evaluate.py at the
case dir itself; these tests pin the fixed behavior.
"""

import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "scripts"))

from evaluate import load_video  # noqa: E402

REF_CASE = "/root/reference/data/case-1"


def _make_case_dir(tmp_path, n=3):
    from PIL import Image

    case = tmp_path / "case-9"
    img = case / "images"
    img.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img / f"{i:04d}.png")
    # the entries that used to crash the loader
    (case / "frame_list.txt").write_text("\n".join(f"{i:04d}.png" for i in range(n)))
    (case / "man.mask").mkdir()
    return case


def test_load_video_case_dir_layout(tmp_path):
    case = _make_case_dir(tmp_path)
    video = load_video(str(case))
    assert video.shape == (3, 16, 16, 3)
    assert video.dtype == np.float32
    assert 0.0 <= video.min() and video.max() <= 1.0
    # pointing directly at images/ still works
    direct = load_video(str(case / "images"))
    np.testing.assert_array_equal(video, direct)


def test_load_video_skips_non_image_entries(tmp_path):
    case = _make_case_dir(tmp_path)
    # flat dir containing stray non-image files (no images/ subdir)
    flat = tmp_path / "flat"
    flat.mkdir()
    for p in sorted((case / "images").iterdir()):
        (flat / p.name).write_bytes(p.read_bytes())
    (flat / "frame_list.txt").write_text("junk")
    video = load_video(str(flat))
    assert video.shape == (3, 16, 16, 3)


def test_load_video_empty_dir_raises(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        load_video(str(empty))


@pytest.mark.skipif(not osp.isdir(REF_CASE), reason="reference data not mounted")
def test_load_video_real_reference_case():
    video = load_video(REF_CASE)
    assert video.ndim == 4 and video.shape[-1] == 3
    assert video.shape[0] >= 1
