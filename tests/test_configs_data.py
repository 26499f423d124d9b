import os.path as osp

import numpy as np
import pytest

from motioneditor_tpu.configs import load_config

REF_DATA = "/root/reference/data/case-1"


def test_load_reference_eval_config():
    cfg = load_config("configs/case-1/eval-motion.yaml")
    assert cfg.pretrained_model_path == "checkpoints/stable-diffusion-v1-5"
    assert cfg.validation_data.num_inference_steps == 50
    assert cfg.validation_data.use_null_inv is True
    assert cfg.validation_data.guidance_scale == 7.5
    assert cfg.input_data.n_sample_frames == 8
    assert cfg.input_data.condition == ("openposefull",)
    assert cfg.use_sc_attn is True and cfg.use_st_attn is False
    assert cfg.seed == 33


def test_load_reference_train_config_numeric_coercion():
    cfg = load_config("configs/case-1/train-bg.yaml")
    # YAML 1.1 parses 3e-5 as a string; loader must coerce
    assert isinstance(cfg.learning_rate, float)
    assert cfg.learning_rate == 3e-5
    assert cfg.max_train_steps == 300
    assert cfg.trainable_modules == ("attn1.to_q", "attn2.to_q", "attn_temp")


@pytest.mark.skipif(not osp.isdir(REF_DATA), reason="reference data not mounted")
def test_video_dataset_reference_layout():
    from motioneditor_tpu.data.dataset import VideoDataset

    ds = VideoDataset(
        video_dir=REF_DATA,
        prompt="a girl is dancing",
        n_sample_frames=2,
        width=64,
        height=64,
        condition=["openposefull"],
        video_suffix=".png",
        condition_suffix=".png",
        source_mask_dir="man.mask",
    )
    assert len(ds) == 1
    ex = ds[0]
    assert ex["pixel_values"].shape == (2, 64, 64, 3)
    assert ex["pixel_values"].min() >= -1.0 and ex["pixel_values"].max() <= 1.0
    assert ex["source_conditions"]["openposefull"].shape == (2, 64, 64, 3)
    assert ex["target_conditions"]["openposefull"].shape == (2, 64, 64, 3)
    assert ex["source_masks"].shape == (2, 64, 64)
    assert set(np.unique(ex["source_masks"])) <= {0.0, 1.0}
    assert ex["prompt"] == "a girl is dancing"
