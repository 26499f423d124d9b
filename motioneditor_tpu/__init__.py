"""MotionEditor-TPU: a TPU-native JAX/XLA/Pallas framework for content-aware
video motion editing.

Re-implements the full capability surface of MotionEditor ("Editing Video
Motion via Content-Aware Diffusion", CVPR 2024) as an idiomatic TPU stack:

- functional models (explicit param pytrees, no monkey-patching) in NHWC
- one jitted ``lax.scan`` program per diffusion phase (inversion, null-text
  optimization, two-branch denoise)
- attention injection expressed as static per-segment dispatch instead of
  runtime ``forward`` patching (reference: motion_editor/attn_control/*)
- Pallas flash-attention kernels for the hot attention variants
- frame-axis sharding over a ``jax.sharding.Mesh`` for multi-chip scale

Reference layout map (file:line cites refer to /root/reference):
  models/unet.py        <- motion_editor/models/unet_2d_condition.py
  models/adapter.py     <- motion_editor/models/controlnet_adapter.py
  models/controlnet.py  <- diffusers ControlNetModel (used at inference.py:156)
  ops/attention.py      <- motion_editor/models/attention_2d.py
  control/injection.py  <- motion_editor/attn_control/{fully,temporal}_control*.py
  control/p2p.py        <- motion_editor/p2p/{p2p_stable,ptp_utils}.py
  pipelines/editor.py   <- motion_editor/pipelines/pipeline_motion_editor.py,
                           motion_editor/util.py, p2p/null_text_optimization.py
  training/             <- train_bg.py, train_adaptor.py
  data/dataset.py       <- motion_editor/data/dataset.py
  prep/                 <- data_preparation/
"""

__version__ = "0.1.0"
