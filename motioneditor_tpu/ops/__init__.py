from motioneditor_tpu.ops import attention, flash_attention  # noqa: F401
