from cacophony_tpu.ops.attention import attention_init, multi_head_attention  # noqa: F401
