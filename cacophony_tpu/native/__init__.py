from cacophony_tpu.native import wavio  # noqa: F401
