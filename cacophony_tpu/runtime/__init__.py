from cacophony_tpu.runtime.engine import CacoEngine  # noqa: F401
