from cacophony_tpu.utils.profiling import StageTimer, annotate, trace  # noqa: F401
from cacophony_tpu.utils.observability import MetricsLogger  # noqa: F401
