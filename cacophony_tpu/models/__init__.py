from cacophony_tpu.models import audio, caco, text  # noqa: F401
