from cacophony_tpu.data.audio_io import load_audio, read_wav  # noqa: F401
from cacophony_tpu.data.tokenizer import ByteLevelBPETokenizer, load_tokenizer  # noqa: F401
