from cacophony_tpu.checkpoints.convert import (  # noqa: F401
    convert_audio_decoder,
    convert_audio_encoder,
    convert_audiomae_params,
    convert_caco_params,
    convert_caption_decoder,
    convert_text_encoder,
)
from cacophony_tpu.checkpoints.io import (  # noqa: F401
    load_caco,
    load_audiomae,
    load_params,
    save_params,
)
