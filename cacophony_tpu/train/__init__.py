from cacophony_tpu.train.losses import (  # noqa: F401
    caption_cross_entropy,
    clip_contrastive_loss,
    mae_reconstruction_loss,
)
from cacophony_tpu.train.train import (  # noqa: F401
    TrainConfig,
    TrainState,
    make_caco_train_step,
    make_mae_train_step,
    mae_random_masking,
)
