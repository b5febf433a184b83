"""Training: optax loop, losses, data pipeline, orbax checkpointing."""

from fft_tpu.train.loop import (
    TrainConfig, TrainState, hybrid_loss, hybrid_train_step, lm_loss,
    make_optimizer, train_init, train_step,
)

__all__ = ["TrainConfig", "TrainState", "hybrid_loss", "hybrid_train_step",
           "lm_loss", "make_optimizer", "train_init", "train_step"]
