from .optim import cosine_warmup_schedule, make_adamw
from .trainer import BaseTrainer, BaseTrainState, MixerTrainer, MixerTrainState

__all__ = [
    "BaseTrainer",
    "BaseTrainState",
    "MixerTrainer",
    "MixerTrainState",
    "cosine_warmup_schedule",
    "make_adamw",
]
