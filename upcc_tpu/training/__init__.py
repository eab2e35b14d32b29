from .loss import Loss
from .train_step import TrainState, make_optimizer, make_train_step
from .trainer import Training
