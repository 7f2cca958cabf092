from .state import TrainState, EmaState, ema_init, ema_update
from .schedules import PlateauScheduler, onecycle_schedule
from .optim import make_optimizer, set_learning_rate, get_learning_rate
from .loop import TrainLoop, EpochResult
