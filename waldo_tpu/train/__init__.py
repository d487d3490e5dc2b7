from .train_state import NetState, make_optimizer, train_step_fn
from .checkpoint import CheckpointManager
from .trainer import Trainer
from .evaluator import Evaluator
