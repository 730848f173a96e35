"""Training: schedules, jitted steps, L-BFGS, checkpointing."""

from .schedules import one_cycle, one_cycle_schedule
from .checkpoint import save_checkpoint, restore_checkpoint, latest_epoch
from .lbfgs import lbfgs_optimizer, make_lbfgs_epoch
