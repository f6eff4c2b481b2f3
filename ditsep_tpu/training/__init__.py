"""Training orchestration: trainers, losses, EMA state."""
from ditsep_tpu.training.diffsep import (
    DiffSepConfig,
    DiffSepTrainer,
    TrainState,
)
from ditsep_tpu.training.losses import (
    si_sdr_loss,
    si_sdr_pairwise,
    si_sdr_pit,
)
