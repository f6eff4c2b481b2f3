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
from ditsep_tpu.training.diffsep_latent import LatentDiffSepTrainer
from ditsep_tpu.training.autoencoder import (
    AutoencoderLossConfig,
    AutoencoderState,
    AutoencoderTrainer,
)
from ditsep_tpu.training.ldm import LDMLossWeights, LDMState, LDMTrainer
from ditsep_tpu.training.schedules import inverse_lr_schedule
