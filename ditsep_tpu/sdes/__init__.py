"""SDE library: forward SDEs, predictors, correctors, samplers."""
from ditsep_tpu.sdes.core import (
    BaseSDE,
    MixSDE,
    MixStd,
    OUVESDE,
    PriorMixSDE,
    PriorMixStd,
    SBVESDE,
    SDERegistry,
    bcast_right,
)
from ditsep_tpu.sdes.correctors import CorrectorRegistry
from ditsep_tpu.sdes.predictors import PredictorRegistry
from ditsep_tpu.sdes.samplers import (
    ab2_sample,
    ode_sample,
    ode_sample_scipy,
    pc_sample,
    sb_sample,
)

__all__ = [
    "BaseSDE",
    "MixSDE",
    "MixStd",
    "OUVESDE",
    "PriorMixSDE",
    "PriorMixStd",
    "SBVESDE",
    "SDERegistry",
    "CorrectorRegistry",
    "PredictorRegistry",
    "bcast_right",
    "pc_sample",
    "ab2_sample",
    "ode_sample",
    "ode_sample_scipy",
    "sb_sample",
]
