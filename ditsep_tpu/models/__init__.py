"""Neural network models (Flax / NHWC, TPU-native)."""
from ditsep_tpu.models.layers import (
    AttnBlockpp,
    Combine,
    Downsample,
    GaussianFourierProjection,
    NIN,
    ResampleConv2d,
    ResnetBlockBigGANpp,
    ResnetBlockDDPMpp,
    Upsample,
    default_init,
    get_act,
)
from ditsep_tpu.models.ncsnpp import NCSNpp
from ditsep_tpu.models.score_models import (
    LatentScoreModelNCSNpp,
    ScoreModelNCSNpp,
)
from ditsep_tpu.models.unet1d import (
    NumberEmbedder,
    UNet1d,
    UNetCFG1d,
    UNetCondAdapter,
    UNetNCCA1d,
    XUNet1d,
)
from ditsep_tpu.models.dau1d import DiffusionAttnUnet1D
from ditsep_tpu.models.sepformer import (
    SepFormer,
    sepformer_params_from_torch,
)
from ditsep_tpu.models.torch_import import (
    diffsep_ema_param_order,
    import_diffsep_ema,
    import_ema_params,
    import_params,
    load_torch_ckpt,
)
