"""TPU-native ops: fused resampling kernels and the STFT front-end."""
from ditsep_tpu.ops.fir import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    upsample_2d,
    upsample_conv_2d,
)
from ditsep_tpu.ops.fused_act import fused_leaky_relu
from ditsep_tpu.ops.stft import hann_window, istft, stft
from ditsep_tpu.ops.upfirdn2d import setup_fir_kernel, upfirdn2d, upfirdn2d_nchw

__all__ = [
    "conv_downsample_2d",
    "downsample_2d",
    "naive_downsample_2d",
    "naive_upsample_2d",
    "upsample_2d",
    "upsample_conv_2d",
    "fused_leaky_relu",
    "hann_window",
    "istft",
    "stft",
    "setup_fir_kernel",
    "upfirdn2d",
    "upfirdn2d_nchw",
]
