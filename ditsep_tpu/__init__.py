"""DiTSep-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for diffusion-based
source separation and speech enhancement.

Re-designed from scratch for TPU with the capability surface of the reference
DiTSep codebase (diffusion separation in STFT and VAE-latent domains, score
SDE library, NCSN++ backbone, Oobleck VAE, PC/ODE/SB samplers, sharded
training and evaluation).

Layout:
  ditsep_tpu.sdes       -- SDE library (MixSDE/PriorMixSDE/OUVE/SBVE), samplers
  ditsep_tpu.ops        -- TPU kernels: upfirdn2d, fused bias-act, STFT/iSTFT
  ditsep_tpu.models     -- NCSN++, score models, Oobleck VAE, DiT, discriminators
  ditsep_tpu.losses     -- SI-SDR/PIT, multi-resolution STFT losses
  ditsep_tpu.training   -- jitted train steps, EMA, optimizers, modules
  ditsep_tpu.data       -- datasets, bucketed static-shape batching
  ditsep_tpu.parallel   -- mesh construction, shardings
  ditsep_tpu.evaluation -- sharded eval harness, metrics
"""

__version__ = "0.1.0"
