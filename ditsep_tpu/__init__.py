"""DiTSep-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for diffusion-based
source separation and speech enhancement.

Re-designed from scratch for TPU with the capability surface of the reference
DiTSep codebase (diffusion separation in STFT and VAE-latent domains, score
SDE library, NCSN++ backbone, Oobleck VAE, PC/ODE/SB samplers, sharded
training and evaluation).

Layout:
  ditsep_tpu.sdes      -- SDE library (Mix/PriorMix/OUVE/SBVE), PC/AB2/ODE/SB samplers
  ditsep_tpu.ops       -- TPU ops: upfirdn2d, fused bias-act, matmul STFT/iSTFT,
                          Pallas kernels
  ditsep_tpu.models    -- NCSN++, score models, Oobleck VAE, DiT/transformer,
                          UNet1d, bottlenecks, discriminators, conditioners,
                          pretransforms, LM, FACodec, torch importers
  ditsep_tpu.training  -- trainers (DiffSep/latent/LDM/VAE-GAN/diffusion),
                          losses (SI-SDR/PIT, MRSTFT), fit() loop, schedules
  ditsep_tpu.inference -- v-diffusion / rectified-flow samplers, generation
  ditsep_tpu.data      -- datasets, bucketed static-shape batching
  ditsep_tpu.parallel  -- mesh construction, shardings, multihost init
  ditsep_tpu.eval      -- metrics (BSS-eval/STOI/composite), sharded eval harness
  ditsep_tpu.configs   -- experiment families + builders
  ditsep_tpu.cli       -- train/evaluate/separate/cache/unwrap entry points
  ditsep_tpu.utils     -- checkpointing, logging, profiling, registries
"""

__version__ = "0.1.0"
