"""Inference: diffusion samplers, generation orchestration."""
from ditsep_tpu.inference.diffusion_prior import stereoize
from ditsep_tpu.inference.generation import generate_diffusion_cond
from ditsep_tpu.inference.longform import (align_permutation,
                                           separate_longform)
from ditsep_tpu.inference.sampling import (
    alpha_sigma_to_t,
    distribution_shift_time,
    get_alphas_sigmas,
    get_bmask,
    karras_sigmas,
    sample,
    sample_discrete_euler,
    sample_flow_dpmpp,
    sample_k,
    sample_rf,
    sample_rk4,
    truncated_logistic_normal_rescaled,
)
