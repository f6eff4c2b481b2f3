"""Latent-domain DiffSep training: score matching inside the OobleckVAE
latent space.

TPU-native re-design of the reference ``LatentDiffSep`` Lightning module
(reference: src/diffsep_latent.py:27-487). Reuses the DiffSepTrainer loss
machinery (the latent state (B, n_src, D, T_lat) flows through the same
ndim-agnostic reductions); adds VAE encode/decode around it.

The VAE is frozen by default (reference: latent config ``trainable_vae:
False``): its params live outside the optimized tree and gradients never
flow through encode/decode (stop_gradient), matching the reference's
``requires_grad_(False)`` + ``@torch.no_grad`` encode.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax

from ditsep_tpu.models.oobleck import OobleckVAE
from ditsep_tpu.sdes import ab2_sample, pc_sample
from ditsep_tpu.training import losses as loss_lib
from ditsep_tpu.training.diffsep import DiffSepTrainer
from ditsep_tpu.utils import separate as sep_utils

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LatentDiffSepTrainer(DiffSepTrainer):
    """DiffSepTrainer operating on VAE latents.

    `model` is a LatentScoreModelNCSNpp; `vae` an OobleckVAE whose params
    are passed separately to encode/decode (frozen w.r.t. the optimizer).
    Default SDE per the reference config: OUVE(theta=1.5, sigma in
    [0.96, 10]) (reference: src/config/latent_diffsep_ouve/model/
    default.yaml:36-42).
    """

    vae: OobleckVAE = None

    def encode(self, vae_params, key: Optional[Array], mix: Array,
               target: Optional[Array]):
        """Pad to the VAE hop and encode mix (B,1,T)->(B,1,D,Tl) and targets
        (B,n,T)->(B,n,D,Tl) (reference: src/diffsep_latent.py:107-118).
        Sources fold into the batch axis for one encoder call. A PRNG key
        samples the VAE posterior (the reference's torch encode samples);
        key=None takes the mode."""
        hop = self.vae.downsampling_ratio
        k1 = k2 = None
        if key is not None:
            k1, k2 = jax.random.split(key)
        mix_p = sep_utils.pad_to_hop(mix, hop)
        mix_lat = self.vae.apply(vae_params, mix_p, key=k1,
                                 method=self.vae.encode)
        mix_lat = jax.lax.stop_gradient(mix_lat[:, None])  # (B,1,D,Tl)
        tgt_lat = None
        if target is not None:
            tgt_p = sep_utils.pad_to_hop(target, hop)
            b, n, t = tgt_p.shape
            flat = tgt_p.reshape(b * n, 1, t)
            lat = self.vae.apply(vae_params, flat, key=k2,
                                 method=self.vae.encode)
            tgt_lat = jax.lax.stop_gradient(
                lat.reshape(b, n, lat.shape[1], lat.shape[2]))
        return mix_lat, tgt_lat

    def decode(self, vae_params, est: Array,
               target_dim: Optional[int] = None) -> Array:
        """(B, n_src, D, Tl) -> (B, n_src, T) waveforms
        (reference: src/diffsep_latent.py:120-128)."""
        b, n, d, tl = est.shape
        flat = est.reshape(b * n, d, tl)
        dec = self.vae.apply(vae_params, flat, method=self.vae.decode)
        assert dec.shape[1] == 1, (
            "latent separation decodes mono waveforms; a multi-channel "
            f"VAE (out_channels={dec.shape[1]}) would be silently "
            "flattened into the time axis")
        dec = dec.reshape(b, n, -1)
        if target_dim is not None:
            dec = dec[..., :target_dim]
        return dec

    def training_loss_latent(self, params, vae_params, key, mix, target, *,
                             train=True, rngs=None) -> Array:
        """Encode then run the standard loss mixture. NOTE: the latent
        trainer does NOT normalize the batch (reference:
        src/diffsep_latent.py:210-214 encodes the raw batch)."""
        k_enc, k_loss = jax.random.split(key)
        mix_lat, tgt_lat = self.encode(vae_params, k_enc, mix, target)
        return self.training_loss(params, k_loss, mix_lat, tgt_lat,
                                  train=train, rngs=rngs)

    def train_step_latent(self, state, vae_params, key, batch):
        """Full jitted step, VAE frozen (reference optimizes only
        score-model params when trainable_vae is False,
        src/diffsep_latent.py:283-287)."""
        import optax
        mix, target = batch

        def loss_fn(p):
            return self.training_loss_latent(
                p, vae_params, key, mix, target, train=True)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        tx = self.make_optimizer()
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        d = self.cfg.ema_decay
        ema_params = jax.tree.map(
            lambda e, p: d * e + (1.0 - d) * p, state.ema_params, params)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema_params)
        return new_state, {
            "train/score_loss": loss,
            "train/grad_norm": optax.global_norm(grads),
        }

    def separate_latent(self, params, vae_params, key, mix, *,
                        latent: bool = False,
                        target_dim: Optional[int] = None,
                        N: Optional[int] = None, enc_noise=None,
                        sampler: str = "pc", **kwargs):
        """Encode -> PC sample ('ald' corrector) -> decode
        (reference: src/diffsep_latent.py:471-487). ``enc_noise`` injects
        the VAE posterior draw ((B, D, Tl) standard normal) for parity
        oracles; ``kwargs`` reach the chosen sampler (pc: e.g. its own
        ``noise`` for matched-noise oracles; ab2: e.g. ``stochastic`` —
        ab2 takes no injected noise). ``sampler='ab2'`` swaps in the
        2nd-order multistep integrator (one score eval per step):
        docs/latent_nfe_r05.json measures AB2 at NFE 30 matching PC at
        NFE 60 on this pipeline."""
        cfg = self.cfg
        k_enc, k_samp = jax.random.split(key)
        if not latent:
            if enc_noise is not None:
                hop = self.vae.downsampling_ratio
                mix_p = sep_utils.pad_to_hop(mix, hop)
                mix = self.vae.apply(vae_params, mix_p, noise=enc_noise,
                                     method=self.vae.encode)[:, None]
            else:
                mix, _ = self.encode(vae_params, k_enc, mix, None)
        score_fn = lambda x, t, y: self.model_fwd(params, x, t, y)
        if sampler == "ab2":
            est, nfe = ab2_sample(
                self.sde, score_fn, k_samp, mix,
                N=cfg.sampler_N if N is None else N,
                eps=cfg.t_eps, n_spkrs=cfg.n_speakers, **kwargs)
        else:
            est, nfe = pc_sample(
                self.sde, score_fn, k_samp, mix,
                predictor="reverse_diffusion", corrector="ald",
                N=cfg.sampler_N if N is None else N,
                snr=cfg.sampler_snr,
                corrector_steps=cfg.sampler_corrector_steps,
                denoise=True, eps=cfg.t_eps, n_spkrs=cfg.n_speakers,
                **kwargs)
        est = self.decode(vae_params, est, target_dim)
        return est, nfe

    def val_metrics_latent(self, params, vae_params, key, batch,
                           return_est: bool = False, **kwargs):
        """Latent separation + SI-SDR for validation; return_est also
        hands back the decoded estimates for rich-media val demos
        (same schema as DiffSepTrainer.val_separation_metrics; one
        deliberate difference: zero_mean=False here vs True there — the
        reference's latent config explicitly sets zero_mean: false for
        its val SISDRLoss, latent_diffsep_ouve/model/default.yaml, while
        the waveform config sets true, so the two pipelines' val/si_sdr
        are not directly comparable in the reference either)."""
        mix, target = batch
        est, _ = self.separate_latent(params, vae_params, key, mix,
                                      target_dim=target.shape[-1], **kwargs)
        si_sdr = loss_lib.si_sdr_loss(
            est, target, zero_mean=False, clamp_db=30.0, sign_flip=True)
        metrics = {"val/si_sdr": si_sdr}
        if return_est:
            return metrics, est
        return metrics
