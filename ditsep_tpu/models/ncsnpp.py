"""NCSN++ 2-D U-Net score network (Flax / NHWC).

TPU-native re-implementation of the score_sde NCSN++ backbone
(reference: src/models/diffsep/ncsnpp.py:40-478). Same architecture family:
Gaussian-Fourier time embedding, BigGAN residual blocks with fused FIR
resampling, channel self-attention at the configured resolution,
input_skip / output_skip progressive pyramids, scale-by-sigma output.

Design notes
------------
* Channel-last (NHWC): channels ride the 128-lane axis so every 1x1
  conv / NIN / attention einsum is a straight MXU matmul and GroupNorm is a
  lane-wise reduction. The reference is NCHW (CUDA-native); the importer
  transposes.
* Submodules live in a flat list named ``all_modules_{i}`` in the exact
  construction order of the reference's ``nn.ModuleList`` index walk
  (reference: ncsnpp.py:107-309), making torch checkpoint import a
  mechanical rename (see ditsep_tpu.models.torch_import).
* The attention placement check uses the *static* resolution schedule
  (``image_size // 2**level``) rather than the runtime H (reference:
  ncsnpp.py:369 checks ``h.shape[-2]``); both agree whenever the input
  height equals ``image_size``, which every shipped config guarantees
  (H = n_fft//2+1 = 256 for the waveform model, latent_dim = 64 for the
  latent model). Static checks keep the graph shape-independent under jit.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.models import layers as L

Array = jax.Array


class NCSNpp(nn.Module):
    """NCSN++ U-Net. Config attributes mirror the reference constructor
    (reference: src/models/diffsep/ncsnpp.py:48-74)."""

    scale_by_sigma: bool = True
    nonlinearity: str = "swish"
    nf: int = 128
    ch_mult: Sequence[int] = (1, 2, 1, 1, 1)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (4, 8, 16)
    resamp_with_conv: bool = True
    conditional: bool = True
    fir: bool = True
    fir_kernel: Sequence[float] = (1, 3, 3, 1)
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    progressive: str = "output_skip"
    progressive_input: str = "input_skip"
    progressive_combine: str = "sum"
    init_scale: float = 0.0
    fourier_scale: float = 16.0
    image_size: int = 64
    num_channels_in: int = 4
    num_channels_out: int = 4
    embedding_type: str = "fourier"
    dropout: float = 0.0
    centered: bool = False
    dtype: Any = None

    def setup(self):
        assert self.progressive in ("none", "output_skip", "residual")
        assert self.progressive_input in ("none", "input_skip", "residual")
        assert self.embedding_type == "fourier", (
            "only the fourier embedding is wired into the shipped configs "
            "(reference: ncsnpp.py:109-120)")
        act = L.get_act(self.nonlinearity)
        self.act = act
        nf = self.nf
        ch_mult = tuple(self.ch_mult)
        num_resolutions = len(ch_mult)
        all_resolutions = [
            self.image_size // (2 ** i) for i in range(num_resolutions)
        ]
        self.num_resolutions = num_resolutions
        self.all_resolutions = all_resolutions
        combine_method = self.progressive_combine.lower()

        def ResnetBlock(out_ch=None, up=False, down=False):
            if self.resblock_type == "biggan":
                return L.ResnetBlockBigGANpp(
                    act=act, out_ch=out_ch, up=up, down=down,
                    dropout=self.dropout, fir=self.fir,
                    fir_kernel=tuple(self.fir_kernel),
                    skip_rescale=self.skip_rescale,
                    init_scale=self.init_scale, dtype=self.dtype,
                )
            if self.resblock_type == "ddpm":
                return L.ResnetBlockDDPMpp(
                    act=act, out_ch=out_ch, dropout=self.dropout,
                    skip_rescale=self.skip_rescale,
                    init_scale=self.init_scale, dtype=self.dtype,
                )
            raise ValueError(
                f"resblock type {self.resblock_type} unrecognized.")

        def AttnBlock():
            return L.AttnBlockpp(
                skip_rescale=self.skip_rescale, init_scale=self.init_scale,
                dtype=self.dtype,
            )

        modules = []
        # -- time embedding -------------------------------------------------
        modules.append(L.GaussianFourierProjection(
            embedding_size=nf, scale=self.fourier_scale))
        if self.conditional:
            modules.append(nn.Dense(
                nf * 4, kernel_init=L.default_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype))
            modules.append(nn.Dense(
                nf * 4, kernel_init=L.default_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype))

        channels = self.num_channels_in

        # -- down path ------------------------------------------------------
        modules.append(L.conv3x3(nf, dtype=self.dtype))
        hs_c = [nf]
        in_ch = nf
        # static plan of the forward walk, recorded alongside construction
        for i_level in range(num_resolutions):
            for i_block in range(self.num_res_blocks):
                out_ch = nf * ch_mult[i_level]
                modules.append(ResnetBlock(out_ch=out_ch))
                in_ch = out_ch
                if all_resolutions[i_level] in self.attn_resolutions:
                    modules.append(AttnBlock())
                hs_c.append(in_ch)
            if i_level != num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    modules.append(L.Downsample(
                        with_conv=self.resamp_with_conv, fir=self.fir,
                        fir_kernel=tuple(self.fir_kernel), dtype=self.dtype))
                else:
                    modules.append(ResnetBlock(down=True))
                if self.progressive_input == "input_skip":
                    modules.append(L.Combine(
                        dim2=in_ch, method=combine_method, dtype=self.dtype))
                    if combine_method == "cat":
                        in_ch *= 2
                elif self.progressive_input == "residual":
                    modules.append(L.Downsample(
                        out_ch=in_ch, with_conv=True, fir=self.fir,
                        fir_kernel=tuple(self.fir_kernel), dtype=self.dtype))
                hs_c.append(in_ch)

        # -- middle ---------------------------------------------------------
        modules.append(ResnetBlock())
        modules.append(AttnBlock())
        modules.append(ResnetBlock())

        # -- up path --------------------------------------------------------
        pyramid_ch = 0
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                out_ch = nf * ch_mult[i_level]
                hs_c.pop()
                modules.append(ResnetBlock(out_ch=out_ch))
                in_ch = out_ch
            if all_resolutions[i_level] in self.attn_resolutions:
                modules.append(AttnBlock())
            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    modules.append(L.group_norm(in_ch, dtype=self.dtype))
                    if self.progressive == "output_skip":
                        modules.append(L.conv3x3(
                            channels, init_scale=self.init_scale,
                            dtype=self.dtype))
                        pyramid_ch = channels
                    else:  # residual
                        modules.append(L.conv3x3(in_ch, dtype=self.dtype))
                        pyramid_ch = in_ch
                else:
                    if self.progressive == "output_skip":
                        modules.append(L.group_norm(in_ch, dtype=self.dtype))
                        modules.append(L.conv3x3(
                            channels, bias=True, init_scale=self.init_scale,
                            dtype=self.dtype))
                        pyramid_ch = channels
                    else:  # residual
                        modules.append(L.Upsample(
                            out_ch=in_ch, with_conv=True, fir=self.fir,
                            fir_kernel=tuple(self.fir_kernel),
                            dtype=self.dtype))
                        pyramid_ch = in_ch
            if i_level != 0:
                if self.resblock_type == "ddpm":
                    modules.append(L.Upsample(
                        with_conv=self.resamp_with_conv, fir=self.fir,
                        fir_kernel=tuple(self.fir_kernel), dtype=self.dtype))
                else:
                    modules.append(ResnetBlock(up=True))
        assert not hs_c

        if self.progressive != "output_skip":
            modules.append(L.group_norm(in_ch, dtype=self.dtype))
            modules.append(L.conv3x3(
                channels, init_scale=self.init_scale, dtype=self.dtype))

        self.all_modules = modules

        # parameter-free pyramid resamplers
        self.pyramid_upsample = L.Upsample(
            fir=self.fir, fir_kernel=tuple(self.fir_kernel), with_conv=False,
            dtype=self.dtype)
        self.pyramid_downsample = L.Downsample(
            fir=self.fir, fir_kernel=tuple(self.fir_kernel), with_conv=False,
            dtype=self.dtype)

        # final 1x1 projection (separate from all_modules, reference
        # ncsnpp.py:105)
        self.output_layer = nn.Conv(
            self.num_channels_out, (1, 1), padding="VALID", dtype=self.dtype,
            name="output_layer")

    def __call__(self, x: Array, time_cond: Array, *,
                 train: bool = False,
                 time_mask: Array = None) -> Array:
        """Args: x (B, H, W, C_in) NHWC; time_cond (B,).
        Returns (B, H, W, C_out). Mirrors the reference index walk
        (reference: ncsnpp.py:320-478).

        ``time_mask`` (B, W) bool marks valid time columns; when given,
        every GroupNorm computes statistics over valid columns only and
        attention keys in padded columns are masked out. This removes
        the %64 frame-pad dilution the reference architecture suffers at
        unlucky utterance lengths (measured: docs/pad_dilution_r03.md) —
        an extension beyond the reference; omit for exact reference
        semantics (e.g. imported checkpoints)."""
        modules = self.all_modules
        m_idx = 0
        det = not train

        if time_mask is None:
            masks = [None] * self.num_resolutions
        else:
            masks = [time_mask.astype(bool)]
            for _ in range(self.num_resolutions - 1):
                masks.append(L.pool_time_mask(masks[-1]))

        used_sigmas = time_cond
        temb = modules[m_idx](jnp.log(used_sigmas))
        m_idx += 1
        if self.conditional:
            temb = modules[m_idx](temb)
            m_idx += 1
            temb = modules[m_idx](self.act(temb))
            m_idx += 1
        else:
            temb = None

        if not self.centered:
            x = 2.0 * x - 1.0

        input_pyramid = None
        if self.progressive_input != "none":
            input_pyramid = x

        hs = [modules[m_idx](x)]
        m_idx += 1

        # -- down path ------------------------------------------------------
        for i_level in range(self.num_resolutions):
            for i_block in range(self.num_res_blocks):
                h = modules[m_idx](hs[-1], temb, deterministic=det,
                                   tmask=masks[i_level])
                m_idx += 1
                if self.all_resolutions[i_level] in self.attn_resolutions:
                    h = modules[m_idx](h, tmask=masks[i_level])
                    m_idx += 1
                hs.append(h)
            if i_level != self.num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    h = modules[m_idx](hs[-1])
                    m_idx += 1
                else:
                    h = modules[m_idx](hs[-1], temb, deterministic=det,
                                       tmask=masks[i_level],
                                       tmask_out=masks[i_level + 1])
                    m_idx += 1
                if self.progressive_input == "input_skip":
                    input_pyramid = self.pyramid_downsample(input_pyramid)
                    h = modules[m_idx](input_pyramid, h)
                    m_idx += 1
                elif self.progressive_input == "residual":
                    input_pyramid = modules[m_idx](input_pyramid)
                    m_idx += 1
                    if self.skip_rescale:
                        input_pyramid = (input_pyramid + h) / math.sqrt(2.0)
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        # -- middle ---------------------------------------------------------
        h = hs[-1]
        h = modules[m_idx](h, temb, deterministic=det, tmask=masks[-1])
        m_idx += 1
        h = modules[m_idx](h, tmask=masks[-1])
        m_idx += 1
        h = modules[m_idx](h, temb, deterministic=det, tmask=masks[-1])
        m_idx += 1

        pyramid = None

        # -- up path --------------------------------------------------------
        for i_level in reversed(range(self.num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                h = modules[m_idx](
                    jnp.concatenate([h, hs.pop()], axis=-1), temb,
                    deterministic=det, tmask=masks[i_level])
                m_idx += 1
            if self.all_resolutions[i_level] in self.attn_resolutions:
                h = modules[m_idx](h, tmask=masks[i_level])
                m_idx += 1
            if self.progressive != "none":
                gm = L.time_mask_to_gn(masks[i_level], h)
                if i_level == self.num_resolutions - 1:
                    pyramid = self.act(modules[m_idx](h, mask=gm))
                    m_idx += 1
                    pyramid = modules[m_idx](pyramid)
                    m_idx += 1
                else:
                    if self.progressive == "output_skip":
                        pyramid = self.pyramid_upsample(pyramid)
                        pyramid_h = self.act(modules[m_idx](h, mask=gm))
                        m_idx += 1
                        pyramid_h = modules[m_idx](pyramid_h)
                        m_idx += 1
                        pyramid = pyramid + pyramid_h
                    else:  # residual
                        pyramid = modules[m_idx](pyramid)
                        m_idx += 1
                        if self.skip_rescale:
                            pyramid = (pyramid + h) / math.sqrt(2.0)
                        else:
                            pyramid = pyramid + h
                        h = pyramid
            if i_level != 0:
                if self.resblock_type == "ddpm":
                    h = modules[m_idx](h)
                    m_idx += 1
                else:
                    h = modules[m_idx](h, temb, deterministic=det,
                                       tmask=masks[i_level],
                                       tmask_out=masks[i_level - 1])
                    m_idx += 1
        assert not hs

        if self.progressive == "output_skip":
            h = pyramid
        else:
            h = self.act(modules[m_idx](
                h, mask=L.time_mask_to_gn(masks[0], h)))
            m_idx += 1
            h = modules[m_idx](h)
            m_idx += 1

        assert m_idx == len(modules), "implementation error"
        if self.scale_by_sigma:
            h = h / used_sigmas.reshape((-1, 1, 1, 1))
        h = self.output_layer(h)
        return h
