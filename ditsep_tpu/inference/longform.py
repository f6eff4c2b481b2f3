"""Long-form separation: chunk -> sample -> align -> crossfade-stitch.

The diffusion separator is a fixed-window model (training crops 5 s;
reference: src/config/diffsep/datamodule/default.yaml:13) and the jitted
sampler wants static shapes. The reference never handles long inputs for
separation — its chunking exists only for the VAE codec
(src/stable_audio_tools/models/autoencoders.py:596-731: chunked
encode/decode with overlap trimming). This module brings the same
capability to the separation path, with one problem the codec never has:
**permutation ambiguity**. Each chunk's PC sampling orders the sources
arbitrarily, so adjacent chunks must be aligned before stitching — done
here by picking, per chunk, the source permutation maximizing summed
correlation with the previous chunk over their overlap, then linear
crossfading.

Host-side numpy orchestration around the jitted `separate_fn`: every
chunk has the SAME static shape (one XLA program), the alignment and
crossfade are O(overlap) host work between multi-second sampler calls.
"""
from __future__ import annotations

from itertools import permutations
from typing import Callable, Optional

import numpy as np


def align_permutation(prev_tail: np.ndarray, cur_head: np.ndarray
                      ) -> tuple:
    """Best source permutation of ``cur_head`` against ``prev_tail``.

    Both are (n_src, O) overlap segments. Returns the permutation ``p``
    (tuple of source indices) maximizing the summed normalized
    correlation ``sum_i corr(prev[i], cur[p[i]])`` — exhaustive over the
    n_src! permutations, exactly like the reference's PIT losses
    (n_src <= 3 everywhere, so at most 6 candidates)."""
    n = prev_tail.shape[0]
    a = prev_tail / (np.linalg.norm(prev_tail, axis=-1, keepdims=True)
                     + 1e-9)
    b = cur_head / (np.linalg.norm(cur_head, axis=-1, keepdims=True)
                    + 1e-9)
    corr = a @ b.T  # (n, n): corr[i, j] = <prev_i, cur_j>
    return max(permutations(range(n)),
               key=lambda p: sum(corr[i, p[i]] for i in range(n)))


def separate_longform(
    separate_fn: Callable,
    mix: np.ndarray,
    *,
    chunk_samples: int,
    overlap_samples: int,
    n_src: int = 2,
    key=None,
    seed: int = 0,
    pass_lengths: bool = False,
    progress: Optional[Callable[[int, int], None]] = None,
) -> np.ndarray:
    """Separate an arbitrarily long mono mixture with a fixed-window
    jitted separator.

    Parameters
    ----------
    separate_fn:
        ``separate_fn(key, mix (1, 1, chunk_samples)) ->
        (1, n_src, chunk_samples)`` — e.g. a jitted
        ``trainer.separate`` closure. Called once per chunk with the
        SAME static shape (one compile).
    mix:
        (T,) or (1, T) float mixture.
    chunk_samples / overlap_samples:
        window and overlap; hop = chunk - overlap. The last chunk is
        right-aligned at T so no tail is dropped (its overlap with the
        previous chunk can exceed ``overlap_samples``; the crossfade
        spans whatever actually overlaps).
    key:
        optional jax PRNGKey (split per chunk); default derives from
        ``seed``.
    pass_lengths:
        call ``separate_fn(key, chunk, lengths (1,) int32)`` with the
        chunk's VALID sample count — required for mask_padding score
        models when the input is shorter than one window, so the host
        zero-pad is masked out of normalization/attention statistics
        (docs/pad_dilution_r03.md) instead of silently counting as
        signal.

    Returns (n_src, T) with adjacent chunks permutation-aligned and
    linearly crossfaded.
    """
    import jax

    mix = np.asarray(mix, np.float32)
    if mix.ndim == 2 and mix.shape[0] == 1:
        mix = mix[0]
    if mix.ndim != 1:
        raise ValueError(
            f"expected mono (T,) or (1, T) mixture, got {mix.shape} — "
            "downmix multichannel audio before separation")
    T = mix.shape[-1]
    if not 0 <= overlap_samples < chunk_samples:
        raise ValueError("need 0 <= overlap_samples < chunk_samples")
    if overlap_samples == 0 and n_src > 1:
        raise ValueError(
            "overlap_samples must be > 0 for multi-source separation: "
            "the zero-length overlap carries no permutation-alignment "
            "signal, so stems would swap sources at chunk boundaries")
    if key is None:
        key = jax.random.PRNGKey(seed)

    def run(chunk: np.ndarray, k, valid: int) -> np.ndarray:
        args = ((np.asarray([valid], np.int32),) if pass_lengths else ())
        est = separate_fn(k, chunk[None, None, :], *args)
        return np.asarray(est)[0]  # (n_src, chunk)

    if T <= chunk_samples:  # single window: pad, sample, trim
        pad = chunk_samples - T
        key, sub = jax.random.split(key)
        est = run(np.pad(mix, (0, pad)), sub, T)
        return est[:, :T]

    hop = chunk_samples - overlap_samples
    starts = list(range(0, T - chunk_samples + 1, hop))
    if starts[-1] + chunk_samples < T:
        starts.append(T - chunk_samples)  # right-aligned tail chunk

    out = np.zeros((n_src, T), np.float32)
    prev_end = 0
    for ci, s in enumerate(starts):
        key, sub = jax.random.split(key)
        est = run(mix[s:s + chunk_samples], sub, chunk_samples)
        if ci == 0:
            out[:, :chunk_samples] = est
        else:
            ov = prev_end - s  # actual overlap (>= overlap_samples-ish)
            perm = align_permutation(out[:, s:prev_end],
                                     est[:, :ov])
            est = est[list(perm)]
            w = np.linspace(0.0, 1.0, ov, dtype=np.float32)
            out[:, s:prev_end] = (out[:, s:prev_end] * (1.0 - w)
                                  + est[:, :ov] * w)
            out[:, prev_end:s + chunk_samples] = est[:, ov:]
        prev_end = s + chunk_samples
        if progress is not None:
            progress(ci + 1, len(starts))
    return out
