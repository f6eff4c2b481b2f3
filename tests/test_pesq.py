"""Tests for the in-repo ITU-T P.862 PESQ implementation.

The reference computes PESQ on every evaluated utterance
(reference: src/evaluate_mp.py:171-189) and the Hu & Loizou composites
are affine in PESQ (src/evaluate/evaluate_covl.py:18-56). These tests
assert the verdict-required properties: finite scores on synthetic pairs,
the identical-signal ceiling, monotonicity in additive-noise SNR,
robustness to delay and gain, and finite composite COVL.
"""
import numpy as np
import pytest

from ditsep_tpu.eval.composite import eval_composite
from ditsep_tpu.eval.metrics import compute_metrics, pesq_metric
from ditsep_tpu.eval.pesq_p862 import pesq, pesq_raw


def _speechlike(fs: int = 8000, seconds: float = 3.0, f0: float = 140.0,
                seed: int = 0) -> np.ndarray:
    """Deterministic speech-like signal: AM-modulated harmonic stack with
    pause structure (enough envelope variation for the VAD/alignment)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * fs)) / fs
    sig = sum(np.sin(2 * np.pi * f0 * k * t + k) / k for k in range(1, 12))
    gate = (rng.random(len(t) // 800 + 1).repeat(800)[: len(t)] > 0.3)
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t)) * gate
    out = sig * env
    return out / np.abs(out).max()


@pytest.fixture(scope="module")
def clean():
    return _speechlike()


def test_identical_signals_score_ceiling(clean):
    v = pesq(8000, clean, clean)
    assert 4.5 < v < 4.6  # ITU implementations give ~4.55 for nb
    assert abs(pesq_raw(clean, clean, 8000) - 4.5) < 1e-6


def test_monotone_in_snr(clean):
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(clean))
    noise /= np.sqrt((noise ** 2).mean())
    rms = np.sqrt((clean ** 2).mean())
    scores = []
    for snr in [40, 20, 10, 0]:
        deg = clean + noise * rms * 10 ** (-snr / 20)
        scores.append(pesq(8000, clean, deg))
    assert all(np.isfinite(scores))
    assert all(a > b for a, b in zip(scores, scores[1:]))
    assert scores[0] > 3.0       # barely audible noise
    assert scores[-1] < 2.0      # 0 dB SNR is bad


def test_gain_and_delay_invariance(clean):
    ceiling = pesq(8000, clean, clean)
    assert abs(pesq(8000, clean, 0.25 * clean) - ceiling) < 0.05
    delayed = np.concatenate([np.zeros(400), clean])[: len(clean)]
    assert abs(pesq(8000, clean, delayed) - ceiling) < 0.05


def test_distortion_ranking(clean):
    clipped = np.clip(clean, -0.2, 0.2)
    unrelated = _speechlike(f0=190.0, seed=7)
    v_clip = pesq(8000, clean, clipped)
    v_unrel = pesq(8000, clean, unrelated)
    assert 1.0 <= v_unrel < v_clip < 4.0


def test_wideband_mode(clean):
    fs = 16000
    x = np.repeat(clean, 2)  # crude upsample; content is what matters
    v = pesq(fs, x, x, mode="wb")
    assert 4.5 < v < 4.7
    with pytest.raises(ValueError):
        pesq(8000, clean, clean, mode="wb")
    with pytest.raises(ValueError):
        pesq(44100, clean, clean)


def test_too_short_returns_nan():
    x = np.zeros(100)
    assert np.isnan(pesq(8000, x, x))


def test_pesq_metric_finite(clean):
    v = pesq_metric(clean, clean + 0.01 * _speechlike(seed=3), 8000)
    assert np.isfinite(v) and 1.0 <= v <= 5.0


def test_compute_metrics_pesq_finite():
    rng = np.random.default_rng(0)
    tgt = np.stack([_speechlike(seed=1), _speechlike(f0=200.0, seed=2)])
    mix = tgt.sum(0, keepdims=True)
    est = tgt + 0.02 * rng.standard_normal(tgt.shape)
    m = compute_metrics(mix, est, tgt, fs=8000)
    assert np.isfinite(m["pesq"]) and m["pesq"] > 1.0


def test_composite_finite(clean):
    rng = np.random.default_rng(2)
    deg = clean + 0.05 * rng.standard_normal(len(clean))
    res = eval_composite(clean, deg, fs=8000)
    for k in ("csig", "cbak", "covl", "pesq"):
        assert np.isfinite(res[k]), k
    assert 1.0 <= res["covl"] <= 5.0
    # cleaner estimate must score a better or equal COVL
    res_clean = eval_composite(clean, clean + 1e-4 * rng.standard_normal(
        len(clean)), fs=8000)
    assert res_clean["covl"] >= res["covl"]
