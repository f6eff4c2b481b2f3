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
    m = compute_metrics(est, tgt, fs=8000)
    assert all(np.isfinite(v) and v > 1.0 for v in m["pesq"])


def test_utterance_align_recovers_per_utterance_delay():
    """Two utterances where the second is shifted +20 ms (a time-warped
    recording): per-utterance alignment must restore both spans
    (P.862 utterance splitting; previously only one global delay)."""
    from ditsep_tpu.eval.pesq_p862 import _utterance_align

    fs = 8000
    t = np.arange(fs) / fs
    # constant-envelope harmonic burst: the VAD detects the full span
    utt = 0.5 * (np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(
        2 * np.pi * 440 * t + 0.7))
    gap = np.zeros(int(0.5 * fs))
    ref = np.concatenate([utt, gap, utt * 0.8, gap])
    shift = int(0.02 * fs)
    # second utterance delayed by `shift` samples
    deg = ref.copy()
    start2 = len(utt) + len(gap)
    deg[start2:start2 + len(utt)] = 0.0
    deg[start2 + shift:start2 + shift + len(utt)] = utt * 0.8
    out = _utterance_align(ref, deg, fs)
    n = min(len(out), len(ref))
    err = np.abs(out[:n] - ref[:n])
    # both utterance spans re-aligned to near-zero error (edges excluded:
    # the VAD span boundary frames keep the global alignment)
    assert err[100:len(utt) - 100].max() < 1e-6
    assert err[start2 + 400:start2 + len(utt) - 400].max() < 1e-3


def test_utterance_warped_scores_near_ceiling():
    """A per-utterance time-warped copy of the reference must score near
    the ceiling now that utterances align independently."""
    fs = 8000
    t = np.arange(fs) / fs
    utt = 0.5 * (np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(
        2 * np.pi * 440 * t + 0.7))
    gap = np.zeros(int(0.5 * fs))
    ref = np.concatenate([utt, gap, utt * 0.8, gap])
    # second utterance arrives 20 ms early (time-warped recording)
    deg = np.concatenate([utt, gap[:-160], utt * 0.8, gap,
                          np.zeros(160)])[:len(ref)]
    v = pesq(8000, ref, deg)
    assert v > 4.0, v


def test_bad_interval_realignment_improves_score():
    """A locally-shifted chunk (gross disturbance in a few frames) must
    score better WITH bad-interval re-alignment than without."""
    fs = 8000
    clean = _speechlike(seconds=3.0)
    deg = clean.copy()
    lo, hi = int(1.0 * fs), int(1.3 * fs)
    shift = int(0.015 * fs)  # 15 ms local slip
    deg[lo:hi] = clean[lo + shift:hi + shift]
    with_fix = pesq_raw(clean, deg, fs, bad_interval=True)
    without = pesq_raw(clean, deg, fs, bad_interval=False)
    assert with_fix >= without
    # and the re-aligned score is decent (the slip is inaudible-ish)
    assert with_fix > 2.5


def test_band_edge_sensitivity_bound(clean):
    """Quantified bound on the analytic-vs-ITU band-table deviation:
    jittering every bark band edge by up to +-10% of a band width moves
    the MOS of a mid-quality pair by < 0.15 -- the documented deviation
    is second order at the precision this repo compares at."""
    import ditsep_tpu.eval.pesq_p862 as p862

    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(clean))
    deg = clean + noise * np.sqrt((clean ** 2).mean()) * 10 ** (-15 / 20)
    base = pesq(8000, clean, deg)
    try:
        p862._EDGE_PERTURB = 0.1
        jit = pesq(8000, clean, deg)
    finally:
        p862._EDGE_PERTURB = 0.0
    assert abs(jit - base) < 0.15, (base, jit)


def test_itu_calibration_when_available(clean):
    """Cross-check against the ITU-wrapping `pesq` package on synthetic
    pairs (<= 0.05 mean MOS deviation). Skipped with reason when the
    package is absent (this image: no egress, package not installed)."""
    itu = pytest.importorskip(
        "pesq", reason="ITU pesq package not installed in this image")
    rng = np.random.default_rng(0)
    devs = []
    for snr in [30, 20, 10, 5]:
        noise = rng.standard_normal(len(clean))
        deg = clean + noise * np.sqrt((clean ** 2).mean()) * 10 ** (
            -snr / 20)
        ours = pesq(8000, clean, deg)
        ref = itu.pesq(8000, clean, deg, "nb")
        devs.append(abs(ours - ref))
    assert float(np.mean(devs)) <= 0.05, devs


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
