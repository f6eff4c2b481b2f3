"""Visualization helpers (reference: aeiou.py:18-279, figure scripts)."""
import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")


def test_mel_filterbank_properties():
    from ditsep_tpu.viz import _mel_filterbank
    fb = _mel_filterbank(fs=8000, n_fft=512, n_mels=40)
    assert fb.shape == (40, 257)
    assert (fb >= 0).all()
    # every filter has support, peaks move up in frequency
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all() and fb.sum(axis=1).min() > 0
    # slaney norm: filter areas are ~equal (2/(hi-lo) scaling)
    areas = fb.sum(axis=1)
    assert areas.max() / areas.min() < 1.6


def test_mel_spectrogram_shapes_and_db():
    from ditsep_tpu.viz import mel_spectrogram, power_to_db
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32)
    mel = mel_spectrogram(x, fs=8000, n_fft=512, n_mels=32)
    assert mel.shape[0] == 32 and mel.shape[1] > 0 and (mel >= 0).all()
    db = power_to_db(mel)
    assert np.isfinite(db).all() and db.max() - db.min() <= 80.0 + 1e-6
    # a pure tone concentrates energy in one mel band
    tone = np.sin(2 * np.pi * 1000 * np.arange(8000) / 8000)
    mt = mel_spectrogram(tone, fs=8000, n_fft=512, n_mels=32).mean(axis=1)
    assert mt.argmax() not in (0, 31)


def test_figures_render():
    from ditsep_tpu import viz
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32)
    est = rng.standard_normal((2, 4096)).astype(np.float32)
    figs = [
        viz.spectrogram_image(x, n_fft=254, hop=64),
        viz.audio_spectrogram_image(x, n_fft=512, n_mels=32),
        viz.separation_figure(x, est, target=est),
        viz.latent_pca_point_cloud(rng.standard_normal((2, 8, 50))),
        viz.tokens_spectrogram_image(
            rng.standard_normal((2, 8, 50)), mark_batches=True),
    ]
    for f in figs:
        assert f.axes  # rendered with at least one axis
        import matplotlib.pyplot as plt
        plt.close(f)
