"""Ops tests: upfirdn2d / FIR resampling / fused bias-act / STFT.

Oracles are independent numpy/scipy/torch implementations of the op
contracts (zero-stuff -> pad -> true 2-D convolution -> stride), NOT the
reference code. torch.stft/istft serve as the golden STFT semantics
(the reference uses torchaudio wrappers around the same functions,
reference: src/models/diffsep/score_models.py:28-30).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as sp_signal

from ditsep_tpu.ops import (
    conv_downsample_2d,
    downsample_2d,
    fused_leaky_relu,
    istft,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_fir_kernel,
    stft,
    upfirdn2d,
    upfirdn2d_nchw,
    upsample_2d,
    upsample_conv_2d,
)


def upfirdn2d_oracle(x, k, up=1, down=1, pad=(0, 0)):
    """Numpy oracle from the op contract: zero-stuff by `up` (trailing zeros
    kept), zero-pad by `pad` (negative = crop), true 2-D convolution with
    `k`, then keep every `down`-th sample."""
    n, c, h, w = x.shape
    p0, p1 = pad
    z = np.zeros((n, c, h * up, w * up), dtype=np.float64)
    z[:, :, ::up, ::up] = x
    # pad / crop
    hp = z.shape[2] + p0 + p1
    wp = z.shape[3] + p0 + p1
    padded = np.zeros((n, c, max(hp, 0), max(wp, 0)), dtype=np.float64)
    src_y = slice(max(-p0, 0), z.shape[2] - max(-p1, 0))
    src_x = slice(max(-p0, 0), z.shape[3] - max(-p1, 0))
    dst_y = slice(max(p0, 0), max(p0, 0) + (src_y.stop - src_y.start))
    dst_x = slice(max(p0, 0), max(p0, 0) + (src_x.stop - src_x.start))
    padded[:, :, dst_y, dst_x] = z[:, :, src_y, src_x]
    out = np.stack(
        [
            np.stack(
                [
                    sp_signal.convolve2d(padded[i, j], k, mode="valid")
                    for j in range(c)
                ]
            )
            for i in range(n)
        ]
    )
    return out[:, :, ::down, ::down]


FIR_K = setup_fir_kernel([1, 3, 3, 1])


class TestUpfirdn2d:
    @pytest.mark.parametrize(
        "up,down,pad",
        [
            (1, 1, (1, 2)),
            (2, 1, (2, 1)),
            (1, 2, (1, 2)),
            (2, 2, (3, 1)),
            (1, 1, (0, 0)),
            (1, 2, (-1, 2)),  # negative padding
        ],
    )
    def test_matches_oracle(self, up, down, pad):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 12, 10)).astype(np.float32)
        k = FIR_K
        got = upfirdn2d_nchw(jnp.asarray(x), jnp.asarray(k), up=up, down=down,
                             pad=pad)
        want = upfirdn2d_oracle(x, k, up=up, down=down, pad=pad)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_differentiable(self):
        x = jnp.ones((1, 8, 8, 2))
        k = jnp.asarray(FIR_K)

        def f(x):
            return upfirdn2d(x, k, up=2, pad=(2, 1)).sum()

        g = jax.grad(f)(x)
        assert g.shape == x.shape
        assert bool(jnp.isfinite(g).all())
        # double-backward exists (reference needed a custom CUDA bwd for this)
        h = jax.grad(lambda x: jax.grad(f)(x).sum())(x)
        assert bool(jnp.isfinite(h).all())


class TestFIRResample:
    def test_upsample_preserves_dc(self):
        x = jnp.full((1, 8, 8, 3), 2.0)
        y = upsample_2d(x, [1, 3, 3, 1], factor=2)
        assert y.shape == (1, 16, 16, 3)
        # away from borders the DC level is preserved
        np.testing.assert_allclose(y[0, 4:12, 4:12, :], 2.0, rtol=1e-4)

    def test_downsample_preserves_dc(self):
        x = jnp.full((1, 16, 16, 3), 2.0)
        y = downsample_2d(x, [1, 3, 3, 1], factor=2)
        assert y.shape == (1, 8, 8, 3)
        np.testing.assert_allclose(y[0, 2:6, 2:6, :], 2.0, rtol=1e-4)

    def test_naive_up_down(self):
        x = jnp.arange(16.0).reshape(1, 2, 2, 4)
        up = naive_upsample_2d(x, 2)
        assert up.shape == (1, 4, 4, 4)
        np.testing.assert_allclose(naive_downsample_2d(up, 2), x)

    def test_upsample_matches_oracle_chain(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 2, 8, 8)).astype(np.float32)
        k = setup_fir_kernel([1, 3, 3, 1], gain=4.0)
        p = k.shape[0] - 2
        want = upfirdn2d_oracle(x, k, up=2, down=1,
                                pad=((p + 1) // 2 + 1, p // 2))
        got = upsample_2d(jnp.asarray(x).transpose(0, 2, 3, 1), [1, 3, 3, 1])
        got = jnp.transpose(got, (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_upsample_conv_matches_torch_chain(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        cin, cout, kk = 3, 5, 3
        x = rng.normal(size=(2, cin, 9, 7)).astype(np.float32)
        w = rng.normal(size=(kk, kk, cin, cout)).astype(np.float32) * 0.2

        got = upsample_conv_2d(
            jnp.asarray(x).transpose(0, 2, 3, 1), jnp.asarray(w),
            k=[1, 3, 3, 1], factor=2,
        )
        got = np.asarray(jnp.transpose(got, (0, 3, 1, 2)))

        # oracle: torch conv_transpose2d (stride 2, VALID) + numpy upfirdn
        wt = torch.from_numpy(np.transpose(w, (2, 3, 0, 1)))  # (cin,cout,kh,kw)
        mid = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), wt, stride=2
        ).numpy()
        kern = setup_fir_kernel([1, 3, 3, 1], gain=4.0)
        p = (kern.shape[0] - 2) - (kk - 1)
        want = upfirdn2d_oracle(mid, kern, pad=((p + 1) // 2 + 1, p // 2 + 1))
        assert got.shape == want.shape == (2, cout, 18, 14)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_conv_downsample_matches_torch_chain(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        cin, cout, kk = 4, 6, 3
        x = rng.normal(size=(2, cin, 12, 16)).astype(np.float32)
        w = rng.normal(size=(kk, kk, cin, cout)).astype(np.float32) * 0.2

        got = conv_downsample_2d(
            jnp.asarray(x).transpose(0, 2, 3, 1), jnp.asarray(w),
            k=[1, 3, 3, 1], factor=2,
        )
        got = np.asarray(jnp.transpose(got, (0, 3, 1, 2)))

        kern = setup_fir_kernel([1, 3, 3, 1])
        p = (kern.shape[0] - 2) + (kk - 1)
        mid = upfirdn2d_oracle(x, kern, pad=((p + 1) // 2, p // 2))
        wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # (cout,cin,kh,kw)
        want = torch.nn.functional.conv2d(
            torch.from_numpy(mid.astype(np.float32)), wt, stride=2
        ).numpy()
        assert got.shape == want.shape == (2, cout, 6, 8)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestFusedAct:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
        b = rng.normal(size=(8,)).astype(np.float32)
        got = fused_leaky_relu(jnp.asarray(x), jnp.asarray(b))
        want = (
            torch.nn.functional.leaky_relu(
                torch.from_numpy(x) + torch.from_numpy(b), 0.2
            )
            * math.sqrt(2.0)
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestSTFT:
    N_FFT, HOP = 510, 128

    def test_matches_torch_stft(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(5)
        x = rng.normal(size=(3, 4000)).astype(np.float32)
        got = stft(jnp.asarray(x), self.N_FFT, self.HOP)
        want = torch.stft(
            torch.from_numpy(x),
            n_fft=self.N_FFT,
            hop_length=self.HOP,
            window=torch.hann_window(self.N_FFT),
            center=True,
            pad_mode="constant",
            return_complex=True,
        ).numpy()
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)

    def test_matches_torch_istft(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(6)
        x = rng.normal(size=(2, 3968)).astype(np.float32)  # multiple of hop
        spec = torch.stft(
            torch.from_numpy(x),
            n_fft=self.N_FFT,
            hop_length=self.HOP,
            window=torch.hann_window(self.N_FFT),
            center=True,
            pad_mode="constant",
            return_complex=True,
        )
        want = torch.istft(
            spec,
            n_fft=self.N_FFT,
            hop_length=self.HOP,
            window=torch.hann_window(self.N_FFT),
            center=True,
        ).numpy()
        got = istft(jnp.asarray(spec.numpy()), self.N_FFT, self.HOP)
        assert got.shape[-1] == want.shape[-1]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)

    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        x = rng.normal(size=(1, 2, 8192)).astype(np.float32)
        spec = stft(jnp.asarray(x), self.N_FFT, self.HOP)
        back = istft(spec, self.N_FFT, self.HOP, length=8192)
        np.testing.assert_allclose(np.asarray(back), x, rtol=1e-3, atol=1e-4)

    def test_reference_padding_convention(self):
        """The score model pads by n_fft - hop before the STFT
        (reference: score_models.py:107-116); frame count must then be
        ceil-aligned so iSTFT can reproduce the original length."""
        t = 8000
        x = jnp.ones((1, t))
        xp = jnp.pad(x, ((0, 0), (0, self.N_FFT - self.HOP)))
        spec = stft(xp, self.N_FFT, self.HOP)
        y = istft(spec, self.N_FFT, self.HOP)
        assert y.shape[-1] >= t

    def test_jit_and_grad(self):
        x = jnp.ones((1, 2048))

        def f(x):
            s = stft(x, self.N_FFT, self.HOP)
            return jnp.sum(jnp.abs(s) ** 2)

        g = jax.jit(jax.grad(f))(x)
        assert bool(jnp.isfinite(g).all())
