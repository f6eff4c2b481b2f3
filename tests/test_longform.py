"""Long-form chunked separation: permutation alignment + crossfade.

The oracle separator returns the TRUE sources for each window (found by
locating the window in the global mixture) but in a key-dependent random
order — exactly the ambiguity real per-chunk PC sampling has. Stitching
must undo every swap and reproduce the sources end to end.
"""
import jax
import numpy as np
import pytest

from ditsep_tpu.inference import align_permutation, separate_longform

RNG = np.random.default_rng(0)
T = 20000
S = np.stack([RNG.standard_normal(T), RNG.standard_normal(T)]
             ).astype(np.float32)
MIX = S.sum(axis=0)


def _find_offset(chunk: np.ndarray) -> int:
    c = chunk.reshape(-1)
    L = c.shape[0]
    for s in range(T - L + 1):
        if MIX[s] == c[0] and np.array_equal(MIX[s:s + L], c):
            return s
    raise AssertionError("chunk not found in mixture")


def _oracle(key, chunk):
    """(1,1,C) padded window -> (1,2,C) true sources, randomly swapped."""
    c = np.asarray(chunk).reshape(-1)
    L = np.trim_zeros(c, "b").shape[0]  # single-window mode zero-pads
    s = _find_offset(c[:L])
    out = np.zeros((2, c.shape[0]), np.float32)
    out[:, :L] = S[:, s:s + L]
    if bool(jax.random.bernoulli(key)):
        out = out[::-1]
    return out[None]


def _global_perm_error(est):
    return min(np.abs(est - S).max(), np.abs(est[::-1] - S).max())


def test_align_permutation_detects_swap():
    a = S[:, :500]
    assert align_permutation(a, a) == (0, 1)
    assert align_permutation(a, a[::-1]) == (1, 0)


def test_longform_exact_stitch_with_oracle():
    est = separate_longform(_oracle, MIX, chunk_samples=6000,
                            overlap_samples=1000, n_src=2, seed=1)
    assert est.shape == (2, T)
    # alignment undoes every per-chunk swap; crossfading identical true
    # values is the identity up to float rounding
    assert _global_perm_error(est) < 1e-5


def test_longform_right_aligned_tail_covers_everything():
    # T=20000, chunk=6000, hop=5500 -> starts 0,5500,11000, then a
    # right-aligned tail at 14000 (11000+6000 < 20000)
    calls = []
    est = separate_longform(_oracle, MIX, chunk_samples=6000,
                            overlap_samples=500, n_src=2, seed=2,
                            progress=lambda i, n: calls.append((i, n)))
    assert _global_perm_error(est) < 1e-5
    assert calls[-1] == (len(calls), len(calls))
    assert calls[-1][1] == 4


def test_longform_single_window_pads_and_trims():
    short = MIX[:3000]
    est = separate_longform(_oracle, short, chunk_samples=6000,
                            overlap_samples=1000, n_src=2, seed=3)
    assert est.shape == (2, 3000)
    err = min(np.abs(est - S[:, :3000]).max(),
              np.abs(est[::-1] - S[:, :3000]).max())
    assert err < 1e-5


def test_longform_pass_lengths_masks_host_pad():
    """Single-window mode zero-pads on the host; with pass_lengths the
    separator receives the TRUE sample count so mask_padding models can
    exclude the pad from their statistics."""
    got = {}

    def fn(key, chunk, lengths):
        got["lens"] = np.asarray(lengths).tolist()
        c = np.asarray(chunk)[:, 0]
        return np.stack([c, c], axis=1)

    short = MIX[:3000]
    est = separate_longform(fn, short, chunk_samples=6000,
                            overlap_samples=1000, n_src=2, seed=7,
                            pass_lengths=True)
    assert est.shape == (2, 3000)
    assert got["lens"] == [3000]

    # full chunks report the window length
    separate_longform(fn, MIX, chunk_samples=6000, overlap_samples=1000,
                      n_src=2, seed=8, pass_lengths=True)
    assert got["lens"] == [6000]


def test_longform_validates_overlap():
    with pytest.raises(ValueError):
        separate_longform(_oracle, MIX, chunk_samples=1000,
                          overlap_samples=1000)


@pytest.mark.slow
def test_longform_with_real_sampler_smoke():
    """End to end through a real (untrained) jitted trainer.separate:
    finite output, one compile shared across chunks."""
    import jax.numpy as jnp
    from ditsep_tpu.cli.common import load_config
    from ditsep_tpu.configs import build_diffsep_trainer

    cfg = load_config("diffsep", [
        "model.score_model.nf=8", "model.score_model.ch_mult=(1, 1)",
        "model.score_model.attn_resolutions=()"])
    trainer = build_diffsep_trainer(cfg)
    key = jax.random.PRNGKey(0)
    chunk = 4000
    params = trainer.model.init(key, jnp.zeros((1, 2, chunk)),
                                jnp.full((1,), 0.5),
                                jnp.zeros((1, 1, chunk)))
    fn = jax.jit(lambda k, y: trainer.separate(params, k, y, N=2)[0])
    mix = 0.2 * np.random.default_rng(5).standard_normal(10000
                                                         ).astype(np.float32)
    est = separate_longform(fn, mix, chunk_samples=chunk,
                            overlap_samples=800, n_src=2, seed=6)
    assert est.shape == (2, 10000)
    assert np.isfinite(est).all()


def test_longform_rejects_zero_overlap_and_multichannel():
    with pytest.raises(ValueError, match="alignment"):
        separate_longform(_oracle, MIX, chunk_samples=6000,
                          overlap_samples=0, n_src=2)
    with pytest.raises(ValueError, match="mono"):
        separate_longform(_oracle, np.stack([MIX, MIX]),
                          chunk_samples=6000, overlap_samples=1000,
                          n_src=2)
