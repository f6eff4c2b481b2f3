"""Regression tests for the round-3 review findings (padding-path
correctness: masked normalization, mask pooling, loader bucket caps and
alignment, canonical frame math)."""
import jax
import jax.numpy as jnp
import numpy as np

from ditsep_tpu.utils import separate as sep_utils


def test_normalize_batch_masked_matches_native():
    """Padded-batch normalization with lengths must equal each item's
    native-length normalization on the valid region, with an exactly
    zero tail (finding: full-length stats amplified short items ~1.27x
    and turned their pad into a -mean/std DC plateau)."""
    rng = np.random.default_rng(0)
    L, P = 1600, 2600
    native = rng.standard_normal((1, 1, L)).astype(np.float32) * 0.7 + 0.3
    padded = np.zeros((1, 1, P), np.float32)
    padded[..., :L] = native

    (nm, _), n_mean, n_std = sep_utils.normalize_batch(
        (jnp.asarray(native), None))
    (pm, _), p_mean, p_std = sep_utils.normalize_batch(
        (jnp.asarray(padded), None), lengths=jnp.asarray([L]))
    np.testing.assert_allclose(p_mean, n_mean, rtol=1e-5)
    np.testing.assert_allclose(p_std, n_std, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pm)[..., :L], np.asarray(nm),
                               rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(pm)[..., L:] == 0.0)

    # unmasked normalization of the padded batch is measurably off-scale
    (_, _), _, full_std = sep_utils.normalize_batch(
        (jnp.asarray(padded), None))
    assert float(full_std.ravel()[0]) < 0.85 * float(n_std.ravel()[0])

    # targets ride the mixture stats and get the same re-zeroed tail
    tgt = np.zeros((1, 2, P), np.float32)
    tgt[..., :L] = rng.standard_normal((1, 2, L)).astype(np.float32)
    (_, tn), _, _ = sep_utils.normalize_batch(
        (jnp.asarray(padded), jnp.asarray(tgt)), lengths=jnp.asarray([L]))
    assert np.all(np.asarray(tn)[..., L:] == 0.0)


def test_normalize_batch_per_item_lengths():
    rng = np.random.default_rng(1)
    mix = rng.standard_normal((2, 1, 3000)).astype(np.float32)
    mix[1, :, 2000:] = 0.0
    lens = jnp.asarray([3000, 2000])
    (nm, _), mean, std = sep_utils.normalize_batch(
        (jnp.asarray(mix), None), lengths=lens)
    # item 0 (full length) matches the unmasked path exactly
    (nm0, _), m0, s0 = sep_utils.normalize_batch(
        (jnp.asarray(mix[:1]), None))
    np.testing.assert_allclose(mean[0], m0[0], rtol=1e-6)
    np.testing.assert_allclose(std[0], s0[0], rtol=1e-6)
    # item 1's stats come from its first 2000 samples only
    (nm1, _), m1, s1 = sep_utils.normalize_batch(
        (jnp.asarray(mix[1:, :, :2000]), None))
    np.testing.assert_allclose(mean[1], m1[0], rtol=1e-5)
    np.testing.assert_allclose(std[1], s1[0], rtol=1e-5)


def test_separate_with_lengths_uses_masked_normalization():
    """trainer.separate(lengths=...) must hand the score net an input
    whose valid region matches the native-length call bit-for-bit at
    the normalization boundary (checked via the recorded score-fn
    inputs of a stub model)."""
    from ditsep_tpu.sdes import MixSDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer

    seen = {}

    class Probe:
        def apply(self, params, x, t, y, **kw):
            seen.setdefault("y", []).append(np.asarray(y))
            return jnp.zeros_like(x)

        init = None

    trainer = DiffSepTrainer(model=Probe(), sde=MixSDE(),
                             cfg=DiffSepConfig(init_hack=0))
    rng = np.random.default_rng(2)
    L, P = 1500, 2500
    native = rng.standard_normal((1, 1, L)).astype(np.float32)
    padded = np.zeros((1, 1, P), np.float32)
    padded[..., :L] = native

    trainer.separate({}, jax.random.PRNGKey(0), jnp.asarray(native), N=1)
    trainer.separate({}, jax.random.PRNGKey(0), jnp.asarray(padded), N=1,
                     lengths=jnp.asarray([L]))
    y_native = seen["y"][0]
    y_padded = seen["y"][-1]
    np.testing.assert_allclose(y_padded[..., :L], y_native, rtol=1e-5,
                               atol=1e-6)
    assert np.all(y_padded[..., L:] == 0.0)


def test_pool_time_mask_odd_widths():
    from ditsep_tpu.models.layers import pool_time_mask

    m = jnp.asarray([[True, False, True]])  # W=3
    out = np.asarray(pool_time_mask(m))
    assert out.shape == (1, 2)
    assert out.tolist() == [[True, True]]

    m1 = jnp.asarray([[True]])  # W=1: must not collapse to (B, 0)
    out1 = np.asarray(pool_time_mask(m1))
    assert out1.shape == (1, 1) and bool(out1[0, 0])

    m4 = jnp.asarray([[True, False, False, False]])
    out4 = np.asarray(pool_time_mask(m4))
    assert out4.tolist() == [[True, False]]


class _LenDataset:
    def __init__(self, lengths):
        self._lengths = list(lengths)

    def __len__(self):
        return len(self._lengths)

    def __getitem__(self, i):
        L = self._lengths[i]
        mix = np.full((1, L), 0.1 * (i + 1), np.float32)
        tgt = np.zeros((2, L), np.float32)
        return mix, tgt


def test_bucketed_loader_frame_spec_caps_buckets():
    from ditsep_tpu.data.wsj0_mix import BucketedLoader

    # lengths spanning ~12 distinct 64-frame blocks at (510, 128)
    lengths = [8000 * k + 137 for k in range(1, 13)]
    bl = BucketedLoader(_LenDataset(lengths), batch_size=1, n_buckets=3,
                        shuffle=False, frame_spec=(510, 128, 64))
    shapes = {batch[0].shape[-1] for batch in bl}
    assert len(shapes) <= 3
    # every emitted shape still sits on a frame-block boundary
    from ditsep_tpu.ops.stft import n_frames_prepadded
    for s in shapes:
        assert n_frames_prepadded(s, 510, 128) % 64 == 0
        assert n_frames_prepadded(s + 1, 510, 128) % 64 == 1


def test_bucketed_loader_left_alignment():
    from ditsep_tpu.data.wsj0_mix import BucketedLoader

    bl = BucketedLoader(_LenDataset([4000, 5000]), batch_size=2,
                        n_buckets=1, shuffle=False,
                        frame_spec=(510, 128, 64), align="left")
    (mix, tgt), = list(bl)
    # shorter item: signal leads, padding trails
    assert mix[0, 0, 0] != 0.0
    assert np.all(mix[0, 0, 4000:] == 0.0)


def test_evaluate_dataset_default_honors_bucket_multiple():
    """frame_spec now defaults to None (opt-in), so bucket_multiple is
    honored by default again."""
    import inspect

    from ditsep_tpu.eval.evaluate import evaluate_dataset

    sig = inspect.signature(evaluate_dataset)
    assert sig.parameters["frame_spec"].default is None


def test_frame_math_single_source_of_truth():
    """The canonical frame formula and its consumers agree."""
    from ditsep_tpu.eval.evaluate import _stft_frames
    from ditsep_tpu.ops.stft import (frame_block_padded_len,
                                     n_frames_prepadded)
    from ditsep_tpu.serving import frame_block_padded_len as eng_fbpl

    for L in [1, 999, 8000, 31337, 64000]:
        assert _stft_frames(L, 510, 128) == n_frames_prepadded(L, 510, 128)
        assert eng_fbpl(L, (510, 128, 64)) == frame_block_padded_len(
            L, 510, 128, 64)
    # jnp-array input (the mask_padding path) matches the int path
    arr = n_frames_prepadded(jnp.asarray([999, 8000]), 510, 128)
    assert np.asarray(arr).tolist() == [
        n_frames_prepadded(999, 510, 128),
        n_frames_prepadded(8000, 510, 128)]
