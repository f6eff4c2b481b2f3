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


@pytest.mark.slow
def test_emergency_checkpoint_saves_live_state(tmp_path):
    """A crash mid-training must save the LIVE state to 'latest', not
    the pre-training one (which would destroy all progress on resume)."""
    from ditsep_tpu.data import SyntheticMixDataset
    from ditsep_tpu.training.loop import fit
    from ditsep_tpu.utils.checkpoint import CheckpointManager

    class ExplodingDataset(SyntheticMixDataset):
        """Raises on the access that starts epoch 2."""
        def __init__(self, **kw):
            super().__init__(**kw)
            self.reads = 0

        def __getitem__(self, idx):
            self.reads += 1
            if self.reads > 2 * self.n_items + 1:  # init probe + epoch 1
                raise RuntimeError("boom")
            return super().__getitem__(idx)

    counters = {"score": 0, "sep": 0}
    tr = _tiny_trainer(counters)
    ds = ExplodingDataset(n_items=2, min_len_s=0.25, max_len_s=0.25)
    with pytest.raises(RuntimeError, match="boom"):
        fit(tr, ds, None, workdir=str(tmp_path), batch_size=2,
            max_epochs=5, log_media=False)
    mgr = CheckpointManager(str(tmp_path / "checkpoints"))
    state = mgr.restore(tr.init_state(
        tr.model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 2, 2000)), jnp.ones((1,)) * 0.5,
                      jnp.zeros((1, 1, 2000)))), prefer="latest")
    # epoch 1 completed one step before the crash
    assert int(state.step) >= 1


def test_bucketed_loader_yield_counts_and_cycling():
    """yield_counts appends the real item count; remainder fill cycles
    the real items (even spread) instead of repeating the last."""
    from ditsep_tpu.data import BucketedLoader, SyntheticMixDataset

    ds = SyntheticMixDataset(n_items=3, min_len_s=0.5, max_len_s=0.5)
    loader = BucketedLoader(ds, batch_size=4, n_buckets=1,
                            multiple=2048, shuffle=False,
                            yield_counts=True)
    batches = list(loader)
    assert len(batches) == 1
    mix, tgt, n_real = batches[0]
    assert n_real == 3 and mix.shape[0] == 4
    # 4th row cycles back to item 0, not a repeat of item 2
    np.testing.assert_allclose(mix[3], mix[0])
    assert not np.allclose(mix[3], mix[2])
