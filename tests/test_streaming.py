"""Streaming separation: bounded-latency incremental stitching.

Same oracle idea as tests/test_longform.py: the separator returns the
TRUE sources for each window (located by matching the window against
the global mixture) in a key-dependent random order; the streaming
stitcher must undo every swap, never revise an emitted sample, and
reproduce the sources end to end.
"""
import jax
import numpy as np
import pytest

from ditsep_tpu.serving import StreamingSeparator

RNG = np.random.default_rng(7)
T = 20000
S = np.stack([RNG.standard_normal(T), RNG.standard_normal(T)]
             ).astype(np.float32)
MIX = S.sum(axis=0)


def _find_offset(c: np.ndarray) -> int:
    L = c.shape[0]
    for s in range(T - L + 1):
        if MIX[s] == c[0] and np.array_equal(MIX[s:s + L], c):
            return s
    raise AssertionError("window not found in mixture")


def _oracle(key, chunk, *lengths):
    """(1,1,C) window (possibly zero-padded tail) -> (1,2,C) true
    sources, randomly swapped."""
    c = np.asarray(chunk).reshape(-1)
    if lengths:
        L = int(np.asarray(lengths[0]).reshape(-1)[0])
    else:
        L = np.trim_zeros(c, "b").shape[0]
    s = _find_offset(c[:L])
    out = np.zeros((2, c.shape[0]), np.float32)
    out[:, :L] = S[:, s:s + L]
    if bool(jax.random.bernoulli(key)):
        out = out[::-1]
    return out[None]


def _global_perm_error(est):
    return min(np.abs(est - S[:, :est.shape[-1]]).max(),
               np.abs(est[::-1] - S[:, :est.shape[-1]]).max())


def _stream(blocks, **kw):
    sep = StreamingSeparator(_oracle, chunk_samples=6000,
                             overlap_samples=1000, n_src=2, **kw)
    pieces, sizes = [], []
    for b in blocks:
        out = sep.push(b)
        pieces.append(out)
        sizes.append(out.shape[-1])
    pieces.append(sep.flush())
    return np.concatenate(pieces, axis=-1), sizes, sep


def test_streaming_exact_recovery_random_blocks():
    rng = np.random.default_rng(3)
    blocks, i = [], 0
    while i < T:
        n = int(rng.integers(1, 4000))
        blocks.append(MIX[i:i + n])
        i += n
    est, sizes, sep = _stream(blocks, seed=1)
    assert est.shape == (2, T)
    assert _global_perm_error(est) < 1e-5
    # mid-stream emission actually happened (not everything at flush)
    assert sum(sizes) > T // 2


def test_streaming_latency_bound():
    sep = StreamingSeparator(_oracle, chunk_samples=6000,
                             overlap_samples=1000, n_src=2, seed=2)
    assert sep.latency_samples == 6000 + 5000
    emitted = 0
    for i in range(0, T, 500):
        emitted += sep.push(MIX[i:i + 500]).shape[-1]
        pushed = min(i + 500, T)
        if pushed > sep.latency_samples:
            assert emitted >= pushed - sep.latency_samples
    emitted += sep.flush().shape[-1]
    assert emitted == T


def test_streaming_never_revises_emitted():
    """Emitted samples are final: concatenated mid-stream output equals
    the stitched stream end to end (no retroactive changes possible by
    construction -- this asserts the bookkeeping agrees)."""
    est_a, _, _ = _stream([MIX[:12000], MIX[12000:]], seed=5)
    est_b, _, _ = _stream([MIX[i:i + 100] for i in range(0, T, 100)],
                          seed=5)
    # same windows, same keys -> identical output regardless of push
    # granularity
    np.testing.assert_allclose(est_a, est_b, atol=1e-6)


def test_streaming_short_stream_pads_and_trims():
    sep = StreamingSeparator(_oracle, chunk_samples=6000,
                             overlap_samples=1000, n_src=2, seed=4)
    assert sep.push(MIX[:2500]).shape == (2, 0)
    est = sep.flush()
    assert est.shape == (2, 2500)
    err = min(np.abs(est - S[:, :2500]).max(),
              np.abs(est[::-1] - S[:, :2500]).max())
    assert err < 1e-5


def test_streaming_pass_lengths_tail():
    """With pass_lengths, the flush-tail window carries its valid
    sample count (mask_padding models)."""
    seen = []

    def probe(key, chunk, lengths):
        seen.append(int(np.asarray(lengths).reshape(-1)[0]))
        return _oracle(key, chunk, lengths)

    sep = StreamingSeparator(probe, chunk_samples=6000,
                             overlap_samples=1000, n_src=2, seed=6,
                             pass_lengths=True)
    pieces = [sep.push(MIX[:14000])]
    pieces.append(sep.flush())
    est = np.concatenate(pieces, axis=-1)
    assert est.shape == (2, 14000)
    # full windows at 0 and 5000; tail at 10000 with 4000 valid
    assert seen == [6000, 6000, 4000]
    assert min(np.abs(est - S[:, :14000]).max(),
               np.abs(est[::-1] - S[:, :14000]).max()) < 1e-5


def test_streaming_exact_window_end_no_tail():
    """Stream length hitting a window end exactly: flush must not run
    an extra window."""
    calls = []

    def probe(key, chunk):
        calls.append(1)
        return _oracle(key, chunk)

    sep = StreamingSeparator(probe, chunk_samples=6000,
                             overlap_samples=1000, n_src=2, seed=8)
    # windows: 0, 5000 -> prev_end 11000; feed exactly 11000
    out = [sep.push(MIX[:11000])]
    out.append(sep.flush())
    est = np.concatenate(out, axis=-1)
    assert est.shape == (2, 11000) and len(calls) == 2
    assert min(np.abs(est - S[:, :11000]).max(),
               np.abs(est[::-1] - S[:, :11000]).max()) < 1e-5


def test_streaming_push_after_flush_raises():
    sep = StreamingSeparator(_oracle, chunk_samples=6000,
                             overlap_samples=1000)
    sep.flush()
    with pytest.raises(RuntimeError):
        sep.push(MIX[:10])


def test_concurrent_streams_share_batching_engine():
    """Two live streams ride one BatchingEngine (engine_separate_fn):
    windows from both streams enter the same bucket and may share
    batched calls; each stream must still reconstruct its own sources
    exactly."""
    import threading

    from ditsep_tpu.serving import BatchingEngine, engine_separate_fn

    rng = np.random.default_rng(11)
    T2 = 14000
    SRC = {name: np.stack([rng.standard_normal(T2),
                           rng.standard_normal(T2)]).astype(np.float32)
           for name in ("a", "b")}
    MIXES = {name: s.sum(axis=0) for name, s in SRC.items()}

    def batched_oracle(key, mix):
        """(B,1,Tb) bucket-padded windows -> true sources per row,
        deterministically swapped by window offset."""
        out = np.zeros((mix.shape[0], 2, mix.shape[-1]), np.float32)
        for r in range(mix.shape[0]):
            c = np.asarray(mix[r]).reshape(-1)
            L = np.trim_zeros(c, "b").shape[0]
            hit = None
            for name, m in MIXES.items():
                for s in range(T2 - L + 1):
                    if m[s] == c[0] and np.array_equal(m[s:s + L], c[:L]):
                        hit = (name, s)
                        break
                if hit:
                    break
            assert hit, "window not found in either stream"
            name, s = hit
            row = SRC[name][:, s:s + L]
            if s % 3 == 1:
                row = row[::-1]
            out[r, :, :L] = row
        return out

    eng = BatchingEngine(batched_oracle, max_batch=4, max_wait_ms=30.0)
    results = {}

    def run_stream(name):
        from ditsep_tpu.serving import StreamingSeparator
        sep = StreamingSeparator(engine_separate_fn(eng),
                                 chunk_samples=6000,
                                 overlap_samples=1000, n_src=2)
        pieces = []
        for i in range(0, T2, 1000):
            pieces.append(sep.push(MIXES[name][i:i + 1000]))
        pieces.append(sep.flush())
        results[name] = np.concatenate(pieces, axis=-1)

    threads = [threading.Thread(target=run_stream, args=(n,))
               for n in MIXES]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    eng.close()

    for name in MIXES:
        est = results[name]
        assert est.shape == (2, T2)
        err = min(np.abs(est - SRC[name]).max(),
                  np.abs(est[::-1] - SRC[name]).max())
        assert err < 1e-5, name
    # 3 windows per stream (0, 5000, tail at 10000)
    assert eng.stats()["requests"] == 6


def test_streaming_rejects_zero_overlap_and_multichannel():
    with pytest.raises(ValueError, match="alignment"):
        StreamingSeparator(_oracle, chunk_samples=6000,
                           overlap_samples=0, n_src=2)
    sep = StreamingSeparator(_oracle, chunk_samples=6000,
                             overlap_samples=1000, n_src=2)
    with pytest.raises(ValueError, match="mono"):
        sep.push(np.stack([MIX[:100], MIX[:100]]))
