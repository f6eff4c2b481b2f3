"""Serving subsystem: dynamic-batching engine + HTTP API.

The engine must (a) group concurrent requests of one frame block into a
single sampler call, (b) return each request EXACTLY what a standalone
call on its own padded batch would return (batching a pointwise
separator is a no-op), (c) bound shapes to the frame-block/power-of-two
grid, and (d) survive separator failures without wedging the queue.
"""
import threading
import time

import numpy as np
import pytest

from ditsep_tpu.serving import (BatchingEngine, SeparationAPIServer,
                                frame_block_padded_len)
from ditsep_tpu.eval.evaluate import _stft_frames

FRAME_SPEC = (510, 128, 64)


def _pointwise_fn(calls=None):
    """Deterministic, batch-pointwise 'separator': stems = (2x, -x).
    Batching requests together must not change any row's result."""
    def fn(key, mix):
        if calls is not None:
            calls.append(int(mix.shape[0]))
        x = np.asarray(mix)[:, 0]  # (B, T)
        return np.stack([2.0 * x, -x], axis=1)
    return fn


# --------------------------------------------------------------- buckets
def test_frame_block_padded_len_properties():
    n_fft, hop, block = FRAME_SPEC
    for L in [1, 1000, 8000, 12345, 32000, 65536]:
        P = frame_block_padded_len(L, FRAME_SPEC)
        assert P >= L
        # same %64 frame block as the native length...
        fL, fP = _stft_frames(L, n_fft, hop), _stft_frames(P, n_fft, hop)
        assert -(-fL // block) == -(-fP // block)
        # ...and maximal: one more sample crosses into the next block
        assert _stft_frames(P + 1, n_fft, hop) > -(-fL // block) * block


def test_bucket_of_sample_domain():
    eng = BatchingEngine(_pointwise_fn(), frame_spec=None,
                         bucket_multiple=4096, max_wait_ms=1.0)
    try:
        assert eng.bucket_of(1) == 4096
        assert eng.bucket_of(4096) == 4096
        assert eng.bucket_of(4097) == 8192
    finally:
        eng.close()


# ---------------------------------------------------------------- engine
def test_engine_batches_concurrent_requests():
    calls = []
    eng = BatchingEngine(_pointwise_fn(calls), max_batch=8,
                         max_wait_ms=60.0)
    try:
        rng = np.random.default_rng(0)
        # same frame block -> one bucket; lengths differ inside it
        base = 8000
        lens = [base, base + 10, base + 64, base + 100]
        audios = [rng.standard_normal(L).astype(np.float32) for L in lens]
        futs = [eng.submit(a) for a in audios]
        outs = [f.result(timeout=30) for f in futs]
        for a, o in zip(audios, outs):
            assert o.shape == (2, a.shape[-1])
            np.testing.assert_allclose(o[0], 2.0 * a, rtol=1e-6)
            np.testing.assert_allclose(o[1], -a, rtol=1e-6)
        # all four rode one dispatch (batch padded to the 4-slot shape)
        st = eng.stats()
        assert st["requests"] == 4
        assert st["batches"] == 1
        assert st["mean_batch_occupancy"] == 4.0
        assert calls == [4]
    finally:
        eng.close()


def test_engine_separate_buckets_dispatch_separately():
    calls = []
    eng = BatchingEngine(_pointwise_fn(calls), max_batch=4,
                         max_wait_ms=20.0)
    try:
        a1 = np.ones(4000, np.float32)    # small frame block
        a2 = np.ones(40000, np.float32)   # far larger block
        f1, f2 = eng.submit(a1), eng.submit(a2)
        o1, o2 = f1.result(timeout=30), f2.result(timeout=30)
        assert o1.shape == (2, 4000) and o2.shape == (2, 40000)
        assert eng.stats()["batches"] == 2
    finally:
        eng.close()


def test_engine_full_batch_dispatches_early():
    """max_batch pending requests must not wait out max_wait_ms."""
    eng = BatchingEngine(_pointwise_fn(), max_batch=2,
                         max_wait_ms=10_000.0)
    try:
        a = np.ones(4000, np.float32)
        t0 = time.perf_counter()
        futs = [eng.submit(a), eng.submit(a)]
        for f in futs:
            f.result(timeout=30)
        assert time.perf_counter() - t0 < 5.0
    finally:
        eng.close()


def test_engine_rejects_out_of_range_and_recovers_from_errors():
    def flaky(key, mix):
        if mix.shape[0] >= 2:
            raise RuntimeError("boom")
        x = np.asarray(mix)[:, 0]
        return np.stack([x, x], axis=1)

    eng = BatchingEngine(flaky, max_batch=2, max_wait_ms=30.0,
                         max_seconds=1.0, fs=8000)
    try:
        # too long -> immediate rejection, engine untouched
        with pytest.raises(ValueError):
            eng.submit(np.ones(9000, np.float32)).result(timeout=5)
        # a failing batch resolves its futures with the exception...
        f1 = eng.submit(np.ones(4000, np.float32))
        f2 = eng.submit(np.ones(4000, np.float32))
        with pytest.raises(RuntimeError):
            f1.result(timeout=30)
        with pytest.raises(RuntimeError):
            f2.result(timeout=30)
        # ...and the engine keeps serving afterwards
        time.sleep(0.05)  # let the failed batch fully retire
        out = eng.separate(np.ones(4000, np.float32), timeout=30)
        assert out.shape == (2, 4000)
    finally:
        eng.close()


def test_engine_close_rejects_new_and_pending():
    eng = BatchingEngine(_pointwise_fn(), max_wait_ms=50.0)
    eng.close()
    with pytest.raises(RuntimeError):
        eng.submit(np.ones(100, np.float32)).result(timeout=5)


def test_engine_power_of_two_padding_counted():
    eng = BatchingEngine(_pointwise_fn(), max_batch=8, max_wait_ms=40.0)
    try:
        a = np.ones(4000, np.float32)
        futs = [eng.submit(a) for _ in range(3)]  # -> padded to 4
        for f in futs:
            f.result(timeout=30)
        st = eng.stats()
        assert st["padded_rows"] == 1
    finally:
        eng.close()


def test_engine_mesh_rounds_batch_to_devices():
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("data",))
    seen = []

    def fn(key, mix):
        seen.append(tuple(mix.shape))
        x = np.asarray(mix)[:, 0]
        return np.stack([x, x], axis=1)

    eng = BatchingEngine(fn, max_batch=16, max_wait_ms=20.0, mesh=mesh)
    try:
        out = eng.separate(np.ones(4000, np.float32), timeout=60)
        assert out.shape == (2, 4000)
        assert seen[0][0] % mesh.devices.size == 0
    finally:
        eng.close()


@pytest.mark.slow
def test_engine_mesh_shards_real_sampler():
    """End-to-end sharded serving (VERDICT r3 item 6): the engine's
    bucket-batches ride a REAL jitted PC-sampling separation with
    explicit NamedShardings over the 8-device mesh's data axis, and
    each request's result matches a standalone single-chip call with
    the engine's exact padded batch composition."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ditsep_tpu.models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import MixSDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer

    mesh = Mesh(np.array(jax.devices()), ("data",))
    n = mesh.devices.size
    assert n == 8
    model = ScoreModelNCSNpp(num_sources=2, nf=8, ch_mult=(1, 1),
                             attn_resolutions=(), image_size=256)
    trainer = DiffSepTrainer(model=model, sde=MixSDE(N=2),
                             cfg=DiffSepConfig())
    key = jax.random.PRNGKey(0)
    t_len = frame_block_padded_len(4000, FRAME_SPEC)
    params = model.init(key, jnp.zeros((1, 2, t_len)),
                        jnp.full((1,), 0.5), jnp.zeros((1, 1, t_len)))
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sep = jax.jit(
        lambda k, m: trainer.separate(params, k, m, N=2, snr=0.5,
                                      corrector_steps=1)[0],
        in_shardings=(repl, data_sh), out_shardings=data_sh)

    rng = np.random.default_rng(0)
    reqs = [rng.standard_normal(4000).astype(np.float32) * 0.1
            for _ in range(n + 3)]  # non-multiple: engine pads the batch
    eng = BatchingEngine(sep, max_batch=n, max_wait_ms=50.0,
                         frame_spec=FRAME_SPEC, mesh=mesh, seed=7)
    try:
        futs = [eng.submit(r) for r in reqs]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        eng.close()
    assert all(o.shape == (2, 4000) for o in outs)
    assert all(np.isfinite(o).all() for o in outs)
    # exactness vs a standalone call: rebuild the engine's first batch
    # (requests 0..n-1, same key sequence: seed 7, first split) and run
    # the same jitted sampler without the engine in the loop
    k0 = jax.random.split(jax.random.PRNGKey(7))[1]
    mix = np.zeros((n, 1, t_len), np.float32)
    for i in range(n):
        mix[i, 0, :4000] = reqs[i]
    direct = np.asarray(sep(k0, jax.device_put(jnp.asarray(mix),
                                               data_sh)))
    for i in range(n):
        np.testing.assert_allclose(outs[i], direct[i][:, :4000],
                                   atol=1e-5)


def test_engine_mesh_caps_are_device_multiples():
    """A max_batch that is not a device multiple must round UP so every
    allowed batch shape shards over the data axis."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("data",))
    n = mesh.devices.size
    eng = BatchingEngine(_pointwise_fn(), max_batch=n + n // 2,
                         max_wait_ms=1.0, mesh=mesh)
    try:
        assert all(bs % n == 0 for bs in eng.batch_sizes)
    finally:
        eng.close()


def test_engine_full_bucket_not_blocked_by_straggler():
    """A full bucket dispatches immediately even while an older lone
    request in another bucket is still waiting out max_wait."""
    eng = BatchingEngine(_pointwise_fn(), max_batch=2,
                         max_wait_ms=10_000.0)
    try:
        lone = eng.submit(np.ones(40000, np.float32))  # bucket A, alone
        t0 = time.perf_counter()
        futs = [eng.submit(np.ones(4000, np.float32))
                for _ in range(2)]  # bucket B, full
        for f in futs:
            f.result(timeout=30)
        assert time.perf_counter() - t0 < 5.0  # did not wait out A's age
        assert not lone.done()
    finally:
        eng.close()
        # close() drains: the straggler resolves (result or closed-error)
        try:
            lone.result(timeout=10)
        except RuntimeError:
            pass


def test_engine_warmup_covers_all_batch_sizes():
    calls = []
    eng = BatchingEngine(_pointwise_fn(calls), max_batch=4,
                         max_wait_ms=1.0)
    try:
        eng.warmup([4000])
        assert sorted(calls) == [1, 2, 4]  # every allowed batch shape
    finally:
        eng.close()


def test_engine_pass_lengths_forwards_true_lengths():
    got = {}

    def fn(key, mix, lengths):
        got["lens"] = np.asarray(lengths).tolist()
        x = np.asarray(mix)[:, 0]
        return np.stack([x, x], axis=1)

    eng = BatchingEngine(fn, max_batch=2, max_wait_ms=40.0,
                         pass_lengths=True)
    try:
        f1 = eng.submit(np.ones(4000, np.float32))
        f2 = eng.submit(np.ones(4100, np.float32))
        f1.result(timeout=30), f2.result(timeout=30)
        assert sorted(got["lens"]) == [4000, 4100]
    finally:
        eng.close()


# -------------------------------------------------------- real sampler
@pytest.mark.slow
def test_engine_with_jitted_trainer_sampler():
    import jax
    import jax.numpy as jnp
    from ditsep_tpu.cli.common import load_config
    from ditsep_tpu.configs import build_diffsep_trainer

    cfg = load_config("diffsep", [
        "model.score_model.nf=8", "model.score_model.ch_mult=[1,1]",
        "model.score_model.attn_resolutions=[]"])
    trainer = build_diffsep_trainer(cfg)
    key = jax.random.PRNGKey(0)
    t = 4000
    params = trainer.model.init(key, jnp.zeros((1, 2, t)),
                                jnp.full((1,), 0.5), jnp.zeros((1, 1, t)))
    fn = jax.jit(lambda k, y: trainer.separate(params, k, y, N=2)[0])
    eng = BatchingEngine(fn, max_batch=2, max_wait_ms=40.0)
    try:
        rng = np.random.default_rng(1)
        futs = [eng.submit(rng.standard_normal(t).astype(np.float32))
                for _ in range(2)]
        for f in futs:
            out = f.result(timeout=600)
            assert out.shape == (2, t)
            assert np.isfinite(out).all()
        assert eng.stats()["batches"] == 1
    finally:
        eng.close()


@pytest.mark.slow
def test_build_engine_mask_padding_api_e2e():
    """cli/serve_api.build_engine wires trainer.separate with per-request
    lengths (mask_padding) behind the HTTP API, end to end."""
    import base64
    import json
    from urllib.request import Request, urlopen

    from ditsep_tpu.cli.common import load_config
    from ditsep_tpu.cli.serve_api import build_engine
    from ditsep_tpu.interface.web import decode_wav, encode_wav

    cfg = load_config("diffsep", [
        "model.score_model.nf=8", "model.score_model.ch_mult=(1, 1)",
        "model.score_model.attn_resolutions=()"])
    eng = build_engine(cfg, sampler_N=2, mask_padding=True, max_batch=2,
                       max_wait_ms=40.0)
    srv = SeparationAPIServer(eng, port=0).start()
    try:
        rng = np.random.default_rng(3)
        wav = encode_wav(0.2 * rng.standard_normal(4000)
                         .astype(np.float32), 8000)
        req = Request(f"http://127.0.0.1:{srv.port}/v1/separate", data=wav)
        with urlopen(req, timeout=600) as r:
            body = json.loads(r.read())
        assert body["n_src"] == 2
        for stem_b64 in body["stems"]:
            stem, fs = decode_wav(base64.b64decode(stem_b64))
            assert fs == 8000 and stem.shape[0] == 4000
            assert np.isfinite(stem).all()
    finally:
        srv.close()
        eng.close()


# ------------------------------------------------------------------ API
def test_api_server_roundtrip():
    import base64
    import json
    from urllib.request import Request, urlopen

    from ditsep_tpu.interface.web import decode_wav, encode_wav

    eng = BatchingEngine(_pointwise_fn(), max_wait_ms=5.0)
    srv = SeparationAPIServer(eng, port=0).start()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        with urlopen(f"{url}/healthz", timeout=10) as r:
            assert json.loads(r.read())["ok"] is True

        audio = (0.25 * np.sin(np.linspace(0, 100, 8000))
                 ).astype(np.float32)
        wav = encode_wav(audio, 8000)
        req = Request(f"{url}/v1/separate", data=wav,
                      headers={"Content-Type": "audio/wav"})
        with urlopen(req, timeout=60) as r:
            body = json.loads(r.read())
        assert body["n_src"] == 2 and body["fs"] == 8000
        stem0, fs0 = decode_wav(base64.b64decode(body["stems"][0]))
        assert fs0 == 8000
        # 16-bit PCM round-trip of 2x the input
        np.testing.assert_allclose(stem0[:, 0], 2.0 * audio, atol=2e-4)

        # raw-wav single-stem route
        req = Request(f"{url}/v1/separate?stem=1", data=wav,
                      headers={"Content-Type": "audio/wav"})
        with urlopen(req, timeout=60) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            stem1, _ = decode_wav(r.read())
        np.testing.assert_allclose(stem1[:, 0], -audio, atol=2e-4)

        with urlopen(f"{url}/v1/stats", timeout=10) as r:
            st = json.loads(r.read())
        assert st["requests"] == 2
    finally:
        srv.close()
        eng.close()


def test_api_server_rejects_bad_rate_and_payload():
    import json
    from urllib.request import Request, urlopen
    from urllib.error import HTTPError

    from ditsep_tpu.interface.web import encode_wav

    eng = BatchingEngine(_pointwise_fn(), max_wait_ms=5.0, fs=8000)
    srv = SeparationAPIServer(eng, port=0).start()
    try:
        url = f"http://127.0.0.1:{srv.port}/v1/separate"
        wav16k = encode_wav(np.ones(16000, np.float32), 16000)
        with pytest.raises(HTTPError) as ei:
            urlopen(Request(url, data=wav16k), timeout=30)
        assert ei.value.code == 400
        assert "sample rate" in json.loads(ei.value.read())["error"]

        with pytest.raises(HTTPError) as ei:
            urlopen(Request(url, data=b"not a wav"), timeout=30)
        assert ei.value.code == 400

        # non-integer stem -> 400 BEFORE any separation happens
        wav8k = encode_wav(np.ones(4000, np.float32), 8000)
        with pytest.raises(HTTPError) as ei:
            urlopen(Request(url + "?stem=abc", data=wav8k), timeout=30)
        assert ei.value.code == 400
        assert eng.stats()["requests"] == 0
    finally:
        srv.close()
        eng.close()


def test_api_keepalive_connection_survives_404_with_body():
    """A POST body to an unknown path must be drained, or the next
    request on the same keep-alive connection reads garbage."""
    import http.client
    import json

    from ditsep_tpu.interface.web import encode_wav

    eng = BatchingEngine(_pointwise_fn(), max_wait_ms=5.0)
    srv = SeparationAPIServer(eng, port=0).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                          timeout=60)
        wav = encode_wav(np.ones(4000, np.float32), 8000)
        conn.request("POST", "/wrong/path", body=wav)
        r1 = conn.getresponse()
        assert r1.status == 404
        r1.read()
        # same connection: must still parse cleanly
        conn.request("POST", "/v1/separate", body=wav)
        r2 = conn.getresponse()
        assert r2.status == 200
        assert json.loads(r2.read())["n_src"] == 2
        conn.close()
    finally:
        srv.close()
        eng.close()


def test_api_prometheus_metrics():
    import json
    from urllib.request import Request, urlopen

    from ditsep_tpu.interface.web import encode_wav

    eng = BatchingEngine(_pointwise_fn(), max_wait_ms=5.0)
    srv = SeparationAPIServer(eng, port=0).start()
    try:
        url = f"http://127.0.0.1:{srv.port}"
        wav = encode_wav(np.ones(4000, np.float32), 8000)
        with urlopen(Request(f"{url}/v1/separate", data=wav),
                     timeout=60) as r:
            json.loads(r.read())
        with urlopen(f"{url}/metrics", timeout=10) as r:
            assert "text/plain" in r.headers["Content-Type"]
            body = r.read().decode()
        assert "ditsep_requests_total 1" in body
        assert "ditsep_batches_total 1" in body
        assert "# TYPE ditsep_pending_requests gauge" in body
        assert 'ditsep_request_latency_seconds{quantile="0.5"}' in body
    finally:
        srv.close()
        eng.close()


@pytest.mark.slow
def test_build_engine_latent_e2e():
    """serve_api --latent: VAE encode -> latent PC sampling -> decode
    behind the batching engine."""
    from ditsep_tpu.cli.common import load_config
    from ditsep_tpu.cli.serve_api import build_engine

    cfg = load_config("latent_diffsep_ouve", [
        "model.score_model.nf=16", "model.score_model.ch_mult=(1, 2)",
        "model.score_model.attn_resolutions=()",
        "model.score_model.image_size=4", "model.vae.channels=8",
        "model.vae.c_mults=(1, 2)", "model.vae.strides=(2, 4)",
        "model.vae.latent_dim=4"])
    eng = build_engine(cfg, sampler_N=2, latent=True, max_batch=2,
                       max_wait_ms=40.0)
    try:
        rng = np.random.default_rng(4)
        futs = [eng.submit(0.2 * rng.standard_normal(4000)
                           .astype(np.float32)) for _ in range(2)]
        for f in futs:
            out = f.result(timeout=600)
            assert out.shape == (2, 4000)
            assert np.isfinite(out).all()
        assert eng.stats()["batches"] == 1
    finally:
        eng.close()


def test_api_concurrent_requests_batch():
    import base64
    import json
    from urllib.request import Request, urlopen

    from ditsep_tpu.interface.web import decode_wav, encode_wav

    eng = BatchingEngine(_pointwise_fn(), max_batch=4, max_wait_ms=300.0)
    srv = SeparationAPIServer(eng, port=0).start()
    try:
        url = f"http://127.0.0.1:{srv.port}/v1/separate"
        rng = np.random.default_rng(2)
        audios = [0.2 * rng.standard_normal(8000).astype(np.float32)
                  for _ in range(4)]
        results = [None] * 4

        def post(i):
            req = Request(url, data=encode_wav(audios[i], 8000))
            with urlopen(req, timeout=60) as r:
                results[i] = json.loads(r.read())

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, body in enumerate(results):
            stem, _ = decode_wav(base64.b64decode(body["stems"][0]))
            # 16-bit encoding clips to [-1, 1]
            np.testing.assert_allclose(stem[:, 0],
                                       np.clip(2.0 * audios[i], -1.0, 1.0),
                                       atol=2e-4)
        # the four concurrent posts rode fewer than four dispatches
        assert eng.stats()["batches"] < 4
    finally:
        srv.close()
        eng.close()


def test_api_server_streaming_session():
    """HTTP streaming sessions: open -> push raw f32 blocks -> close.
    The pointwise separator makes the expected output exact: stems are
    (2x, -x) everywhere (crossfades blend identical values, alignment
    always picks the identity permutation)."""
    import base64
    import json
    from urllib.error import HTTPError
    from urllib.request import Request, urlopen

    eng = BatchingEngine(_pointwise_fn(), max_wait_ms=5.0)
    srv = SeparationAPIServer(eng, port=0, n_src=2,
                              stream_chunk_seconds=0.75,
                              stream_overlap_seconds=0.125).start()
    try:
        url = f"http://127.0.0.1:{srv.port}"

        def post(path, data=b""):
            with urlopen(Request(f"{url}{path}", data=data),
                         timeout=30) as r:
                return json.loads(r.read())

        meta = post("/v1/stream/open")
        assert meta["fs"] == 8000 and meta["n_src"] == 2
        assert meta["chunk_seconds"] == 0.75
        assert meta["latency_seconds"] == (6000 + 5000) / 8000
        sid = meta["id"]

        with urlopen(f"{url}/v1/stats", timeout=10) as r:
            assert json.loads(r.read())["open_streams"] == 1

        rng = np.random.default_rng(0)
        mix = (rng.standard_normal(15000) * 0.2).astype(np.float32)
        pieces = []
        for s in range(0, 15000, 4000):
            out = post(f"/v1/stream/{sid}/push",
                       mix[s:s + 4000].tobytes())
            pieces.append(np.stack([
                np.frombuffer(base64.b64decode(b), dtype="<f4")
                for b in out["stems"]]))
            assert out["samples"] == pieces[-1].shape[-1]
        out = post(f"/v1/stream/{sid}/close")
        pieces.append(np.stack([
            np.frombuffer(base64.b64decode(b), dtype="<f4")
            for b in out["stems"]]))
        est = np.concatenate(pieces, axis=-1)
        assert est.shape == (2, 15000)
        np.testing.assert_allclose(est[0], 2.0 * mix, atol=1e-5)
        np.testing.assert_allclose(est[1], -mix, atol=1e-5)

        # session deleted on close; unknown ids 404; bad payloads 400
        with pytest.raises(HTTPError) as e:
            post(f"/v1/stream/{sid}/push", b"\x00" * 8)
        assert e.value.code == 404
        meta2 = post("/v1/stream/open?chunk_seconds=0.5")
        with pytest.raises(HTTPError) as e:
            post(f"/v1/stream/{meta2['id']}/push", b"\x00" * 3)
        assert e.value.code == 400
        with pytest.raises(HTTPError) as e:
            post("/v1/stream/open?chunk_seconds=1e9")
        assert e.value.code == 400
        # nan/inf parameters must 400, not crash the handler
        for bad in ("chunk_seconds=nan", "chunk_seconds=inf"):
            with pytest.raises(HTTPError) as e:
                post(f"/v1/stream/open?{bad}")
            assert e.value.code == 400
        # zero overlap leaves no permutation-alignment signal
        with pytest.raises(HTTPError) as e:
            post("/v1/stream/open?overlap_seconds=0")
        assert e.value.code == 400
    finally:
        srv.close()
        eng.close()


def test_install_graceful_shutdown_drains():
    """The serve_api SIGTERM handler stops the listener and finishes
    pending engine work (engine dispatch-on-close) without dropping
    in-flight futures."""
    import signal
    import time as _time
    from urllib.error import URLError
    from urllib.request import urlopen

    from ditsep_tpu.cli.serve_api import install_graceful_shutdown

    calls = []

    def slow_fn(key, mix):
        calls.append(int(mix.shape[0]))
        _time.sleep(0.2)
        x = np.asarray(mix)[:, 0]
        return np.stack([2.0 * x, -x], axis=1)

    eng = BatchingEngine(slow_fn, max_wait_ms=500.0, max_batch=4)
    srv = SeparationAPIServer(eng, port=0).start()
    old = {s: signal.getsignal(s) for s in (signal.SIGTERM, signal.SIGINT)}
    try:
        install_graceful_shutdown(srv, eng)
        port = srv.port
        # enqueue work that is still pending when the signal arrives
        fut = eng.submit(np.ones(4000, np.float32) * 0.1)
        signal.getsignal(signal.SIGTERM)(signal.SIGTERM, None)
        # pending request completes (dispatch-on-close), not dropped
        est = fut.result(timeout=30)
        assert est.shape[0] == 2 and calls
        # listener is down
        deadline = _time.time() + 10
        down = False
        while _time.time() < deadline and not down:
            try:
                urlopen(f"http://127.0.0.1:{port}/healthz", timeout=1)
                _time.sleep(0.1)
            except (URLError, ConnectionError, OSError):
                down = True
        assert down
    finally:
        for s, h in old.items():
            signal.signal(s, h)
        srv.close()
        eng.close()


def test_engine_cold_bucket_not_starved_by_hot_bucket():
    """Sustained full batches on a hot shape must not starve a lone
    request in a cold bucket past max_wait (latency bound: max_wait +
    one sampler call)."""
    import threading as _threading

    def slow_fn(key, mix):
        time.sleep(0.05)
        x = np.asarray(mix)[:, 0]
        return np.stack([x, x], axis=1)

    eng = BatchingEngine(slow_fn, max_batch=2, max_wait_ms=150.0)
    stop = _threading.Event()

    def hot_load():
        while not stop.is_set():
            eng.submit(np.ones(4000, np.float32))
            eng.submit(np.ones(4000, np.float32))
            time.sleep(0.02)

    t = _threading.Thread(target=hot_load, daemon=True)
    try:
        t.start()
        time.sleep(0.1)  # hot bucket saturated
        cold = eng.submit(np.ones(40000, np.float32))
        cold.result(timeout=5)  # pre-fix: starves until load stops
    finally:
        stop.set()
        t.join(timeout=5)
        eng.close()


def test_engine_wire_int16_fidelity():
    """wire_int16 moves audio host<->device as int16 (halving the
    transfer volume that dominates served latency on remote-attached
    TPUs — docs/serving_bench.json); results must match the f32-wire
    path within 16-bit quantization (the WAV response's own width)."""
    import jax.numpy as jnp

    def sep(key, mix):
        x = mix[:, 0]
        return jnp.stack([2.0 * x, -x], axis=1)

    eng = BatchingEngine(sep, max_batch=4, max_wait_ms=30.0,
                         wire_int16=True)
    try:
        rng = np.random.default_rng(3)
        audios = [rng.uniform(-0.4, 0.4, size=L).astype(np.float32)
                  for L in (8000, 8010)]
        outs = [f.result(timeout=60)
                for f in [eng.submit(a) for a in audios]]
        for a, o in zip(audios, outs):
            assert o.shape == (2, a.shape[-1])
            assert o.dtype == np.float32
            # input quant (1/32768) propagated through 2x + output quant
            np.testing.assert_allclose(o[0], 2.0 * a, atol=3.5 / 32768)
            np.testing.assert_allclose(o[1], -a, atol=2.5 / 32768)
    finally:
        eng.close()


def test_engine_pipeline_depth_invariance():
    """pipeline_depth only changes SCHEDULING (dispatch of batch k+1
    overlaps the host read of batch k); results and the RNG stream must
    be bit-identical at any depth because keys are split in dispatch
    order. One bucket + full batches makes batch composition
    deterministic, and a key-dependent separator makes any reordering
    visible."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def sep(key, mix):
        x = mix[:, 0]
        noise = jax.random.normal(key, x.shape, x.dtype)
        return jnp.stack([x + noise, x - noise], axis=1)

    rng = np.random.default_rng(11)
    audios = [rng.standard_normal(5000).astype(np.float32)
              for _ in range(12)]
    results = []
    for depth in (1, 3):
        eng = BatchingEngine(sep, max_batch=4, max_wait_ms=500.0,
                             seed=42, pipeline_depth=depth)
        try:
            futs = [eng.submit(a) for a in audios]
            results.append([f.result(timeout=120) for f in futs])
            assert eng.stats()["batches"] == 3
        finally:
            eng.close()
    for serial, piped in zip(*results):
        np.testing.assert_array_equal(serial, piped)


def test_engine_pipelined_overlaps_reads():
    """With depth >= 2 the dispatch thread must not wait for batch k's
    host read before dispatching batch k+1: a separator whose RESULT
    read blocks (simulating the device->host download) still admits the
    next dispatch. Verified by timing: two batches through a separator
    whose read costs `delay` finish in ~delay + epsilon extra, not
    2*delay, because the second compute/read overlaps the first."""

    delay = 0.5  # generous vs thread-scheduling jitter on loaded boxes

    class SlowRead:
        """Mimics an async jax array: materializes after `delay`."""

        def __init__(self, value, t_ready):
            self._value = value
            self._t_ready = t_ready

        def __array__(self, dtype=None, copy=None):
            rem = self._t_ready - time.perf_counter()
            if rem > 0:
                time.sleep(rem)
            v = self._value
            return v.astype(dtype) if dtype is not None else v

    def sep(key, mix):
        x = np.asarray(mix)[:, 0]
        return SlowRead(np.stack([2.0 * x, -x], axis=1),
                        time.perf_counter() + delay)

    rng = np.random.default_rng(5)
    audios = [rng.standard_normal(5000).astype(np.float32)
              for _ in range(4)]
    timings = {}
    for depth in (1, 2):
        eng = BatchingEngine(sep, max_batch=2, max_wait_ms=500.0,
                             pipeline_depth=depth)
        try:
            t0 = time.perf_counter()
            futs = [eng.submit(a) for a in audios]
            outs = [f.result(timeout=60) for f in futs]
            timings[depth] = time.perf_counter() - t0
            for a, o in zip(audios, outs):
                np.testing.assert_allclose(o[0], 2.0 * a, rtol=1e-6)
        finally:
            eng.close()
    assert timings[1] >= 2 * delay - 0.1           # serial: reads stack
    assert timings[2] <= timings[1] - 0.3 * delay  # pipelined: overlap


def test_build_engine_latent_ab2():
    """serve_api --latent --sampler ab2: the matched-quality fast mode
    (docs/latent_nfe_r05.json: AB2 at NFE 30 == PC at NFE 60) must run
    end-to-end through the production engine."""
    from ditsep_tpu.cli.common import load_config
    from ditsep_tpu.cli.serve_api import build_engine

    cfg = load_config("latent_diffsep_ouve", [
        "model.score_model.nf=16", "model.score_model.ch_mult=(1, 2)",
        "model.score_model.attn_resolutions=()",
        "model.score_model.image_size=4", "model.vae.channels=8",
        "model.vae.c_mults=(1, 2)", "model.vae.strides=(2, 4)",
        "model.vae.latent_dim=4"])
    eng = build_engine(cfg, sampler_N=3, sampler="ab2", latent=True,
                       max_batch=2, max_wait_ms=40.0)
    try:
        rng = np.random.default_rng(6)
        futs = [eng.submit(0.2 * rng.standard_normal(4000)
                           .astype(np.float32)) for _ in range(2)]
        for f in futs:
            out = f.result(timeout=600)
            assert out.shape == (2, 4000)
            assert np.isfinite(out).all()
    finally:
        eng.close()


def test_engine_pipeline_depth_bounds_inflight():
    """The in-flight semaphore must bound DISPATCHED-but-unread batches
    at exactly pipeline_depth: the dispatch thread blocks BEFORE
    uploading batch depth+1 (a bounded queue alone would admit one
    extra, already-uploaded batch held by the blocked producer)."""
    gate = threading.Event()
    dispatched = []

    class GatedRead:
        def __init__(self, value):
            self._v = value

        def __array__(self, dtype=None, copy=None):
            gate.wait(30)
            return self._v

    def sep(key, mix):
        x = np.asarray(mix)[:, 0]
        dispatched.append(1)
        return GatedRead(np.stack([2.0 * x, -x], axis=1))

    eng = BatchingEngine(sep, max_batch=1, max_wait_ms=5.0,
                         pipeline_depth=2)
    try:
        futs = [eng.submit(np.zeros(4000, np.float32)) for _ in range(5)]
        deadline = time.perf_counter() + 30.0
        while len(dispatched) < 2 and time.perf_counter() < deadline:
            time.sleep(0.02)  # first dispatch pays jax warmup
        time.sleep(0.5)  # grace: a 3rd dispatch would land in here
        assert len(dispatched) == 2  # depth batches in flight, not 3
        gate.set()
        for f in futs:
            assert f.result(timeout=30).shape == (2, 4000)
        assert len(dispatched) == 5
    finally:
        gate.set()
        eng.close()


def test_engine_close_fails_inflight_on_wedged_read():
    """If the completion thread is wedged in a host read (stalled
    tunnel), close(timeout) must still fail the IN-FLIGHT batches'
    futures — callers blocked on result() must not hang forever after
    close() returns."""
    gate = threading.Event()

    class WedgedRead:
        def __init__(self, value):
            self._v = value

        def __array__(self, dtype=None, copy=None):
            gate.wait(30)
            return self._v

    def sep(key, mix):
        x = np.asarray(mix)[:, 0]
        return WedgedRead(np.stack([2.0 * x, -x], axis=1))

    eng = BatchingEngine(sep, max_batch=2, max_wait_ms=5.0,
                         pipeline_depth=2)
    futs = [eng.submit(np.zeros(4000, np.float32)) for _ in range(2)]
    time.sleep(0.4)  # batch dispatched; completer stuck in the read
    eng.close(timeout=0.8)
    for f in futs:
        with pytest.raises(RuntimeError):
            f.result(timeout=5)
    gate.set()  # unblock the daemon completer; its late set_result
    #             attempt must be a no-op (futures already failed)
    time.sleep(0.2)
