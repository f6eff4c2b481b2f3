"""Stdlib web demo server tests (ditsep_tpu.interface.web) — the
TPU-image equivalent of the reference's gradio demo
(reference: src/inference/run_gradio.py:7-32). Drives a live
ThreadingHTTPServer over localhost with urllib, covering every endpoint
the backends expose."""
import base64
import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def test_wav_codec_roundtrip():
    from ditsep_tpu.interface.web import decode_wav, encode_wav

    rng = np.random.default_rng(0)
    mono = np.tanh(rng.standard_normal(500)).astype(np.float32) * 0.9
    out, fs = decode_wav(encode_wav(mono, 8000))
    assert fs == 8000 and out.shape == (500, 1)
    np.testing.assert_allclose(out[:, 0], mono, atol=1 / 16000, rtol=0)

    stereo = np.tanh(rng.standard_normal((2, 300))).astype(np.float32)
    out2, fs2 = decode_wav(encode_wav(stereo, 16000))
    assert fs2 == 16000 and out2.shape == (300, 2)
    np.testing.assert_allclose(out2.T, stereo, atol=1 / 16000, rtol=0)


@pytest.fixture(scope="module")
def server():
    from ditsep_tpu.interface import (AutoencoderApp, DemoServer,
                                      GenerationApp, LMApp, SeparationApp)
    from ditsep_tpu.models import ScoreModelNCSNpp
    from ditsep_tpu.models.dit import DiffusionTransformer
    from ditsep_tpu.models.lm import AudioLM
    from ditsep_tpu.models.oobleck import OobleckVAE
    from ditsep_tpu.sdes import MixSDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer

    tr = DiffSepTrainer(
        model=ScoreModelNCSNpp(num_sources=2, nf=16, ch_mult=(1, 1),
                               attn_resolutions=(), image_size=256),
        sde=MixSDE(), cfg=DiffSepConfig(init_hack=0))
    mix = jnp.zeros((1, 1, 2000))
    sep_params = tr.model.init(KEY, jnp.zeros((1, 2, 2000)),
                               jnp.full((1,), 0.5), mix)

    vae = OobleckVAE(channels=8, c_mults=(1, 2), strides=(2, 4),
                     latent_dim=4)
    vae_params = vae.init(KEY, jnp.zeros((1, 1, 1600)))

    dit = DiffusionTransformer(io_channels=1, embed_dim=32, depth=1,
                               num_heads=2)
    dit_params = dit.init(KEY, jnp.zeros((1, 1, 64)), jnp.full((1,), 0.5))

    lm = AudioLM(n_quantizers=2, codebook_size=16, dim=32, depth=1,
                 num_heads=2)
    lm_params = lm.init(KEY, jax.random.randint(KEY, (1, 2, 4), 0, 16))

    srv = DemoServer(
        separation=SeparationApp(trainer=tr, params=sep_params),
        autoencoder=AutoencoderApp(vae=vae, params=vae_params),
        generation=GenerationApp(model=dit, params=dit_params,
                                 io_channels=1, sample_size=64),
        lm=LMApp(lm=lm, lm_params=lm_params),
        port=0).start()
    yield srv
    srv.close()


def _url(server, path):
    return f"http://127.0.0.1:{server.port}{path}"


def _post(server, path, body, timeout=300):
    req = urllib.request.Request(_url(server, path), data=body,
                                 method="POST")
    return urllib.request.urlopen(req, timeout=timeout)


def test_index_and_info(server):
    page = urllib.request.urlopen(_url(server, "/"), timeout=30).read()
    assert b"ditsep_tpu" in page
    info = json.loads(urllib.request.urlopen(
        _url(server, "/api/info"), timeout=30).read())
    assert info["separation"] and info["autoencoder"]
    assert info["generation"] and info["lm"]
    assert info["generation_cond"] is False  # no routing configured
    assert info["fs"] == 8000


def test_separate_endpoint(server):
    from ditsep_tpu.interface.web import decode_wav, encode_wav

    rng = np.random.default_rng(1)
    wav = encode_wav((rng.standard_normal(2000) * 0.3).astype(np.float32),
                     8000)
    r = _post(server, "/api/separate?n_steps=2&seed=3", wav)
    out = json.loads(r.read())
    assert r.headers["Content-Type"] == "application/json"
    assert out["fs"] == 8000 and len(out["sources"]) == 2
    for b64 in out["sources"]:
        src, fs = decode_wav(base64.b64decode(b64))
        assert fs == 8000 and src.shape == (2000, 1)
        assert np.isfinite(src).all()


def test_autoencoder_endpoint(server):
    from ditsep_tpu.interface.web import decode_wav, encode_wav

    rng = np.random.default_rng(2)
    wav = encode_wav((rng.standard_normal(1600) * 0.3).astype(np.float32),
                     8000)
    r = _post(server, "/api/autoencoder?latent_noise=0.1", wav)
    assert r.headers["Content-Type"] == "audio/wav"
    rec, fs = decode_wav(r.read())
    assert fs == 8000 and rec.shape[1] == 1 and np.isfinite(rec).all()


def test_generate_endpoint(server):
    from ditsep_tpu.interface.web import decode_wav

    body = json.dumps({"steps": 3, "seed": 1}).encode()
    r = _post(server, "/api/generate", body)
    assert r.headers["Content-Type"] == "audio/wav"
    audio, fs = decode_wav(r.read())
    assert fs == 8000 and audio.shape == (64, 1)


def test_lm_endpoint_returns_codes_without_codec(server):
    body = json.dumps({"length": 4, "top_k": 4}).encode()
    out = json.loads(_post(server, "/api/lm", body).read())
    codes = np.asarray(out["codes"])
    assert codes.shape == (1, 2, 4)
    assert codes.min() >= 0 and codes.max() < 16


def test_unknown_endpoint_and_bad_input(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/api/nope", b"")
    assert e.value.code == 404
    # malformed wav -> clean 500 with the error text, server stays up
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/api/separate", b"not a wav file")
    assert e.value.code == 500
    info = json.loads(urllib.request.urlopen(
        _url(server, "/api/info"), timeout=30).read())
    assert info["separation"]


def test_serve_cli_builds_separation_backend():
    """cli/serve.py builder path: tiny diffsep config -> SeparationApp ->
    server with only the separation tab live."""
    from ditsep_tpu.cli.common import load_config
    from ditsep_tpu.cli.serve import build_separation_app
    from ditsep_tpu.interface import DemoServer

    cfg = load_config("diffsep", [
        "model.score_model.nf=16",
        "model.score_model.ch_mult=(1, 1)",
        "model.score_model.attn_resolutions=()",
    ])
    app = build_separation_app(cfg)
    srv = DemoServer(separation=app, port=0).start()
    try:
        info = json.loads(urllib.request.urlopen(
            _url(srv, "/api/info"), timeout=30).read())
        assert info["separation"] and not info["autoencoder"]
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/api/autoencoder", b"")
        assert e.value.code == 404
    finally:
        srv.close()
