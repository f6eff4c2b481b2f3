"""FACodec torch-oracle numerical parity.

The oracle is the reference's own torch FACodecEncoder/FACodecDecoder
(/root/reference/src/models/facodec/facodec.py) run on CPU with its
unused ``diffusers``/``omegaconf`` imports stubbed. We random-init the
torch modules, import the state_dicts via
ditsep_tpu.models.facodec_import, and require numerically matching
outputs through the full codec: encoder features, VQ codes, speaker
embedding, supervision heads, and decoded audio. This validates the
alias-free Kaiser-sinc stack, the factorized RVQ, the timbre
transformer (including the reference's literal pe[:batch] positional
quirk) and both importers in one shot.
"""
import importlib.machinery
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ditsep_tpu.models.facodec import FACodecDecoder, FACodecEncoder
from ditsep_tpu.models.facodec_import import (
    import_facodec_decoder, import_facodec_encoder)

pytestmark = pytest.mark.slow

REF_SRC = "/root/reference/src"

if not __import__("os").path.isdir(REF_SRC):
    pytest.skip(f"reference checkout not present at {REF_SRC}",
                allow_module_level=True)


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def _install_reference():
    """Make reference models.facodec.facodec importable on CPU by
    stubbing its unused diffusers/omegaconf imports."""
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)

    class _ModelMixin:
        pass

    class _ConfigMixin:
        pass

    class _BaseOutput(dict):
        pass

    class _OmegaConf:
        @staticmethod
        def create(d):
            return d

    _stub("diffusers")
    _stub("diffusers.models")
    _stub("diffusers.models.modeling_utils", ModelMixin=_ModelMixin)
    _stub("diffusers.configuration_utils", ConfigMixin=_ConfigMixin,
          register_to_config=lambda f: f)
    _stub("diffusers.utils", BaseOutput=_BaseOutput)
    _stub("omegaconf", OmegaConf=_OmegaConf)
    import models.facodec.facodec as ref_facodec  # noqa: E402
    return ref_facodec


UP_RATIOS = (2, 5)  # encoder hop 10; decoder reversed (5, 2)
D = 256  # forced: the reference decoder hardcodes its timbre
#          transformer at encoder_hidden=256 (facodec.py:358-368)


def test_facodec_encoder_parity():
    ref = _install_reference()
    tm = ref.FACodecEncoder(ngf=4, up_ratios=UP_RATIOS, out_channels=D)
    tm.eval()
    x = np.random.default_rng(0).normal(size=(2, 1, 70)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()

    enc = FACodecEncoder(ngf=4, up_ratios=UP_RATIOS, out_channels=D)
    params = import_facodec_encoder(tm.state_dict())
    out = np.asarray(enc.apply(params, jnp.asarray(x)))
    assert out.shape == ref_out.shape == (2, D, 7)
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=2e-4)


def test_facodec_decoder_parity():
    ref = _install_reference()
    tm = ref.FACodecDecoder(
        in_channels=D, upsample_initial_channel=64, ngf=4,
        up_ratios=UP_RATIOS[::-1], vq_num_q_p=1, vq_num_q_c=2,
        vq_num_q_r=1, vq_dim=D, codebook_dim=4, codebook_size_prosody=4,
        codebook_size_content=4, codebook_size_residual=4,
        use_random_mask_residual=False)
    tm.eval()
    rng = np.random.default_rng(1)
    h = rng.normal(size=(2, D, 7)).astype(np.float32) * 0.5
    with torch.no_grad():
        th = torch.from_numpy(h)
        outs, qs, commit, quantized_buf, spk_embs = tm(
            th, vq=True, eval_vq=True)
        ref_out = tm(th, vq=False, speaker_embedding=spk_embs,
                     quantized=quantized_buf)

    dec = FACodecDecoder(
        in_channels=D, upsample_initial_channel=64, ngf=4,
        up_ratios=UP_RATIOS[::-1], vq_num_q_p=1, vq_num_q_c=2,
        vq_num_q_r=1, codebook_size=16, codebook_dim=4)
    params = import_facodec_decoder(tm.state_dict(), dec)
    audio, info = dec.apply(params, jnp.asarray(h), return_info=True)

    # VQ codes and speaker embedding
    np.testing.assert_array_equal(np.asarray(info["codes"]), qs.numpy())
    np.testing.assert_allclose(np.asarray(info["spk_embs"]),
                               spk_embs.numpy(), atol=2e-4, rtol=2e-4)
    # supervision heads
    np.testing.assert_allclose(np.asarray(info["f0"]),
                               ref_out["f0"].numpy(), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(info["phone"]),
                               ref_out["phone"].numpy(), atol=2e-4,
                               rtol=2e-3)
    # decoded audio through the full upsampling stack
    np.testing.assert_allclose(np.asarray(audio),
                               ref_out["audio"].numpy(), atol=5e-4,
                               rtol=5e-4)

    # vq2emb parity (token-domain reconstruction path)
    with torch.no_grad():
        ref_emb = tm.vq2emb(qs).numpy()
    emb = np.asarray(dec.apply(params, jnp.asarray(qs.numpy()),
                               method=dec.vq2emb))
    np.testing.assert_allclose(emb, ref_emb, atol=2e-4, rtol=2e-4)

    # voice-conversion path == reference inference()
    with torch.no_grad():
        ref_vc = tm.inference(torch.from_numpy(ref_emb),
                              spk_embs).numpy()
    vc = np.asarray(dec.apply(params, jnp.asarray(ref_emb),
                              jnp.asarray(spk_embs.numpy()),
                              method=dec.decode_with_timbre))
    np.testing.assert_allclose(vc, ref_vc, atol=5e-4, rtol=5e-4)
