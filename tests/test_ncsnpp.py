"""NCSN++ parity and behavior tests.

The oracle is the reference's own torch NCSNpp (imported from
/root/reference/src with the CUDA `op` extension replaced by a pure-torch
stub written here from the op contract). We random-init the torch model,
import its state_dict into our Flax NCSNpp via
ditsep_tpu.models.torch_import, and require numerically matching outputs.
This validates the architecture AND the checkpoint importer in one shot.
"""
import math
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ditsep_tpu.models import NCSNpp, import_params
from ditsep_tpu.models.score_models import ScoreModelNCSNpp

REF_SRC = "/root/reference/src"


def _install_reference(monkeypatch=None):
    """Make the reference torch NCSNpp importable on CPU by stubbing the
    CUDA op package with pure-torch implementations of the op contract."""
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    name = "models.diffsep.ncsnpp_utils.op"
    if name in sys.modules:
        return
    stub = types.ModuleType(name)

    def upfirdn2d(x, k, up=1, down=1, pad=(0, 0)):
        n, c, h, w = x.shape
        kh, kw = k.shape
        x = x.reshape(n * c, 1, h, w)
        if up > 1:
            z = x.new_zeros(n * c, 1, h * up, w * up)
            z[:, :, ::up, ::up] = x
            x = z
        p0, p1 = int(pad[0]), int(pad[1])
        x = torch.nn.functional.pad(
            x, (max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)))
        if p0 < 0:
            x = x[:, :, -p0:, -p0:]
        if p1 < 0:
            x = x[:, :, :p1, :p1]
        wk = torch.flip(k, [0, 1]).reshape(1, 1, kh, kw).to(x.dtype)
        x = torch.nn.functional.conv2d(x, wk, stride=down)
        return x.reshape(n, c, x.shape[2], x.shape[3])

    def fused_leaky_relu(x, bias, negative_slope=0.2, scale=2 ** 0.5):
        return torch.nn.functional.leaky_relu(
            x + bias.reshape(1, -1, 1, 1), negative_slope) * scale

    class FusedLeakyReLU(torch.nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = torch.nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, x):
            return fused_leaky_relu(
                x, self.bias, self.negative_slope, self.scale)

    stub.upfirdn2d = upfirdn2d
    stub.fused_leaky_relu = fused_leaky_relu
    stub.FusedLeakyReLU = FusedLeakyReLU
    sys.modules[name] = stub


def _torch_ncsnpp(**kwargs):
    _install_reference()
    from models.diffsep.ncsnpp import NCSNpp as TorchNCSNpp

    torch.manual_seed(0)
    return TorchNCSNpp(**kwargs)


def _parity_case(torch_kwargs, flax_kwargs, b, h, w, cin, atol):
    tm = _torch_ncsnpp(**torch_kwargs)
    tm.eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    fm = NCSNpp(**flax_kwargs)
    rng = jax.random.PRNGKey(0)
    x = np.random.default_rng(1).standard_normal((b, h, w, cin)).astype(
        np.float32) * 0.1
    t = np.array([0.4, 0.9][:b], dtype=np.float32)
    variables = fm.init(rng, jnp.asarray(x), jnp.asarray(t))
    params = import_params(variables["params"], state)

    out_flax = fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t))
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        out_torch = tm(xt, torch.from_numpy(t)).numpy().transpose(0, 2, 3, 1)
    err = np.max(np.abs(np.asarray(out_flax) - out_torch))
    scale = max(np.max(np.abs(out_torch)), 1e-6)
    assert err / scale < atol, f"relative error {err/scale} (abs {err})"


@pytest.mark.slow
def test_ncsnpp_waveform_config_parity():
    """Waveform-model architecture (reference config
    src/config/diffsep/model/default.yaml:22-30, shrunk nf), full parity
    including FIR resampling, input/output pyramids and attention."""
    common = dict(
        nf=16, ch_mult=(1, 1, 2), num_res_blocks=2, attn_resolutions=(16,),
        image_size=64, num_channels_in=6, num_channels_out=4,
        scale_by_sigma=True, centered=False, dropout=0.0,
    )
    _parity_case(common, common, b=2, h=64, w=32, cin=6, atol=2e-5)


@pytest.mark.slow
def test_ncsnpp_latent_config_parity():
    """Latent-model architecture (reference config
    src/config/latent_diffsep_ouve/model/default.yaml:20-28, shrunk)."""
    common = dict(
        nf=16, ch_mult=(1, 2, 2), num_res_blocks=2, attn_resolutions=(16,),
        image_size=64, num_channels_in=3, num_channels_out=2,
        scale_by_sigma=True, centered=True, dropout=0.0,
    )
    _parity_case(common, common, b=1, h=64, w=16, cin=3, atol=2e-5)


def test_score_model_spec_roundtrip():
    """pre_process/post_process must invert each other
    (reference: score_models.py:107-124)."""
    m = ScoreModelNCSNpp(num_sources=2, nf=16, ch_mult=(1, 1))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8000))

    bound = m.bind({})  # pre/post use no params
    h, n_samples, n_pad = bound.pre_process(x)
    assert h.shape[1] == 256 and h.shape[2] % 64 == 0
    y = bound.post_process(h, n_samples, n_pad)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)


def test_score_model_jit_and_grad():
    """End-to-end jit + gradient through the score model (small)."""
    m = ScoreModelNCSNpp(
        num_sources=2, nf=16, ch_mult=(1, 1), attn_resolutions=(),
        image_size=256)
    key = jax.random.PRNGKey(0)
    xt = jax.random.normal(key, (1, 2, 4000))
    mix = jax.random.normal(key, (1, 1, 4000))
    t = jnp.array([0.5])
    params = m.init(key, xt, t, mix)

    @jax.jit
    def loss_fn(p):
        out = m.apply(p, xt, t, mix)
        return jnp.mean(out ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
