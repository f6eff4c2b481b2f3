"""DiT torch-oracle numerical parity.

The oracle is the reference's own torch DiffusionTransformer
(/root/reference/src/stable_audio_tools/models/dit.py:12-428 with
transformer_type='continuous_transformer', which runs its in-repo
ContinuousTransformer, transformer.py:766-899) on CPU. We random-init the
torch module, import the state_dict via
ditsep_tpu.models.torch_import.import_dit_params, and require numerically
matching outputs through: the unconditioned pass (Fourier timestep embed,
prepend global token, pre/post 1x1 convs, RoPE attention stack, SwiGLU
FF), full conditioning (cross-attn + prepend + input-concat + projected
global), classifier-free guidance with negative conditioning and
scale_phi rescale, the cfg_interval gate, and the adaLN global
conditioning mode.

Reference mask quirk (discovered BY this oracle): no conditioning mask
ever reaches the attention kernels — dit.py:306-309 hard-disables the
cross-attn mask, and ContinuousTransformer.forward builds the combined
prepend+input key mask then never forwards it to the layers
(transformer.py:885-889). A faithfully-masking implementation diverges
by ~0.12 on masked-prepend inputs; our DiT therefore ignores masks by
default (apply_cond_masks=False) and offers real masking as an opt-in
extension for new trainings.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ditsep_tpu.models.dit import DiffusionTransformer
from ditsep_tpu.models.torch_import import import_dit_params

REF_SRC = "/root/reference/src"

if not os.path.isdir(REF_SRC):
    pytest.skip(f"reference checkout not present at {REF_SRC}",
                allow_module_level=True)


def _ref_dit(**kw):
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    from stable_audio_tools.models.dit import (
        DiffusionTransformer as RefDiT)
    torch.manual_seed(0)
    model = RefDiT(transformer_type="continuous_transformer", **kw)
    # Randomize EVERY parameter (the reference zero-inits to_out /
    # ff-out / pre/post convs, which would make the branch outputs
    # vanish and the parity trivial). Norm gains stay near 1.
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, p in sorted(model.named_parameters()):
            r = torch.randn(p.shape, generator=gen)
            if name.endswith(("gamma", "q_norm.weight", "k_norm.weight")):
                p.copy_(1.0 + 0.1 * r)
            else:
                p.copy_(0.05 * r)
    return model.eval()


COMMON = dict(io_channels=4, embed_dim=128, depth=2, num_heads=2,
              patch_size=1)


def _ours_from(ref, **kw):
    model = DiffusionTransformer(**COMMON, **kw)
    params = import_dit_params(ref.state_dict(), depth=COMMON["depth"])
    return model, params


def _np(t):
    return t.detach().cpu().numpy()


RNG = np.random.default_rng(3)
X = RNG.standard_normal((2, 4, 24)).astype(np.float32)
T = RNG.uniform(0.05, 0.95, (2,)).astype(np.float32)


def test_dit_uncond_parity():
    ref = _ref_dit(**COMMON)
    ours, params = _ours_from(ref)
    with torch.no_grad():
        want = _np(ref(torch.from_numpy(X), torch.from_numpy(T)))
    got = np.asarray(ours.apply(params, jnp.asarray(X), jnp.asarray(T)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dit_full_conditioning_parity():
    kw = dict(cond_token_dim=16, global_cond_dim=24, prepend_cond_dim=12,
              input_concat_dim=3)
    ref = _ref_dit(**COMMON, **kw)
    ours, params = _ours_from(ref, **kw)
    cross = RNG.standard_normal((2, 6, 16)).astype(np.float32)
    glob = RNG.standard_normal((2, 24)).astype(np.float32)
    prep = RNG.standard_normal((2, 3, 12)).astype(np.float32)
    pmask = np.array([[True, True, False], [True, False, True]])
    concat = RNG.standard_normal((2, 3, 24)).astype(np.float32)
    with torch.no_grad():
        want = _np(ref(
            torch.from_numpy(X), torch.from_numpy(T),
            cross_attn_cond=torch.from_numpy(cross),
            global_embed=torch.from_numpy(glob),
            prepend_cond=torch.from_numpy(prep),
            prepend_cond_mask=torch.from_numpy(pmask),
            input_concat_cond=torch.from_numpy(concat)))
    got = np.asarray(ours.apply(
        params, jnp.asarray(X), jnp.asarray(T),
        cross_attn_cond=jnp.asarray(cross), global_embed=jnp.asarray(glob),
        prepend_cond=jnp.asarray(prep),
        prepend_cond_mask=jnp.asarray(pmask),
        input_concat_cond=jnp.asarray(concat)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_dit_cfg_negative_cond_and_rescale_parity():
    kw = dict(cond_token_dim=16, global_cond_dim=24, prepend_cond_dim=12)
    ref = _ref_dit(**COMMON, **kw)
    ours, params = _ours_from(ref, **kw)
    cross = RNG.standard_normal((2, 6, 16)).astype(np.float32)
    neg = RNG.standard_normal((2, 6, 16)).astype(np.float32)
    nmask = np.array([[1, 1, 1, 0, 0, 1], [1, 0, 1, 1, 1, 1]])
    glob = RNG.standard_normal((2, 24)).astype(np.float32)
    prep = RNG.standard_normal((2, 3, 12)).astype(np.float32)
    # the reference REQUIRES prepend_cond_mask with prepend_cond in
    # 'prepend' global mode (dit.py:210 cat(None, ones) crashes without
    # it); all-valid is also the only mask it can represent faithfully
    pmask = np.ones((2, 3), bool)
    with torch.no_grad():
        want = _np(ref(
            torch.from_numpy(X), torch.from_numpy(T),
            cross_attn_cond=torch.from_numpy(cross),
            negative_cross_attn_cond=torch.from_numpy(neg),
            negative_cross_attn_mask=torch.from_numpy(nmask),
            global_embed=torch.from_numpy(glob),
            prepend_cond=torch.from_numpy(prep),
            prepend_cond_mask=torch.from_numpy(pmask),
            cfg_scale=2.0, scale_phi=0.3))
    got = np.asarray(ours.apply(
        params, jnp.asarray(X), jnp.asarray(T),
        cross_attn_cond=jnp.asarray(cross),
        negative_cross_attn_cond=jnp.asarray(neg),
        negative_cross_attn_mask=jnp.asarray(nmask),
        global_embed=jnp.asarray(glob), prepend_cond=jnp.asarray(prep),
        prepend_cond_mask=jnp.asarray(pmask),
        cfg_scale=2.0, scale_phi=0.3))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_dit_cfg_interval_gate_parity():
    """Outside cfg_interval the reference falls back to the plain
    conditioned pass (dit.py:326-333); ours gates with a free select on
    the doubled batch."""
    kw = dict(cond_token_dim=16)
    ref = _ref_dit(**COMMON, **kw)
    ours, params = _ours_from(ref, **kw)
    cross = RNG.standard_normal((2, 6, 16)).astype(np.float32)
    t_out = np.full((2,), 0.02, np.float32)  # sigma ~0.031 < 0.2
    for t_val, interval in ((T, (0.0, 1.0)), (t_out, (0.2, 0.8))):
        with torch.no_grad():
            want = _np(ref(
                torch.from_numpy(X), torch.from_numpy(t_val),
                cross_attn_cond=torch.from_numpy(cross),
                cfg_scale=3.0, cfg_interval=interval))
        got = np.asarray(ours.apply(
            params, jnp.asarray(X), jnp.asarray(t_val),
            cross_attn_cond=jnp.asarray(cross),
            cfg_scale=3.0, cfg_interval=interval))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_dit_adaln_parity():
    kw = dict(global_cond_dim=24, global_cond_type="adaLN")
    ref = _ref_dit(**COMMON, **kw)
    ours, params = _ours_from(ref, **kw)
    glob = RNG.standard_normal((2, 24)).astype(np.float32)
    with torch.no_grad():
        want = _np(ref(torch.from_numpy(X), torch.from_numpy(T),
                       global_embed=torch.from_numpy(glob)))
    got = np.asarray(ours.apply(params, jnp.asarray(X), jnp.asarray(T),
                                global_embed=jnp.asarray(glob)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
