"""adp UNet1d family tests: conditioning paths, CFG semantics, NCCA,
factory construction from reference-style JSON configs, gradient flow.
(reference: src/stable_audio_tools/models/adp.py:24-1562)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ditsep_tpu.models.unet1d import (
    NumberEmbedder, UNet1d, UNetCFG1d, UNetCondAdapter, UNetNCCA1d,
    XUNet1d, create_unet_from_config)

KEY = jax.random.PRNGKey(0)


def test_unet1d_full_conditioning_surface():
    """patching + per-layer context channels + context features +
    cross-attention embedding with mask, all at once."""
    x = jax.random.normal(KEY, (2, 4, 64))
    t = jnp.full((2,), 0.5)
    m = UNet1d(in_channels=4, channels=16, multipliers=(1, 2, 2),
               factors=(2, 2), num_blocks=(1, 1), attentions=(0, 1, 1),
               patch_size=2, context_features=8,
               context_channels=(3, 0, 5),
               context_embedding_features=12)
    feats = jax.random.normal(KEY, (2, 8))
    # layer-0 channels ride at input resolution (before patching); layer-2
    # channels at that layer's resolution: 64 / patch 2 / factors (2, 2)
    chans = [jax.random.normal(KEY, (2, 3, 64)),
             jax.random.normal(KEY, (2, 5, 8))]
    emb = jax.random.normal(KEY, (2, 6, 12))
    mask = jnp.ones((2, 6), bool)
    kw = dict(features=feats, channels_list=chans, embedding=emb,
              embedding_mask=mask)
    p = m.init(KEY, x, t, **kw)
    out = m.apply(p, x, t, **kw)
    assert out.shape == (2, 4, 64)
    assert bool(jnp.isfinite(out).all())
    # conditioning is live: different context channels change the output
    chans2 = [c + 1.0 for c in chans]
    out2 = m.apply(p, x, t, features=feats, channels_list=chans2,
                   embedding=emb, embedding_mask=mask)
    assert float(jnp.abs(out - out2).max()) > 1e-6


@pytest.mark.slow
def test_unet_cfg_guidance_semantics():
    x = jax.random.normal(KEY, (2, 4, 64))
    t = jnp.full((2,), 0.5)
    emb = jax.random.normal(KEY, (2, 6, 12))
    mask = jnp.ones((2, 6), bool)
    m = UNetCFG1d(context_embedding_max_length=8,
                  context_embedding_features=12, in_channels=4,
                  channels=16, multipliers=(1, 2, 2), factors=(2, 2),
                  num_blocks=(1, 1), attentions=(1, 1, 1))
    p = m.init(KEY, x, t, embedding=emb, embedding_mask=mask)
    # at init the attention/FF output projections are zero-initialised so
    # conditioned and null branches coincide; jitter params so the
    # context actually influences the output
    p = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(KEY, a.shape, a.dtype), p)
    o1 = m.apply(p, x, t, embedding=emb, embedding_mask=mask)
    # guidance changes the output; rescale keeps it finite
    o2 = m.apply(p, x, t, embedding=emb, embedding_mask=mask,
                 embedding_scale=3.0)
    o3 = m.apply(p, x, t, embedding=emb, embedding_mask=mask,
                 embedding_scale=3.0, rescale_cfg=True)
    assert o1.shape == o2.shape == o3.shape == (2, 4, 64)
    assert float(jnp.abs(o1 - o2).max()) > 1e-6
    assert bool(jnp.isfinite(o3).all())
    # mask_proba=1 must equal running on the fixed (null) embedding
    o_dropped = m.apply(p, x, t, embedding=emb, embedding_mask=mask,
                        embedding_mask_proba=1.0,
                        cfg_key=jax.random.PRNGKey(1))
    fixed = p["params"]["fixed_embedding"]["embedding"][None, :6]
    o_null = m.apply(p, x, t,
                     embedding=jnp.broadcast_to(fixed, emb.shape),
                     embedding_mask=mask)
    np.testing.assert_allclose(np.asarray(o_dropped), np.asarray(o_null),
                               rtol=1e-4, atol=1e-5)
    # negative embedding path
    o_neg = m.apply(p, x, t, embedding=emb, embedding_mask=mask,
                    embedding_scale=2.0, negative_embedding=0 * emb,
                    negative_embedding_mask=mask)
    assert bool(jnp.isfinite(o_neg).all())
    # use_xattn_time variant: time token appended, shapes still ok
    mt = UNetCFG1d(context_embedding_max_length=8,
                   context_embedding_features=12, in_channels=4,
                   channels=16, multipliers=(1, 2), factors=(2,),
                   num_blocks=(1,), attentions=(1, 1),
                   use_xattn_time=True)
    pt = mt.init(KEY, x, t, embedding=emb, embedding_mask=mask)
    ot = mt.apply(pt, x, t, embedding=emb, embedding_mask=mask,
                  embedding_scale=2.0)
    assert ot.shape == (2, 4, 64) and bool(jnp.isfinite(ot).all())


def test_unet_ncca_and_number_embedder():
    x = jax.random.normal(KEY, (2, 4, 64))
    t = jnp.full((2,), 0.5)
    m = UNetNCCA1d(context_features=16, in_channels=4, channels=16,
                   multipliers=(1, 2), factors=(2,), num_blocks=(1,),
                   attentions=(0, 0), context_channels=(2,))
    ch = [jax.random.normal(KEY, (2, 2, 64))]
    p = m.init(KEY, x, t, channels_list=ch, channels_scale=0.5,
               noise_key=jax.random.PRNGKey(2))
    o = m.apply(p, x, t, channels_list=ch, channels_scale=0.5,
                noise_key=jax.random.PRNGKey(2))
    assert o.shape == (2, 4, 64) and bool(jnp.isfinite(o).all())

    ne = NumberEmbedder(features=32)
    pe = ne.init(KEY, jnp.array([[0.5, 1.0]]))
    oe = ne.apply(pe, jnp.array([[0.5, 1.0]]))
    assert oe.shape == (1, 2, 32)


@pytest.mark.slow
def test_xunet_dispatch_and_factory():
    assert isinstance(XUNet1d("base", in_channels=2), UNet1d)
    assert isinstance(
        XUNet1d("cfg", context_embedding_max_length=4,
                context_embedding_features=8), UNetCFG1d)
    assert isinstance(XUNet1d("ncca", context_features=8), UNetNCCA1d)
    with pytest.raises(ValueError):
        XUNet1d("nope")

    # reference-style JSON config (models/diffusion.py:645-648)
    cfg = {"in_channels": 2, "channels": 16, "multipliers": [1, 2, 2],
           "factors": [2, 2], "num_blocks": [1, 1],
           "attentions": [0, 1, 1], "context_embedding_features": 12,
           "context_embedding_max_length": 8}
    wrap = create_unet_from_config("adp_cfg_1d", cfg)
    assert isinstance(wrap, UNetCondAdapter)
    x = jax.random.normal(KEY, (1, 2, 32))
    t = jnp.full((1,), 0.3)
    emb = jax.random.normal(KEY, (1, 4, 12))
    p = wrap.init(KEY, x, t, cross_attn_cond=emb)
    out = wrap.apply(p, x, t, cross_attn_cond=emb, cfg_scale=2.0)
    assert out.shape == (1, 2, 32)
    # gradient flow through the adapter
    g = jax.grad(lambda pp: jnp.sum(wrap.apply(
        pp, x, t, cross_attn_cond=emb) ** 2))(p)
    gnorm = sum(float(jnp.sum(l ** 2)) for l in jax.tree.leaves(g))
    assert gnorm > 0

    uncond = create_unet_from_config("adp_1d", {
        "in_channels": 2, "channels": 16, "multipliers": [1, 2],
        "factors": [2], "num_blocks": [1], "attentions": [0, 0]})
    p2 = uncond.init(KEY, x, t)
    assert uncond.apply(p2, x, t).shape == (1, 2, 32)
