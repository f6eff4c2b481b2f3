"""create_model_from_config must dispatch ALL five reference model types
(reference: src/stable_audio_tools/models/factory.py:3-24). The
autoencoder / diffusion_cond / diffusion_uncond paths are covered
elsewhere; these tests cover the diffusion_autoencoder and lm paths
end-to-end from reference-schema JSON configs."""
import jax
import jax.numpy as jnp
import pytest

from ditsep_tpu.models.factory import create_model_from_config

KEY = jax.random.PRNGKey(0)


def test_diffusion_autoencoder_from_config():
    cfg = {
        "model_type": "diffusion_autoencoder",
        "sample_rate": 8000,
        "model": {
            "encoder": {
                "type": "oobleck",
                "config": {
                    "in_channels": 1,
                    "channels": 8,
                    "latent_dim": 4,
                    "c_mults": [1, 2],
                    "strides": [2, 4],
                },
            },
            "diffusion": {
                "type": "dit",
                "config": {
                    "io_channels": 1,
                    "embed_dim": 32,
                    "depth": 1,
                    "num_heads": 2,
                },
            },
            "latent_dim": 4,
            "downsampling_ratio": 8,
            "io_channels": 1,
        },
    }
    diffae = create_model_from_config(cfg)
    audio = jax.random.normal(KEY, (1, 1, 64))
    enc_params = diffae.encoder.init(KEY, audio)
    latents = diffae.encode(enc_params, audio)
    assert latents.shape == (1, 4, 8)  # (B, latent_dim, T/hop)

    noised = jax.random.normal(KEY, (1, 1, 64))
    t = jnp.full((1,), 0.5)
    diff_params = diffae.diffusion.init(
        KEY, jnp.concatenate([noised, diffae._cond(latents, 64)], axis=1), t)
    v = diffae.diffusion_input(diff_params, noised, t, latents)
    assert v.shape == (1, 1, 64)

    rec = diffae.decode(diff_params, KEY, latents, steps=2)
    assert rec.shape == (1, 1, 64)
    assert bool(jnp.isfinite(rec).all())


def test_audio_lm_from_config():
    from ditsep_tpu.models.lm import DelayPattern, lm_generate, lm_loss

    cfg = {
        "model_type": "lm",
        "sample_rate": 8000,
        "model": {
            "lm": {
                "type": "continuous_transformer",
                "codebook_pattern": "delay",
                "config": {
                    "n_quantizers": 2,
                    "codebook_size": 16,
                    "embed_dim": 32,
                    "depth": 1,
                    "num_heads": 2,
                },
            },
        },
    }
    lm, pattern = create_model_from_config(cfg)
    assert isinstance(pattern, DelayPattern)
    assert lm.n_quantizers == 2 and lm.codebook_size == 16

    tokens = jax.random.randint(KEY, (1, 2, 6), 0, 16)
    params = lm.init(KEY, tokens)
    loss = float(lm_loss(lm, params, tokens, pattern=pattern))
    assert jnp.isfinite(loss)
    gen = lm_generate(lm, params, KEY, batch=1, length=4, pattern=pattern)
    assert gen.shape == (1, 2, 4)
    assert int(gen.min()) >= 0 and int(gen.max()) < 16


def test_audio_lm_from_config_pretransform_bottleneck():
    """n_quantizers/codebook_size may come from a discrete pretransform
    bottleneck config, like the reference derives them from the
    pretransform (lm.py:490-496)."""
    cfg = {
        "model_type": "lm",
        "sample_rate": 8000,
        "model": {
            "pretransform": {
                "type": "autoencoder",
                "config": {
                    "bottleneck": {
                        "type": "rvq",
                        "config": {"num_quantizers": 3,
                                   "codebook_size": 32},
                    },
                },
            },
            "lm": {
                "type": "continuous_transformer",
                "codebook_pattern": "parallel",
                "config": {"embed_dim": 32, "depth": 1, "num_heads": 2},
            },
        },
    }
    lm, pattern = create_model_from_config(cfg)
    assert lm.n_quantizers == 3 and lm.codebook_size == 32
    assert type(pattern).__name__ == "ParallelPattern"


def test_diffusion_cond_include_pretransform():
    """diffusion_cond configs carry a latent pretransform; the factory
    builds it on request (reference: models/diffusion.py
    create_diffusion_cond_from_config attaches model.pretransform).
    Uses the reference's own ditsep.json schema with the autoencoder
    shrunk to test size."""
    import copy
    import json

    from ditsep_tpu.models.factory import create_diffusion_cond_from_config
    from ditsep_tpu.models.pretransforms import AutoencoderPretransform

    path = ("/root/reference/src/stable_audio_tools/configs/model_configs/"
            "separation_diffusion/ditsep.json")
    with open(path) as f:
        cfg = json.load(f)
    cfg = copy.deepcopy(cfg)
    # keep the schema, shrink the net (full oobleck compiles for minutes
    # on the 1-vCPU test host)
    pre_c = cfg["model"]["pretransform"]["config"]
    for side, dim_key in (("encoder", "latent_dim"), ("decoder", "latent_dim")):
        c = pre_c[side]["config"]
        c["channels"] = 4
        c["c_mults"] = [1, 2]
        c["strides"] = [2, 2]
    pre_c["encoder"]["config"]["latent_dim"] = 8
    pre_c["decoder"]["config"]["latent_dim"] = 4
    pre_c["latent_dim"] = 4
    dit, routing, cond_cfgs, pre = create_diffusion_cond_from_config(
        cfg, include_pretransform=True)
    assert isinstance(pre, AutoencoderPretransform)
    assert pre.downsampling_ratio == 4
    # the conditioning ids of the shipped config survive the round trip
    assert routing.input_concat_ids or routing.global_cond_ids \
        or routing.cross_attn_cond_ids or cond_cfgs
    x = jnp.ones((1, 1, 32))
    z = pre.encode(x)
    assert z.shape == (1, 4, 8)
    assert pre.decode(z).shape == (1, 1, 32)

    # a config with no pretransform returns None for it
    cfg2 = copy.deepcopy(cfg)
    del cfg2["model"]["pretransform"]
    *_, none_pre = create_diffusion_cond_from_config(
        cfg2, include_pretransform=True)
    assert none_pre is None


def test_dance_diffusion_dau1d():
    """model_type diffusion_uncond with the uncond JSON schema builds the
    dance-diffusion DAU1d net (reference: models/diffusion.py:391-505,
    601-605; configs/model_configs/dance_diffusion/*.json)."""
    import json

    import numpy as np

    cfg = {
        "model_type": "diffusion_uncond",
        "sample_rate": 8000,
        "sample_size": 64,
        "model": {"type": "DAU1d",
                  "config": {"io_channels": 2, "depth": 3,
                             "n_attn_layers": 1,
                             "channels": [8, 8, 16],
                             "strides": [2, 2]}},
        "training": {"learning_rate": 1e-4},
    }
    net = create_model_from_config(cfg)
    x = jax.random.normal(KEY, (2, 2, 64))
    t = jnp.full((2,), 0.5)
    params = net.init(KEY, x, t)
    y = net.apply(params, x, t)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())
    # attention params exist at the deepest level only (attn_layer = 2)
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("attn" in jax.tree_util.keystr(p) for p, _ in flat)
    # halving matches the reference's post-init param scaling
    from ditsep_tpu.models.dau1d import scale_params
    half = scale_params(params, 0.5)
    y2 = net.apply(half, x, t)
    assert bool(jnp.isfinite(y2).all())

    # the real dance_diffusion_base.json builds at full size (eval_shape:
    # zero FLOPs) and preserves the audio shape
    path = ("/root/reference/src/stable_audio_tools/configs/"
            "model_configs/dance_diffusion/dance_diffusion_base.json")
    full_cfg = json.load(open(path))
    full = create_model_from_config(full_cfg)
    xs = jax.ShapeDtypeStruct((1, 2, full_cfg["sample_size"]), jnp.float32)
    ts = jax.ShapeDtypeStruct((1,), jnp.float32)
    var_shapes = jax.eval_shape(full.init, KEY, xs, ts)
    out = jax.eval_shape(
        lambda v, x, t: full.apply(v, x, t), var_shapes, xs, ts)
    assert tuple(out.shape) == (1, 2, full_cfg["sample_size"])
    n_params = sum(int(np.prod(l.shape)) for l in
                   jax.tree_util.tree_leaves(var_shapes))
    assert n_params > 50_000_000  # the 14-level 512-channel stack is real


def test_dau1d_cond_noise_aug():
    """cond path: linear resample to T + noise augmentation embedding
    (reference: diffusion.py:477-500)."""
    from ditsep_tpu.models.dau1d import DiffusionAttnUnet1D

    net = DiffusionAttnUnet1D(io_channels=1, depth=2, n_attn_layers=0,
                              channels=(4, 8), strides=(2,),
                              cond_dim=3, cond_noise_aug=True)
    x = jax.random.normal(KEY, (2, 1, 32))
    t = jnp.full((2,), 0.5)
    cond = jax.random.normal(KEY, (2, 3, 8))  # resampled 8 -> 32
    params = net.init(KEY, x, t, cond=cond, key=KEY)
    y = net.apply(params, x, t, cond=cond, cond_aug_scale=0.1, key=KEY)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_txt2audio_configs_build():
    """The shipped stable-audio 1.0/2.0 txt2audio configs resolve through
    the factory: adp UNet / DiT nets, prompt+seconds conditioning ids,
    CLAP/number conditioner configs (reference:
    configs/model_configs/txt2audio/*.json)."""
    import json

    for name, net_kind in (("stable_audio_1_0", "UNetCondAdapter"),
                           ("stable_audio_2_0", "DiffusionTransformer")):
        path = ("/root/reference/src/stable_audio_tools/configs/"
                f"model_configs/txt2audio/{name}.json")
        cfg = json.load(open(path))
        net, routing, conds = create_model_from_config(cfg)
        assert type(net).__name__ == net_kind
        assert routing.cross_attn_cond_ids == (
            "prompt", "seconds_start", "seconds_total")
        kinds = [c.get("type") for c in conds]
        assert "clap_text" in kinds


def test_dau1d_numerical_parity_vs_reference_torch():
    """Our DAU1d reproduces the reference torch DiffusionAttnUnet1D with
    imported weights at float32 bit level (reference:
    models/diffusion.py:391-505, blocks.py:14-160). The reference module
    itself cannot be constructed as shipped — diffusion.py passes
    use_snake to a blocks.ResConvBlock that does not accept it — so the
    oracle patches that kwarg away (use_snake=False is a no-op) and
    stubs the unrelated imports its module chain drags in."""
    import os
    import sys
    import types

    import numpy as np

    ref_src = "/root/reference/src"
    if not os.path.isdir(ref_src):
        pytest.skip("reference checkout not available")

    class _AnyAttr(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return type(name, (), {})

    stubs = ("einops_exts", "torchaudio", "torchaudio.transforms",
             "pytorch_lightning", "pytorch_lightning.loggers", "wandb",
             "k_diffusion")
    saved = {n: sys.modules.get(n) for n in stubs}
    sys.path.insert(0, ref_src)
    try:
        for n in stubs:
            if saved[n] is None:
                sys.modules[n] = _AnyAttr(n)
        import torch
        from stable_audio_tools.models import diffusion as ref_diff
        from stable_audio_tools.models.blocks import ResConvBlock as Raw
    except ImportError:
        pytest.skip("torch reference unavailable")
    finally:
        sys.path.remove(ref_src)
        for n, v in saved.items():
            if v is None:
                sys.modules.pop(n, None)

    orig_rcb = ref_diff.ResConvBlock
    ref_diff.ResConvBlock = lambda *a, use_snake=False, **k: Raw(*a, **k)
    try:
        torch.manual_seed(0)
        tm = ref_diff.DiffusionAttnUnet1D(
            io_channels=2, depth=3, n_attn_layers=2,
            channels=[32, 32, 64], strides=[2, 2]).eval()
    finally:
        ref_diff.ResConvBlock = orig_rcb

    from ditsep_tpu.models.dau1d import DiffusionAttnUnet1D
    from ditsep_tpu.models.torch_import import import_dau1d_params

    ours = DiffusionAttnUnet1D(io_channels=2, depth=3, n_attn_layers=2,
                               channels=(32, 32, 64), strides=(2, 2))
    params = import_dau1d_params(tm.state_dict(), depth=3,
                                 n_attn_layers=2)

    x = np.random.default_rng(0).normal(size=(2, 2, 64)).astype(np.float32)
    t = np.array([0.3, 0.7], np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    out = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(out, ref_out, atol=2e-6, rtol=1e-5)
