"""create_trainer_from_config must map every reference model_type's
training block onto a working trainer (reference:
src/stable_audio_tools/training/factory.py:5-158), and the inpaint
training path must draw valid static-shape masks (reference:
training/diffusion.py:848-895)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ditsep_tpu.models.factory import create_model_from_config
from ditsep_tpu.training.factory import create_trainer_from_config

KEY = jax.random.PRNGKey(0)


def _tiny_oobleck_model_block():
    return {
        "encoder": {"type": "oobleck",
                    "config": {"in_channels": 1, "channels": 4,
                               "latent_dim": 8, "c_mults": [1, 2],
                               "strides": [2, 2]}},
        "decoder": {"type": "oobleck",
                    "config": {"out_channels": 1, "channels": 4,
                               "latent_dim": 4, "c_mults": [1, 2],
                               "strides": [2, 2]}},
        "bottleneck": {"type": "vae"},
        "latent_dim": 4,
    }


def test_autoencoder_trainer_from_config():
    cfg = {
        "model_type": "autoencoder",
        "sample_rate": 8000,
        "model": _tiny_oobleck_model_block(),
        "training": {
            "learning_rate": 1.5e-4,
            "warmup_steps": 3,
            "loss_configs": {
                "spectral": {"weights": {"mrstft": 1.0}},
                "bottleneck": {"weights": {"kl": 1e-4}},
                "discriminator": {
                    "type": "encodec",
                    "config": {"filters": 4, "n_ffts": [128],
                               "hop_lengths": [32], "win_lengths": [128]},
                    "weights": {"adversarial": 0.1,
                                "feature_matching": 5.0},
                },
            },
        },
    }
    model = create_model_from_config(cfg)
    tr = create_trainer_from_config(cfg, model)
    assert tr.lr == 1.5e-4 and tr.warmup_steps == 3
    assert tr.disc is not None
    assert tr.loss_cfg.kl == 1e-4 and tr.loss_cfg.adversarial == 0.1

    reals = jax.random.normal(KEY, (2, 1, 256)) * 0.3
    vae_params = model.init(KEY, reals)
    disc_params = tr.disc.init(KEY, reals)
    state = tr.init_state(vae_params, disc_params)
    state, m = tr.gen_step(state, KEY, reals, warmed_up=False)
    assert np.isfinite(float(m["train/loss"]))


def test_lm_trainer_from_config_learns():
    cfg = {
        "model_type": "lm",
        "sample_rate": 8000,
        "model": {
            "lm": {"type": "continuous_transformer",
                   "codebook_pattern": "delay",
                   "config": {"n_quantizers": 2, "codebook_size": 16,
                              "embed_dim": 32, "depth": 1,
                              "num_heads": 2}},
        },
        "training": {
            "learning_rate": 5e-3,
            "optimizer_configs": {
                "lm": {"optimizer": {"type": "AdamW",
                                     "config": {"lr": 5e-3,
                                                "betas": [0.9, 0.95],
                                                "weight_decay": 0.1}}}},
        },
    }
    model = create_model_from_config(cfg)
    tr = create_trainer_from_config(cfg, model)
    assert tr.lr == 5e-3 and tr.b1 == 0.9 and tr.b2 == 0.95
    tokens = jax.random.randint(KEY, (2, 2, 8), 0, 16)
    params = tr.model.init(KEY, tokens)
    state = tr.init_state(params)
    step = jax.jit(tr.train_step)
    losses = []
    for _ in range(8):
        state, m = step(state, tokens)
        losses.append(float(m["train/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # memorizes a fixed batch


def test_inpaint_trainer_from_config():
    cfg = {
        "model_type": "diffusion_cond_inpaint",
        "sample_rate": 8000,
        "model": {
            "diffusion": {
                "type": "dit",
                "io_channels": 2,
                "input_concat_ids": ["inpaint_mask",
                                     "inpaint_masked_input"],
                "config": {"io_channels": 2, "embed_dim": 32,
                           "depth": 1, "num_heads": 2},
            },
        },
        "training": {"learning_rate": 1e-4, "max_mask_segments": 4,
                     "timestep_sampler": "uniform"},
    }
    model = create_model_from_config(cfg)
    tr = create_trainer_from_config(cfg, model)
    assert tr.inpaint and tr.max_mask_segments == 4
    x0 = jax.random.normal(KEY, (2, 2, 16))
    # the DiT sees x (2ch) + concat cond (mask 1ch + masked input 2ch)
    params = tr.model.init(
        KEY, x0, jnp.full((2,), 0.5),
        input_concat_cond=jnp.zeros((2, 3, 16)))
    loss = jax.jit(tr.loss)(params, KEY, x0)
    assert np.isfinite(float(loss))


def test_random_inpaint_mask_static_shapes():
    from ditsep_tpu.training.diffusion import random_inpaint_mask

    x = jnp.ones((16, 2, 64))
    masked, mask = jax.jit(
        lambda k, x: random_inpaint_mask(k, x, max_mask_segments=5)
    )(KEY, x)
    assert mask.shape == (16, 1, 64) and masked.shape == x.shape
    vals = np.unique(np.asarray(mask))
    assert set(vals.tolist()) <= {0.0, 1.0}
    np.testing.assert_allclose(np.asarray(masked),
                               np.asarray(x * mask))
    # all three mask types appear across a batch of 16
    per_sample = np.asarray(mask[:, 0, :])
    has_full = (per_sample.sum(-1) == 0).any()
    is_causal = np.array([
        (row[: int(row.sum())].all() and not row[int(row.sum()):].any())
        and 0 < row.sum() for row in per_sample])
    assert has_full or is_causal.any()

    # padding is respected: with real_len=32, segment/causal draws stay
    # inside the unpadded region (mask over padding may be 0 only for
    # full/causal types, never a mid-padding segment start)
    pad = jnp.concatenate([jnp.ones((4, 32)), jnp.zeros((4, 32))], -1)
    _, m2 = random_inpaint_mask(jax.random.PRNGKey(3), x[:4],
                                max_mask_segments=5, padding_mask=pad)
    assert m2.shape == (4, 1, 64)


def test_unknown_model_type_raises():
    import pytest

    with pytest.raises(NotImplementedError):
        create_trainer_from_config(
            {"model_type": "nope", "training": {}}, None)


def test_autoencoder_trainer_from_reference_json():
    """The reference's own oobleck_finetune.json training block (with
    optimizer_configs + InverseLR schedulers) builds a working trainer
    (reference: configs/model_configs/autoencoders/oobleck_finetune.json,
    training/utils.py:79-115)."""
    import copy
    import json

    path = ("/root/reference/src/stable_audio_tools/configs/"
            "model_configs/autoencoders/oobleck_finetune.json")
    with open(path) as f:
        cfg = copy.deepcopy(json.load(f))
    # shrink the nets to test size; keep the training block verbatim
    for side in ("encoder", "decoder"):
        c = cfg["model"][side]["config"]
        c["channels"] = 4
        c["c_mults"] = [1, 2]
        c["strides"] = [2, 2]
        c["latent_dim"] = 8 if side == "encoder" else 4
    cfg["model"]["latent_dim"] = 4
    dcfg = cfg["training"]["loss_configs"]["discriminator"]["config"]
    dcfg.update(filters=4, n_ffts=[128], hop_lengths=[32],
                win_lengths=[128])

    model = create_model_from_config(cfg)
    tr = create_trainer_from_config(cfg, model)
    assert tr.vae_tx is not None and tr.disc_tx is not None
    assert tr.lr == cfg["training"]["learning_rate"]

    reals = jax.random.normal(KEY, (2, 1, 256)) * 0.3
    state = tr.init_state(model.init(KEY, reals),
                          tr.disc.init(KEY, reals))
    state, m = tr.gen_step(state, KEY, reals, warmed_up=True)
    assert np.isfinite(float(m["train/loss"]))
    state, md = tr.disc_step(state, KEY, reals)
    assert np.isfinite(float(md["train/discriminator_loss"]))


def test_optimizer_factory_schedules():
    import optax

    from ditsep_tpu.training.schedules import (
        create_optimizer_from_config, create_schedule_from_config,
        inverse_lr_schedule,
    )

    s = create_schedule_from_config(
        {"type": "InverseLR",
         "config": {"inv_gamma": 100, "power": 0.5, "warmup": 0.0}}, 1e-3)
    ref = inverse_lr_schedule(1e-3, inv_gamma=100, power=0.5, warmup=0.0)
    assert float(s(0)) == float(ref(0)) and float(s(100)) == float(ref(100))
    assert float(s(100)) < float(s(0))

    e = create_schedule_from_config(
        {"type": "ExponentialLR", "config": {"gamma": 0.9}}, 1.0)
    np.testing.assert_allclose(float(e(2)), 0.81, rtol=1e-6)

    p = {"w": jnp.ones((3,))}
    g = {"w": jnp.ones((3,))}
    for kind in ("AdamW", "Adam", "SGD", "RMSprop"):
        tx = create_optimizer_from_config(
            {"type": kind, "config": {"lr": 1e-3}})
        st = tx.init(p)
        u, _ = tx.update(g, st, p)
        assert np.isfinite(float(optax.global_norm(u)))
    import pytest
    with pytest.raises(NotImplementedError):
        create_optimizer_from_config({"type": "LBFGS", "config": {}})


def test_demo_callback_factory(tmp_path):
    """create_demo_callback_from_config dispatches per model_type and the
    callbacks run end to end into the metrics logger
    (reference: training/factory.py:160-245)."""
    from ditsep_tpu.training.demo import (
        AutoencoderDemoCallback, DiffusionDemoCallback, LMDemoCallback,
        create_demo_callback_from_config,
    )
    from ditsep_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(str(tmp_path), backend="none")

    # autoencoder
    ae_cfg = {"model_type": "autoencoder", "sample_rate": 8000,
              "model": _tiny_oobleck_model_block(),
              "training": {"demo": {"demo_every": 5}}}
    cb = create_demo_callback_from_config(ae_cfg)
    assert isinstance(cb, AutoencoderDemoCallback)
    assert cb.due(0) and cb.due(5) and not cb.due(3)
    vae = create_model_from_config(ae_cfg)
    reals = jax.random.normal(KEY, (2, 1, 64)) * 0.3
    params = vae.init(KEY, reals)
    cb(logger, 0, vae, params, reals)

    # diffusion (uncond flavor: no conditioning inputs)
    d_cfg = {"model_type": "diffusion_uncond", "sample_rate": 8000,
             "sample_size": 32,
             "model": {"diffusion": {"type": "dit", "io_channels": 2,
                                     "config": {"io_channels": 2,
                                                "embed_dim": 16,
                                                "depth": 1,
                                                "num_heads": 2}}},
             "training": {"demo": {"demo_every": 5, "demo_steps": 3,
                                   "num_demos": 2,
                                   "demo_cfg_scales": [1.0]}}}
    dcb = create_demo_callback_from_config(d_cfg)
    assert isinstance(dcb, DiffusionDemoCallback)
    dit = create_model_from_config(d_cfg)
    x = jnp.zeros((2, 2, 32))
    dparams = dit.init(KEY, x, jnp.full((2,), 0.5))
    dcb(logger, 5, dit, dparams, KEY)

    # lm
    lm_cfg = {"model_type": "lm", "sample_rate": 8000, "sample_size": 32,
              "model": {"lm": {"type": "continuous_transformer",
                               "codebook_pattern": "delay",
                               "config": {"n_quantizers": 2,
                                          "codebook_size": 8,
                                          "embed_dim": 16, "depth": 1,
                                          "num_heads": 2}}},
              "training": {"demo": {"demo_every": 5, "num_demos": 1}}}
    lm, pattern = create_model_from_config(lm_cfg)
    lcb = create_demo_callback_from_config(lm_cfg, pattern=pattern)
    assert isinstance(lcb, LMDemoCallback)
    tokens = jax.random.randint(KEY, (1, 2, 4), 0, 8)
    lparams = lm.init(KEY, tokens)
    lcb(logger, 5, lm, lparams, KEY, length=4)

    # every scalar/audio write ends in the JSONL / tb sinks without error
    assert (tmp_path / "metrics.jsonl").exists()


@pytest.mark.slow
def test_train_stable_cli_end_to_end(tmp_path):
    """The generic JSON-config training entry composes
    create_model_from_config -> create_trainer_from_config ->
    create_demo_callback_from_config and trains each supported
    model_type a few steps (the reference trains these configs via
    stable-audio-tools' upstream train.py over the same factories)."""
    import json

    from ditsep_tpu.cli.train_stable import main

    mc = tmp_path / "dau.json"
    mc.write_text(json.dumps({
        "model_type": "diffusion_uncond", "sample_rate": 8000,
        "sample_size": 64,
        "model": {"type": "DAU1d",
                  "config": {"io_channels": 2, "depth": 2,
                             "n_attn_layers": 1, "channels": [4, 8],
                             "strides": [2]}},
        "training": {"learning_rate": 1e-3,
                     "demo": {"demo_every": 10, "demo_steps": 2,
                              "num_demos": 1}}}))
    m = main(["--model-config", str(mc), "--workdir",
              str(tmp_path / "run"), "--batch-size", "2",
              "--max-steps", "12", "--cpu"])
    assert np.isfinite(m["train/loss"])
    assert (tmp_path / "run" / "metrics.jsonl").exists()

    lc = tmp_path / "lm.json"
    lc.write_text(json.dumps({
        "model_type": "lm", "sample_rate": 8000, "sample_size": 16384,
        "model": {"lm": {"type": "continuous_transformer",
                         "codebook_pattern": "delay",
                         "config": {"n_quantizers": 2,
                                    "codebook_size": 16,
                                    "embed_dim": 32, "depth": 1,
                                    "num_heads": 2}}},
        "training": {"learning_rate": 3e-3}}))
    m2 = main(["--model-config", str(lc), "--workdir",
               str(tmp_path / "run2"), "--batch-size", "2",
               "--max-steps", "8", "--cpu"])
    assert np.isfinite(m2["train/loss"])

    import pytest
    bad = tmp_path / "cond.json"
    bad.write_text(json.dumps({
        "model_type": "diffusion_cond", "sample_rate": 8000,
        "model": {"diffusion": {"type": "dit",
                                "config": {"io_channels": 2,
                                           "embed_dim": 16,
                                           "depth": 1, "num_heads": 2}}},
        "training": {"learning_rate": 1e-4}}))
    with pytest.raises(SystemExit):
        main(["--model-config", str(bad), "--workdir",
              str(tmp_path / "run3"), "--cpu"])


def test_diffae_trainer_joint_training():
    """diffusion_autoencoder training conditions the diffusion decoder
    on the encoder latents and trains BOTH (reference:
    DiffusionAutoencoderTrainingWrapper, factory.py:119-136)."""
    import optax

    cfg = {
        "model_type": "diffusion_autoencoder",
        "sample_rate": 8000,
        "model": {
            "encoder": {"type": "oobleck",
                        "config": {"in_channels": 1, "channels": 4,
                                   "latent_dim": 4, "c_mults": [1, 2],
                                   "strides": [2, 2]}},
            "diffusion": {"type": "dit",
                          "config": {"io_channels": 1, "embed_dim": 16,
                                     "depth": 1, "num_heads": 2}},
            "latent_dim": 4,
            "downsampling_ratio": 4,
            "io_channels": 1,
        },
        "training": {"learning_rate": 1e-3},
    }
    diffae = create_model_from_config(cfg)
    tr = create_trainer_from_config(cfg, diffae)
    x0 = jax.random.normal(KEY, (2, 1, 32)) * 0.3
    enc_p = diffae.encoder.init(KEY, x0)
    lat = diffae.encode(enc_p, x0)
    assert lat.shape == (2, 4, 8)
    diff_p = diffae.diffusion.init(
        KEY, jnp.concatenate([x0, jnp.zeros((2, 4, 32))], axis=1),
        jnp.full((2,), 0.5))
    state = tr.init_state({"encoder": enc_p, "diffusion": diff_p})
    step = jax.jit(tr.train_step)
    state, m = step(state, KEY, x0)
    assert np.isfinite(float(m["train/loss"]))
    # both halves receive gradients
    g_enc = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["encoder"], enc_p)
    assert max(jax.tree_util.tree_leaves(g_enc)) > 0


def test_prior_trainer_mono_stereo_conditioning():
    """diffusion_prior training conditions on the dual-mono source via
    the 'source' id (reference: DiffusionPriorTrainingWrapper
    :1524-1572)."""
    cfg = {
        "model_type": "diffusion_prior",
        "sample_rate": 8000,
        "model": {
            "diffusion": {
                "type": "dit",
                "io_channels": 2,
                "input_concat_ids": ["source"],
                "config": {"io_channels": 2, "embed_dim": 16,
                           "depth": 1, "num_heads": 2},
            },
        },
        "training": {"learning_rate": 1e-4, "prior_type": "mono_stereo"},
    }
    model = create_model_from_config(cfg)
    tr = create_trainer_from_config(cfg, model)
    assert tr.mono_stereo_prior
    x0 = jax.random.normal(KEY, (2, 2, 16))
    params = tr.model.init(KEY, x0, jnp.full((2,), 0.5),
                           input_concat_cond=jnp.zeros((2, 2, 16)))
    loss = jax.jit(tr.loss)(params, KEY, x0)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_train_stable_resume(tmp_path):
    """--resume restores the rolling latest checkpoint and continues
    from its step."""
    import json

    from ditsep_tpu.cli.train_stable import main

    lc = tmp_path / "lm.json"
    lc.write_text(json.dumps({
        "model_type": "lm", "sample_rate": 8000, "sample_size": 16384,
        "model": {"lm": {"type": "continuous_transformer",
                         "codebook_pattern": "delay",
                         "config": {"n_quantizers": 2,
                                    "codebook_size": 16,
                                    "embed_dim": 32, "depth": 1,
                                    "num_heads": 2}}},
        "training": {"learning_rate": 3e-3}}))
    wd = str(tmp_path / "run")
    main(["--model-config", str(lc), "--workdir", wd, "--batch-size",
          "2", "--max-steps", "8", "--ckpt-every", "4", "--cpu"])
    m = main(["--model-config", str(lc), "--workdir", wd,
              "--batch-size", "2", "--max-steps", "12",
              "--ckpt-every", "4", "--cpu", "--resume"])
    assert np.isfinite(m["train/loss"])
    # deterministic fold_in keys: resumed training matches a straight
    # 12-step run batch-for-batch, so the loss keeps decreasing
    fresh = main(["--model-config", str(lc), "--workdir",
                  str(tmp_path / "run2"), "--batch-size", "2",
                  "--max-steps", "12", "--cpu"])
    np.testing.assert_allclose(m["train/loss"], fresh["train/loss"],
                               rtol=1e-4)


@pytest.mark.slow
def test_latent_mask_and_teacher_distillation(tmp_path):
    """latent_mask_ratio zeroes random latents before decode; a teacher
    model (loaded from an npz checkpoint) adds the four distillation
    terms (reference: autoencoders.py:171-179,404-415,
    factory.py:29-43)."""
    import numpy as np

    from ditsep_tpu.utils.checkpoint import save_params_npz

    cfg = {
        "model_type": "autoencoder",
        "sample_rate": 8000,
        "model": _tiny_oobleck_model_block(),
        "training": {
            "learning_rate": 1e-3,
            "latent_mask_ratio": 0.3,
        },
    }
    model = create_model_from_config(cfg)
    reals = jax.random.normal(KEY, (2, 1, 128)) * 0.3
    teacher_params = model.init(KEY, reals)
    ckpt = tmp_path / "teacher.npz"
    save_params_npz(str(ckpt), teacher_params["params"])

    cfg["training"]["teacher_model"] = {
        "model_type": "autoencoder", "sample_rate": 8000,
        "model": _tiny_oobleck_model_block()}
    cfg["training"]["teacher_model_ckpt"] = str(ckpt)
    tr = create_trainer_from_config(cfg, model)
    assert tr.latent_mask_ratio == 0.3 and tr.teacher_vae is not None

    state = tr.init_state(model.init(jax.random.PRNGKey(1), reals))
    state, m = tr.gen_step(state, KEY, reals, warmed_up=False)
    for k in ("train/latent_distill", "train/mrstft_distill",
              "train/mrstft_own_latents_teacher",
              "train/mrstft_teacher_latents_own"):
        assert np.isfinite(float(m[k])) and float(m[k]) > 0, k

    # without a ckpt the factory refuses, like the reference
    import pytest
    bad = dict(cfg)
    bad["training"] = {k: v for k, v in cfg["training"].items()
                       if k != "teacher_model_ckpt"}
    with pytest.raises(ValueError):
        create_trainer_from_config(bad, model)


def test_cond_trainer_adp_cfg_unet_path():
    """diffusion_cond with an adp_cfg_1d net: the trainer's conditioning
    kwargs (cross_attn_cond / global_embed / cfg_dropout_prob /
    rngs_key) must be accepted by UNetCondAdapter — this path crashed
    when the adapter used its own kwarg names."""
    cfg = {
        "model_type": "diffusion_cond",
        "sample_rate": 8000,
        "model": {
            "diffusion": {
                "type": "adp_cfg_1d",
                "cross_attention_cond_ids": ["prompt"],
                "global_cond_ids": ["seconds_total"],
                "config": {
                    "in_channels": 2, "channels": 8,
                    "multipliers": [1, 2], "factors": [2],
                    "num_blocks": [1], "attentions": [0, 1],
                    "attention_heads": 2, "attention_features": 8,
                    "embedding_features": 8,
                    "context_embedding_features": 8,
                },
            },
        },
        "training": {"learning_rate": 1e-4, "cfg_dropout_prob": 0.1,
                     "timestep_sampler": "uniform"},
    }
    model = create_model_from_config(cfg)
    net, routing, _ = model
    tr = create_trainer_from_config(cfg, model)
    assert tr.cfg_dropout_prob == 0.1
    x0 = jax.random.normal(KEY, (2, 2, 32))
    cond = {"prompt": (jax.random.normal(KEY, (2, 3, 8)),
                       jnp.ones((2, 3))),
            "seconds_total": (jax.random.normal(KEY, (2, 1, 8)),
                              jnp.ones((2, 1)))}
    kwargs = routing.gather(cond)
    params = tr.model.init(KEY, x0, jnp.full((2,), 0.5), **kwargs,
                           cfg_dropout_prob=0.1, rngs_key=KEY)
    loss = jax.jit(tr.loss)(params, KEY, x0, cond)
    assert np.isfinite(float(loss))
    state = tr.init_state(params)
    state2, m = jax.jit(tr.train_step)(state, KEY, x0, cond)
    assert np.isfinite(float(m["train/loss"]))
