"""Utils, checkpointing, parallel helpers, config family tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ditsep_tpu.configs import (
    CONFIG_FAMILIES, build_diffsep_trainer, build_latent_trainer, override,
)
from ditsep_tpu.parallel import (
    data_sharding, is_rank_zero, make_mesh, pad_batch_to_devices, replicated,
    shard_batch,
)
from ditsep_tpu.utils import (
    AutoClipper, SplitDirectory, StandardScaler, count_parameters,
    solve_psd_loaded,
)
from ditsep_tpu.utils.checkpoint import (
    CheckpointManager, load_params_npz, save_params_npz,
)


def test_standard_scaler_welford():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((500, 3)) * np.array([1.0, 2.0, 0.5]) + 1.0
    sc = StandardScaler(3)
    for chunk in np.array_split(data, 10):
        sc.update(chunk)
    np.testing.assert_allclose(sc.mean, data.mean(0), atol=1e-10)
    np.testing.assert_allclose(sc.var, data.var(0, ddof=1), atol=1e-10)
    x = jnp.asarray(data[:5], jnp.float32)
    z = sc.transform(x)
    back = sc.inverse_transform(z)
    np.testing.assert_allclose(np.asarray(back), data[:5], atol=1e-4)


def test_autoclipper_percentile():
    c = AutoClipper(50)
    ts = [c.threshold(g) for g in [1.0, 2.0, 3.0, 4.0, 5.0]]
    assert ts[-1] == 3.0  # median of history


def test_solve_psd_loaded():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 4))
    a = a @ a.T + 4 * np.eye(4)
    b = rng.standard_normal((4, 2))
    x = solve_psd_loaded(jnp.asarray(a, jnp.float32),
                         jnp.asarray(b, jnp.float32), load=0.0)
    np.testing.assert_allclose(np.asarray(a @ np.asarray(x)), b, atol=1e-3)


def test_split_directory(tmp_path):
    sd = SplitDirectory(str(tmp_path), max_files=2)
    paths = [sd.next_path(f"f{i}.txt") for i in range(5)]
    shards = {os.path.basename(os.path.dirname(p)) for p in paths}
    assert shards == {"00000", "00001", "00002"}


def test_count_parameters():
    p = {"a": jnp.ones((2, 3)), "b": {"c": jnp.ones((4,))}}
    assert count_parameters(p) == 10


# ---------------------------------------------------------- checkpoint ----
def test_checkpoint_manager_topk_and_best(tmp_path):
    state = {"w": jnp.ones((4,)), "step": jnp.zeros((), jnp.int32)}
    mgr = CheckpointManager(str(tmp_path), monitor="val/si_sdr", mode="max",
                            save_top_k=2)
    for step, sdr in [(1, 5.0), (2, 8.0), (3, 3.0), (4, 10.0)]:
        s = {"w": jnp.ones((4,)) * step,
             "step": jnp.asarray(step, jnp.int32)}
        mgr.save(s, step, {"val/si_sdr": sdr})
    # only top-2 kept: sdr 10.0 (step 4) and 8.0 (step 2)
    kept = sorted(mgr._index.values())
    assert kept == [8.0, 10.0]
    best = mgr.restore(state)
    assert int(best["step"]) == 4
    np.testing.assert_allclose(np.asarray(best["w"]), 4.0)


def test_params_npz_roundtrip(tmp_path):
    params = {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3),
                        "bias": jnp.zeros((3,))}}
    p = str(tmp_path / "params.npz")
    save_params_npz(p, params)
    template = jax.tree.map(jnp.zeros_like, params)
    loaded = load_params_npz(p, template)
    np.testing.assert_allclose(np.asarray(loaded["layer"]["kernel"]),
                               np.arange(6.0).reshape(2, 3))


def test_params_npz_collection_prefix_tolerance(tmp_path):
    """save(full variables dict) -> load(bare params template) and the
    reverse both resolve (the one-level 'params/' wrapper mismatch
    between scripts saving trainer.vae.init output and cli loaders
    templating variables['params'])."""
    bare = {"layer": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(3)}}
    full = {"params": bare}
    p_full = str(tmp_path / "full.npz")
    p_bare = str(tmp_path / "bare.npz")
    save_params_npz(p_full, full)
    save_params_npz(p_bare, bare)
    out = load_params_npz(p_full, jax.tree.map(jnp.zeros_like, bare))
    np.testing.assert_allclose(np.asarray(out["layer"]["kernel"]), 1.0)
    out2 = load_params_npz(p_bare, jax.tree.map(jnp.ones_like, full))
    np.testing.assert_allclose(np.asarray(out2["params"]["layer"]["bias"]),
                               0.0)


# ------------------------------------------------------------ parallel ----
def test_mesh_and_sharding():
    mesh = make_mesh()
    assert mesh.axis_names == ("data",)
    batch = {"x": np.ones((mesh.devices.size * 2, 3), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.is_equivalent_to(
        data_sharding(mesh), ndim=2)
    assert is_rank_zero()


def test_pad_batch_to_devices():
    batch = {"x": np.ones((5, 2), np.float32)}
    padded, n_real = pad_batch_to_devices(batch, 4)
    assert padded["x"].shape[0] == 8
    assert n_real == 5


# -------------------------------------------------------------- configs ---
def test_config_families_and_builders():
    for name, f in CONFIG_FAMILIES.items():
        cfg = f()
        assert "model" in cfg, name
    tr = build_diffsep_trainer(
        override(CONFIG_FAMILIES["diffsep"](),
                 {"model.score_model.nf": 16}))
    assert tr.cfg.init_hack == 5 and tr.is_matrix
    tr_sb = build_diffsep_trainer(CONFIG_FAMILIES["diffsep_sb"]())
    assert tr_sb.is_edm and tr_sb.cfg.init_hack_p == 0.0
    tr_lat = build_latent_trainer(CONFIG_FAMILIES["latent_diffsep_ouve"]())
    assert tr_lat.vae.downsampling_ratio == 2048
    icassp = CONFIG_FAMILIES["diffsep_icassp"]()
    assert icassp["model"]["score_model"]["nf"] == 128


def test_override_deep_copy():
    base = CONFIG_FAMILIES["diffsep"]()
    mod = override(base, {"model.sde.sigma_max": 1.0})
    assert base["model"]["sde"]["sigma_max"] == 0.5
    assert mod["model"]["sde"]["sigma_max"] == 1.0


def test_enhancement_family_builds():
    """Noise-reduction experiment (reference:
    src/config/diffsep/experiment/noise-reduction.yaml + model/nr.yaml):
    PriorMixSDE, 16 kHz, init_hack 4, nf 128, VCTK-DEMAND datamodule."""
    from ditsep_tpu.sdes import PriorMixSDE
    cfg = CONFIG_FAMILIES["enhancement"]()
    assert cfg["name"] == "enhancement"
    assert cfg["datamodule"]["dataset"] == "vctk_demand"
    assert cfg["datamodule"]["fs"] == 16000
    assert cfg["trainer"]["accumulate_grad_batches"] == 4
    tr = build_diffsep_trainer(
        override(cfg, {"model.score_model.nf": 16}))
    assert isinstance(tr.sde, PriorMixSDE)
    assert tr.sde.sigma_min == 0.05 and tr.sde.sigma_max == 0.5
    assert tr.cfg.init_hack == 4 and tr.is_matrix
    assert tr.cfg.train_source_order is None


def test_checkpoint_nan_metric_never_best(tmp_path):
    """NaN/missing monitor metrics rank WORST deterministically: a NaN
    checkpoint must never take the best-model link and is pruned first
    (python's sorted() with raw NaN keys is non-deterministic)."""
    mgr = CheckpointManager(str(tmp_path), monitor="val/si_sdr",
                            mode="max", save_top_k=2)
    state = {"w": np.ones((2,), np.float32)}
    mgr.save(state, 1, {"val/si_sdr": 5.0})
    mgr.save(state, 2, {})  # missing metric -> NaN
    mgr.save(state, 3, {"val/si_sdr": 7.0})
    import os as _os
    best = _os.path.basename(mgr.best_path())
    assert "7.000" in best
    # the NaN checkpoint was pruned, the two real ones survive
    assert set(mgr._index) == {
        n for n in mgr._index if "nan" not in n}
    assert len(mgr._index) == 2
    assert any("5.000" in n for n in mgr._index)


def test_checkpoint_latest_swap_never_empty(tmp_path):
    """save_latest must never pass through a state with NO 'latest' on
    disk (crash-resume anchor): the old one is moved aside, the new one
    swapped in atomically."""
    mgr = CheckpointManager(str(tmp_path))
    s1 = {"w": np.ones((2,), np.float32)}
    mgr.save_latest(s1, 1)
    s2 = {"w": np.full((2,), 2.0, np.float32)}
    p = mgr.save_latest(s2, 2)
    restored = mgr.restore({"w": np.zeros((2,), np.float32)},
                           prefer="latest")
    np.testing.assert_array_equal(restored["w"], s2["w"])
    assert p.endswith("latest")
    assert not (tmp_path / ".latest.old").exists()


def test_checkpoint_and_logger_write_gating(tmp_path):
    """write=False / enabled=False (non-rank-zero processes) produce no
    files but keep restore() working."""
    from ditsep_tpu.utils.logging import MetricsLogger

    w = CheckpointManager(str(tmp_path / "w"), write=True)
    w.save_latest({"w": np.ones((2,), np.float32)}, 5)
    ro = CheckpointManager(str(tmp_path / "w"), write=False)
    assert ro.save({"w": np.ones((2,), np.float32)}, 6,
                   {"val/si_sdr": 1.0}) == ""
    got = ro.restore({"w": np.zeros((2,), np.float32)}, prefer="latest")
    np.testing.assert_array_equal(got["w"], 1.0)

    lg = MetricsLogger(str(tmp_path / "lg"), enabled=False)
    lg.log({"a": 1.0}, 0)
    lg.log_audio("x", np.zeros(10), 0)
    lg.close()
    assert not (tmp_path / "lg").exists()


def test_make_mesh_multi_axis_shape():
    import jax as _jax

    from ditsep_tpu.parallel import make_mesh

    n = len(_jax.devices())
    if n < 2:
        pytest.skip("needs >=2 devices")
    mesh = make_mesh(axis_names=("data", "model"), shape=(n // 2, 2))
    assert mesh.shape == {"data": n // 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(axis_names=("data", "model"), shape=(n, 2))
