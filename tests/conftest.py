"""Test configuration: run the whole suite on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The hosting environment force-registers an experimental TPU platform
# ("axon") that overrides JAX_PLATFORMS; pin CPU explicitly so the test
# suite always runs on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compilation cache: the suite is compile-bound on this 1-vCPU
# box; cached XLA programs make repeat runs minutes instead of ~45 min
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def pytest_collection_modifyitems(config, items):
    """Apply the 'heavy' marker from the checked-in tier list
    (tests/heavy_tests.txt, measured per-test durations >10s on this
    box). Tiers:
      fast : -m "not slow and not heavy"   (<10 min target)
      full : no marker filter              (<45 min target)
    The list is data, not decoration, so a re-tier is one regenerated
    file from a DITSEP_DURATIONS_LOG run (see docs/ROADMAP_r5.md)."""
    tier_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "heavy_tests.txt")
    if not os.path.exists(tier_file):
        return
    import pytest

    with open(tier_file) as f:
        heavy = {ln.strip() for ln in f
                 if ln.strip() and not ln.startswith("#")}
    for item in items:
        if item.nodeid in heavy:
            item.add_marker(pytest.mark.heavy)


def pytest_runtest_logreport(report):
    """Opt-in per-test duration log (DITSEP_DURATIONS_LOG=<path>): appends
    one `seconds<TAB>nodeid` line per call phase as tests finish, so tier
    re-balancing has incremental data even if a long run is interrupted
    (pytest's own --durations only prints at session end)."""
    path = os.environ.get("DITSEP_DURATIONS_LOG")
    if path and report.when == "call":
        with open(path, "a") as f:
            f.write(f"{report.duration:.2f}\t{report.nodeid}\n")
