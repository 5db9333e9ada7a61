"""Test harness configuration.

Multi-chip code paths are exercised on a virtual 8-device CPU mesh
(SURVEY.md §4: the TPU analog of the reference's debug-build + diff
methodology).  The env vars must be set before jax is imported anywhere, so
this lives at conftest import time.
"""

import os

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon baked into the config, so env edits here are too late —
# override through the config API instead.  The suite runs on a virtual
# 8-device CPU mesh so the shard_map/collective code paths are exercised
# without TPU hardware (SURVEY.md §4).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# fp64 available for parity oracles; f32 paths pass explicit dtypes.
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the Barnes-Hut traversal graphs are large,
# caching keeps repeated suite runs fast.
os.makedirs("/tmp/nbody_tpu_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/nbody_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute configs (1M-body envelope); skipped unless a "
        "-m marker expression opts in (e.g. -m slow)",
    )
    config.addinivalue_line(
        "markers",
        "heavy: interpret-mode Pallas kernel + fuzz tests that dominate "
        "the suite wall time on the 1-core host; -m 'not heavy' gives a "
        "quick (<10 min) signal, the bare suite runs everything",
    )


def pytest_collection_modifyitems(config, items):
    expr = config.getoption("-m") or ""
    if "slow" in expr:
        return  # explicit slow opt-in: let pytest handle selection
    # skip slow even under other -m expressions (e.g. "not heavy" must
    # not accidentally opt into the multi-minute 1M envelope)
    skip = pytest.mark.skip(reason="slow: opt in with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def data_dir() -> str:
    return DATA_DIR


@pytest.fixture(scope="session")
def bodies10() -> np.ndarray:
    from nbody_tpu.io.csv import read_bodies

    return read_bodies(os.path.join(DATA_DIR, "10_bodies.csv"))


@pytest.fixture(scope="session")
def bodies100() -> np.ndarray:
    from nbody_tpu.io.csv import read_bodies

    return read_bodies(os.path.join(DATA_DIR, "100_bodies_g1.csv"))


def random_cloud(n: int, seed: int = 0) -> np.ndarray:
    """Random body cloud matching the reference fixtures' distribution
    (coords ~ +-2, masses 0.04-1.0; SURVEY.md §2.4)."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-2.0, 2.0, size=(n, 3))
    vel = rng.uniform(-1.0, 1.0, size=(n, 3))
    mass = rng.uniform(0.04, 1.0, size=(n,))
    return np.concatenate([pos, vel, mass[:, None]], axis=1)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process XLA state: with several hundred live compiled
    executables the CPU backend segfaults nondeterministically in pjit
    execution (reproduced on the 8k-body flat-traversal graph at ~95%
    suite progress; the same test is green standalone).  Dropping the
    in-memory caches after each module keeps the live-executable count
    small; the persistent disk cache makes any re-compiles cheap."""
    yield
    import jax

    jax.clear_caches()
