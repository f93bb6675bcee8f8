"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths compile and execute without TPU hardware.

The environment's sitecustomize registers a remote TPU platform and
overrides ``jax_platforms`` via jax.config, so setting JAX_PLATFORMS in the
environment is not enough — we must update jax.config before any backend
initializes."""

import os

# Tests never want the persistent compilation cache: CPU compiles are
# fast, and concurrent suite/bench runs sharing one cache dir have
# produced corrupt entries that SIGABRT inside XLA's cache read (the
# cache exists for minutes-long remote TPU compiles, not for tests).
os.environ.setdefault("FRIZBEE_TPU_NO_CACHE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the reference-scale property suites (several minutes)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: reference-scale generated suites; opt in with --runslow",
    )


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA's CPU backend segfaults inside backend_compile once enough
    executables accumulate in one process (reproduced: test_batch_api +
    test_batch_fast deterministically crashes compiling the 14th test's
    program; either file alone passes). Dropping compiled programs
    between modules keeps the live-executable set small; modules rarely
    share program shapes, so the recompile cost is noise."""
    yield
    jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="use --runslow for reference-scale runs")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
