"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that all sharding/collective
code paths are exercised without TPU hardware (the pattern SURVEY.md §4
recommends in place of the reference's missing multi-node tests).
"""

import os

# Must run before any jax device use. The environment pins
# JAX_PLATFORMS=axon (the tunneled TPU) and the axon sitecustomize
# overrides the jax_platforms config at interpreter start, so the env var
# alone is NOT enough — override the config after import. Unit tests
# always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="run slow tests (full-model integration)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip_slow = pytest.mark.skip(reason="needs --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow full-model integration test")
