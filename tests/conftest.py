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

# Resolve the reference oracle binaries (built by ci/run.sh into a durable
# path) so the token-exact e2e layer runs in CI instead of skipping.
# Env vars win; otherwise the first existing build dir is used.
for _d in (
    os.environ.get("TPULLAMA_REF_BUILD", ""),
    os.path.join(os.path.dirname(__file__), "..", ".refbuild"),
    "/root/refbuild",
    "/tmp/refbuild",
):
    if _d and os.path.isdir(os.path.join(_d, "bin")):
        os.environ.setdefault("TPULLAMA_REF_BUILD", _d)
        for _var, _bin in (
            ("TPULLAMA_REF_CLI", "llama-cli"),
            ("TPULLAMA_REF_PPL", "llama-perplexity"),
            ("TPULLAMA_REF_TOKENIZE", "llama-tokenize"),
            ("TPULLAMA_REF_MTMD_CLI", "llama-mtmd-cli"),
            ("TPULLAMA_REF_EMB", "llama-embedding"),
            ("TPULLAMA_REF_QUANTIZE", "llama-quantize"),
        ):
            _p = os.path.join(_d, "bin", _bin)
            if os.path.exists(_p):
                os.environ.setdefault(_var, _p)
        break

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
