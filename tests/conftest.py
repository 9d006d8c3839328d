"""Test harness: force JAX onto a virtual 8-device CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if the env selects a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# a sitecustomize may have force-registered a TPU plugin via jax.config
# (overriding the env var) — override it back before any backend init
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clean_config():
    """Each test starts with no active ConfigContext and a fresh LogManager."""
    from sres_tpu.config import ConfigContext
    from sres_tpu.util.logging import LogManager
    ConfigContext.deactivate()
    LogManager.reset()
    yield
    ConfigContext.deactivate()
    LogManager.reset()


@pytest.fixture()
def local_platform(tmp_path, monkeypatch):
    """Point the 'local' platform at a tmp dir via SRES_PLATFORM_ROOT-free
    override: tests pass platform paths through dot-key overrides instead."""
    return {
        "platform.root": str(tmp_path),
        "platform.results": str(tmp_path / "results"),
        "platform.cache": str(tmp_path / "cache"),
        "platform.processed": str(tmp_path / "processed"),
    }
