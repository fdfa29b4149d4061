"""Shared pytest fixtures and environment setup.

JAX is forced onto a virtual 8-device CPU platform *before* the first jax import so
that every data-parallel / sharding code path is exercised without TPU hardware —
mirroring (and exceeding) the reference's CPU-only test strategy
(reference: ``tests/conftest.py:21-28``, which forces `use_cpu` in trainer args).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure() -> None:
    """Set a global flag while pytest is running (reference: tests/conftest.py:21)."""
    setattr(sys, "_called_from_test", True)


def pytest_unconfigure() -> None:
    """Unset the global flag when pytest is finished."""
    if hasattr(sys, "_called_from_test"):
        delattr(sys, "_called_from_test")


@pytest.fixture(scope="session")
def config_path() -> str:
    """Path to the repo config tree."""
    from pathlib import Path

    return str(Path(__file__).parent.parent / "config")
