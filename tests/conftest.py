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
    xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in xla_flags:
    # 8 virtual devices time-slicing few host cores can exceed the default 40 s
    # collective rendezvous timeout under load; that aborts the process.
    xla_flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=900"
    )
os.environ["XLA_FLAGS"] = xla_flags

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the tiny-model jit programs in these tests are
# identical across runs, and compile time dominates on a small CPU host.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/coral_tpu/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_configure() -> None:
    """Set a global flag while pytest is running (reference: tests/conftest.py:21)."""
    setattr(sys, "_called_from_test", True)


def pytest_unconfigure() -> None:
    """Unset the global flag when pytest is finished."""
    if hasattr(sys, "_called_from_test"):
        delattr(sys, "_called_from_test")


@pytest.fixture(autouse=True)
def _isolate_default_prng_impl():
    """Restore ``jax_default_prng_impl`` after every test.

    ``coral_tpu.training.finetune.finetune()`` sets the global default PRNG
    impl (rbg on TPU for fast in-kernel dropout bits); without isolation any
    test that calls it changes ``jax.random.PRNGKey`` semantics for every
    LATER test in the same process — e.g. ``test_remat_policies`` draws
    different params and its marginal tolerances become ordering-dependent
    (round-5 full-suite failure: green standalone, red after the whisper
    mini-rehearsal ran first)."""
    prev = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != prev:
        jax.config.update("jax_default_prng_impl", prev)


@pytest.fixture(scope="session")
def config_path() -> str:
    """Path to the repo config tree."""
    from pathlib import Path

    return str(Path(__file__).parent.parent / "config")
