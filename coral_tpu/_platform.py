"""Honor an explicit non-axon JAX_PLATFORMS from the environment.

Stock JAX reads the env var itself, but the axon TPU-tunnel site overrides it
at interpreter start (its ambient default is ``JAX_PLATFORMS=axon``), so a
user's ``JAX_PLATFORMS=cpu python ...`` would still initialise the remote
backend — which hangs hard when the tunnel is down. Calling
:func:`honor_jax_platforms` before first backend use translates a non-axon
env value into the config flag. The ambient "axon" value is never
re-applied: an explicit in-process ``jax.config.update("jax_platforms", ...)``
(tests, dryrun children) must keep winning.

Imported by ``coral_tpu.config`` (so every CLI script gets it via its config
import) and called explicitly by ``bench.py``, ``__graft_entry__.py`` and the
``tools/`` probes, which do not go through the config system.
"""

from __future__ import annotations

import os


def honor_jax_platforms() -> None:
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and "axon" not in env_platforms.split(","):
        import jax

        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:  # pragma: no cover - already-initialised backend
            pass


honor_jax_platforms()
