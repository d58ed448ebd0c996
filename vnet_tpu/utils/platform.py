"""Backend-selection helper shared by the CLIs.

Environments whose sitecustomize force-selects a remote accelerator
override ``JAX_PLATFORMS`` via ``jax.config`` at interpreter start; every
CLI re-asserts the env var before first device access so
``JAX_PLATFORMS=cpu python main.py ...`` behaves as documented.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env(value: str | None = None) -> None:
    """Make ``JAX_PLATFORMS`` (or an explicit ``value``) authoritative.

    Must run before JAX's backend initializes (i.e. before the first
    ``jax.devices()``/array op); importing jax here is safe — backends
    initialize lazily on first device access, not at import.
    """
    val = value if value is not None else os.environ.get("JAX_PLATFORMS")
    if val:
        os.environ["JAX_PLATFORMS"] = val
        import jax
        jax.config.update("jax_platforms", val)
