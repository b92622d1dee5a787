"""Test config: force the CPU backend with 8 virtual devices so the suite
runs fast and sharding tests work anywhere.

Note: this image's sitecustomize imports JAX and registers the remote-TPU
("axon") backend in every Python process before pytest starts, so plain env
vars are too late — we must re-select platforms and clear the backend cache.
The driver separately dry-runs real multi-chip sharding via __graft_entry__.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends  # noqa: E402

    clear_backends()
