"""Test config: force the CPU backend with 8 virtual devices (SURVEY §4d).

Tests exercise multi-chip sharding on a virtual 8-device CPU mesh; the real
TPU path is covered by bench.py and __graft_entry__.py on hardware. The env
may pre-register a TPU PJRT plugin at interpreter startup, so the platform is
overridden through jax.config (effective until backends initialise) rather
than via JAX_PLATFORMS alone.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
