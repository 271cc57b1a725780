"""Test harness: force CPU with 8 virtual devices so the suite runs fast and
sharding tests work without a TPU.

Note: this session's environment pins JAX_PLATFORMS=axon (a tunneled TPU
whose per-op latency makes unit tests crawl); the env var alone is not
honored by the axon plugin, so we also set the config explicitly before any
test imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
