"""Test config: run everything on CPU with 8 virtual devices so that
multi-chip sharding tests (shard_map collectives) run without a TPU."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments pre-import jax (JAX_PLATFORMS=axon); the config update
# below still wins as long as no backend has been initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
