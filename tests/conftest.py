"""Test config: run everything on CPU with an 8-device virtual mesh so
multi-chip sharding paths are exercised without TPU hardware.

NOTE: this image exports JAX_PLATFORMS=axon (TPU plugin) globally and the
env var is re-prepended, so the override must go through jax.config before
the backend initializes."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
