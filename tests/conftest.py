"""Test configuration: force CPU with 8 virtual devices for sharding tests.

The session environment pins JAX_PLATFORMS=axon (one real TPU chip); tests
must run on a virtual 8-device CPU mesh instead, so we override both the env
var and the jax config (the axon plugin re-asserts itself via the env var
alone).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
