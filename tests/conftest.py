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

# Persistent compilation cache: this box has ONE core, so XLA:CPU compiles
# dominate the quick tier's wall-clock. Warm-cache reruns are what the
# routine gate needs to be fast (VERDICT r2 weak #7); code changes
# invalidate exactly the entries they recompile.
_cache_dir = os.environ.get(
    "STP_TEST_CACHE", os.path.expanduser("~/.cache/stp_jax_test_cache")
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Failure-contract tests exercise snapshot-on-failure dumps; point them at
# a scratch dir so they never litter the repo root (VERDICT r3 weak #8).
import tempfile

os.environ.setdefault("STP_SNAPSHOT_DIR", tempfile.mkdtemp(prefix="stp_snap_"))
