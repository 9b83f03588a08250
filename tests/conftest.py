import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware; bench.py runs on the real chip instead.
#
# The env image's sitecustomize registers an "axon" TPU backend and calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter startup,
# which overrides the JAX_PLATFORMS env var — so we must override the
# *config* after import, not just the env.
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent XLA compile cache keeps repeat test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
