import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware; bench.py runs on the real chip instead.
# LT_TESTS_TPU=1 keeps the real accelerator so tests/test_tpu_hw.py can
# pin the Pallas kernels against the host oracle ON the chip.
#
# The env image's sitecustomize registers an "axon" TPU backend and calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter startup,
# which overrides the JAX_PLATFORMS env var — so we must override the
# *config* after import, not just the env.
_ON_HW = os.environ.get("LT_TESTS_TPU") == "1"
if not _ON_HW:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_HW:
    jax.config.update("jax_platforms", "cpu")
# persistent XLA compile cache keeps repeat test runs fast.  Must be set
# via config.update, not env vars: the env image's sitecustomize imports
# jax at interpreter startup, freezing env-derived config before we run.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
