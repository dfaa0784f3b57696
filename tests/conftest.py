import os

# Device tests run on a virtual 8-device CPU mesh so sharding logic is
# exercised without TPU hardware; kernels themselves are platform-agnostic.
#
# The ambient environment points JAX at a remote TPU tunnel ("axon") through
# a sitecustomize hook that runs BEFORE conftest and overrides JAX_PLATFORMS,
# so setting env vars here is not enough -- force the platform through
# jax.config (effective as long as no backend has been initialized yet,
# which holds because conftest imports before any test module).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: kernel shapes recur across test processes
jax.config.update("jax_compilation_cache_dir", "/tmp/zkvm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
