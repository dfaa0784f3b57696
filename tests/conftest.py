import os

# Device tests run on a virtual 8-device CPU mesh so sharding logic is
# exercised without TPU hardware; kernels themselves are platform-agnostic.
# Force CPU: the ambient environment may point JAX at a remote TPU tunnel
# ("axon"), where eager per-op dispatch round-trips the network.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
