"""Test configuration: run on a virtual 8-device CPU mesh with float64
enabled, regardless of attached accelerators.  Must run before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

# the axon sitecustomize re-exports JAX_PLATFORMS=axon at interpreter start,
# so the env var alone is not enough -- set the config explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
