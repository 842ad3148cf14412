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
# Host-local persistent compile cache: repeat suite runs skip the XLA
# compiles that dominate wall time on this 1-core host.  /tmp is safe
# from the cross-host SIGILL hazard that keeps the cache opt-in
# package-wide (see generative_physics_informed_pde_tpu/__init__.py).
os.environ.setdefault("GPIPDE_COMPILE_CACHE", "/tmp/gpipde_test_cache")

import jax  # noqa: E402

# the axon sitecustomize re-exports JAX_PLATFORMS=axon at interpreter start,
# so the env var alone is not enough -- set the config explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
