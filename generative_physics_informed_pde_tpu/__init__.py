"""generative_physics_informed_pde_tpu: a TPU-native (JAX/XLA/Pallas)
framework for semi-supervised, physics-informed generative PDE surrogates.

From-scratch rebuild of the capabilities of
pkmtum/generative-physics-informed-pde (PyTorch + FEniCS) with a TPU-first
architecture: closed-form structured-grid FEM with stencil kernels and
batched CG instead of FEniCS/PETSc, Flax DenseNet codecs, fully
vmapped/jitted SVI training and ``jax.sharding`` data parallelism.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax


def _enable_compilation_cache():
    """Persistent XLA compilation cache, opt-IN via GPIPDE_COMPILE_CACHE=dir
    (or "1" for the default ~/.cache/gpipde_jax).

    Train-step compiles at 128^2+ take minutes, and the cache makes repeat
    runs' setup near-instant -- but it is not enabled by default: on
    mixed remote/local setups a cached CPU AOT executable compiled on a
    different host can be loaded with mismatched machine features (XLA
    warns of possible SIGILL), so the user must choose it deliberately.
    """
    opt = _os.environ.get("GPIPDE_COMPILE_CACHE")
    if not opt:
        return
    try:
        if _jax.config.jax_compilation_cache_dir is None:
            path = opt if opt != "1" else _os.path.join(
                _os.path.expanduser("~"), ".cache", "gpipde_jax")
            _jax.config.update("jax_compilation_cache_dir", path)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover -- never block import on this
        pass


_enable_compilation_cache()

from . import fem  # noqa: F401,E402
