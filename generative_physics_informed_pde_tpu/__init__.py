"""generative_physics_informed_pde_tpu: a TPU-native (JAX/XLA/Pallas)
framework for semi-supervised, physics-informed generative PDE surrogates.

From-scratch rebuild of the capabilities of
pkmtum/generative-physics-informed-pde (PyTorch + FEniCS) with a TPU-first
architecture: closed-form structured-grid FEM with stencil kernels and
batched CG instead of FEniCS/PETSc, Flax DenseNet codecs, fully
vmapped/jitted SVI training and ``jax.sharding`` data parallelism.
"""

__version__ = "0.1.0"

from . import fem  # noqa: F401
