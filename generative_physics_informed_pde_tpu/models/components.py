"""Differentiable model components: effective-property map and the
ROM operator with the embedded coarse FEM solve.

TPU-native re-implementation of bottleneck/components.py
(``EffectivePropertyMap`` :201-257, ``ReducedOrderModelOperator`` :260-323)
and bottleneck/ROM.py.  The coarse solve is the closed-form batched dense
solve from ``fem.solvers`` -- differentiable end-to-end, vmapped over the
batch, LU on the MXU.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..fem.solvers import rom_solve, stiffness_from_tensor
from ..fem.physics import LinearEllipticPhysics


class EffectivePropertyMap(nn.Module):
    """z -> coarse log-conductivity X_c ("gp" in the reference,
    bottleneck/components.py:201-257).

    * ``num_hidden_layers == 0``: a single affine map.
    * otherwise an MLP with linearly decayed widths
      (lamp/neuralnets.py:31-44 FromLinearDecay).
    * ``independent_X``: adds a learnable ``logsigmas_X`` making
      p(X_c | z) a diagonal Gaussian; forward returns (mean, logsigmas).
    """

    latent_dim: int
    dim_effective_property: int
    num_hidden_layers: int = 0
    independent_X: bool = True

    @nn.compact
    def __call__(self, z):
        x = z
        if self.num_hidden_layers > 0:
            widths = np.linspace(self.latent_dim, self.dim_effective_property,
                                 self.num_hidden_layers + 2).astype(int)[1:-1]
            for w in widths:
                x = nn.relu(nn.Dense(int(w))(x))
        mean = nn.Dense(self.dim_effective_property)(x)
        if not self.independent_X:
            return mean
        # reference inits logsigmas_X to ONES (components.py:213)
        logsigmas = self.param("logsigmas_X", nn.initializers.ones,
                               (self.dim_effective_property,))
        return mean, jnp.broadcast_to(logsigmas, mean.shape)

    @property
    def dim_in(self) -> int:
        return self.latent_dim


def propagate_gp_samples(gp_out, key):
    """Reparameterised sample through the effective-property map
    (reference: components.py:238-249)."""
    if isinstance(gp_out, tuple):
        mean, logsigmas = gp_out
        eps = jax.random.normal(key, logsigmas.shape, dtype=mean.dtype)
        return mean + jnp.exp(logsigmas) * eps
    return gp_out


@dataclasses.dataclass(frozen=True)
class ROM:
    """The embedded differentiable coarse FEM solver (reference:
    bottleneck/ROM.py:5-104), assembled in closed form -- no FEM library.

    ``M`` is the (d, d, c) assembly tensor; ``__call__`` builds the batched
    stiffness ``K = M . x`` with Dirichlet identity rows and solves
    ``K y = F`` densely (all differentiable, grads flow through
    ``jnp.linalg.solve``'s implicit rules, replacing backprop through
    ``torch.solve``)."""

    M: np.ndarray            # (d, d, c) float64 numpy (device-lifted per use)
    bc_dofs: np.ndarray      # constrained dof ids
    max_cells: int = 4096

    @classmethod
    def from_physics(cls, physics: LinearEllipticPhysics) -> "ROM":
        # size guard in the spirit of ROM.py:43-44 (relaxed: TPUs handle
        # larger batched dense solves comfortably)
        if physics.grid.n_cells > cls.max_cells:
            raise ValueError("ROM exceeds intended maximum size")
        return cls(M=physics.assembly_tensor,
                   bc_dofs=np.asarray(physics.constrained_dofs))

    @property
    def V_dim(self) -> int:
        return self.M.shape[0]

    @property
    def Vc_dim(self) -> int:
        return self.M.shape[2]

    dim_in = property(lambda self: self.Vc_dim)
    dim_out = property(lambda self: self.V_dim)

    def __call__(self, X: jnp.ndarray, F: jnp.ndarray) -> jnp.ndarray:
        """X (..., c) positive conductivities, F (..., d) force with BC
        values applied -> (..., d) solutions."""
        M = jnp.asarray(self.M, dtype=X.dtype)
        # bc_dofs stays host numpy: rom_solve derives the static free-dof
        # index set from it (a traced index array would break the trace)
        return rom_solve(M, X, F, self.bc_dofs)

    def get_stiffness(self, X: jnp.ndarray, dirichlet_bc: bool = True):
        M = jnp.asarray(self.M, dtype=X.dtype)
        if dirichlet_bc:
            return stiffness_from_tensor(M, X, jnp.asarray(self.bc_dofs))
        return jnp.einsum("ijc,...c->...ij", M, X)


@dataclasses.dataclass(frozen=True)
class ReducedOrderModelOperator:
    """"g": y = W . rom(exp(X_c) + 1e-8, F) with learnable per-dof noise
    (reference: bottleneck/components.py:260-323).

    Parameters live OUTSIDE the object (functional style): the learnable
    ``logsigmas_y`` vector is passed in by the caller; ``init_params``
    creates it (init = ones, components.py:272).
    """

    rom: ROM
    W: np.ndarray  # (n_free_fine, d_rom) float64 numpy

    EXP_FLOOR = 1e-8  # reference: exp(effprop) + 1e-8 (components.py:298)

    @classmethod
    def from_physics(cls, physics: dict) -> "ReducedOrderModelOperator":
        W = np.asarray(physics["W"])
        if W.shape[0] < W.shape[1]:
            raise ValueError("W must be tall (fine dofs x rom dofs)")
        return cls(rom=ROM.from_physics(physics["rom"]), W=W)

    @property
    def dim_effective_property(self) -> int:
        return self.rom.Vc_dim

    dim_in = property(lambda self: self.dim_effective_property)

    @property
    def dim_out(self) -> int:
        return self.W.shape[0]

    def init_params(self, dtype=jnp.float32) -> dict:
        return {"logsigmas_y": jnp.ones(self.dim_out, dtype=dtype)}

    def forward_mean(self, effprop: jnp.ndarray, F: jnp.ndarray) -> jnp.ndarray:
        """(..., c) log-properties + (..., d_rom) forces -> (..., n_free)."""
        W = jnp.asarray(self.W, dtype=effprop.dtype)
        y_rom = self.rom(jnp.exp(effprop) + self.EXP_FLOOR, F)
        return jnp.einsum("sk,...k->...s", W, y_rom)

    def __call__(self, params: dict, effprop: jnp.ndarray, F: jnp.ndarray):
        mean = self.forward_mean(effprop, F)
        logsigmas = jnp.broadcast_to(
            params["logsigmas_y"].astype(mean.dtype), mean.shape)
        return mean, logsigmas

    def propagate_samples(self, params: dict, effprops, F, key):
        """Reparameterised push-through (components.py:304-311)."""
        mean, logsigmas = self(params, effprops, F)
        eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        return mean + jnp.exp(logsigmas) * eps
