"""Boundary-condition families and ensembles.

TPU-native replacement for the reference's FEniCS-backed BC stack
(physics/BoundaryConditions.py, physics/LinearEllipticFactories.py,
fawkes/BoundaryConditions.py).  Both problem families share the same
geometry: Dirichlet on the left/right edges of the unit square, zero
Neumann on top/bottom, zero volumetric source:

* ``'ND'``  -- constant Dirichlet: u=0 on the left, u=1 on the right
  (reference: LinearEllipticFactories.py:173-179).
* ``'NDP'`` -- per-sample random linear Dirichlet profiles
  ``u_left(y) = u0 (1-y) + u1 y``, ``u_right(y) = u2 (1-y) + u3 y`` with
  ``u0..u3 ~ U(-1/2, 1/2)`` (reference: LinearEllipticFactories.py:239-281).
  The 4-vector ``theta = (u0, u1, u2, u3)`` is the boundary *encoding*
  (replaces DirichletEncoding, reconstructable per
  LinearEllipticFactories.py:283-285).

Because the constrained dof *set* is identical for every sample (left+right
edge nodes), ensembles are plain stacked arrays and everything is
vmap/shard-friendly.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from .grid import StructuredTriGrid

FAMILIES = ("ND", "NDP")

THETA_DIM = 4  # (u0, u1, u2, u3)


def sample_theta(rng: np.random.Generator, family: str, n: int) -> np.ndarray:
    """Sample boundary encodings, (n, 4) float64.

    'ND' is a constant BC -> theta fixed at (0, 0, 1, 1) so that the same
    linear-profile evaluation covers both families.
    """
    family = family.upper()
    if family == "ND":
        return np.tile(np.array([0.0, 0.0, 1.0, 1.0]), (n, 1))
    if family == "NDP":
        return rng.uniform(-0.5, 0.5, size=(n, THETA_DIM))
    raise NotImplementedError(family)


@dataclasses.dataclass(frozen=True)
class DirichletProfile:
    """Constrained dof bookkeeping for one function space (grid)."""

    grid: StructuredTriGrid

    @cached_property
    def constrained_dofs(self) -> np.ndarray:
        """Sorted left+right edge node ids (the reference sorts via
        np.unique, fawkes/BoundaryConditions.py:131-139)."""
        left = self.grid.boundary_nodes("left")
        right = self.grid.boundary_nodes("right")
        return np.unique(np.concatenate([left, right]))

    @cached_property
    def free_dofs(self) -> np.ndarray:
        mask = np.ones(self.grid.n_nodes, dtype=bool)
        mask[self.constrained_dofs] = False
        return np.nonzero(mask)[0]

    @cached_property
    def free_mask(self) -> np.ndarray:
        """(n_nodes,) float64 1/0 mask of free dofs."""
        m = np.ones(self.grid.n_nodes, dtype=np.float64)
        m[self.constrained_dofs] = 0.0
        return m

    @cached_property
    def n_constrained(self) -> int:
        return self.constrained_dofs.size

    @cached_property
    def n_free(self) -> int:
        return self.free_dofs.size

    @cached_property
    def _profile_basis(self) -> np.ndarray:
        """(n_constrained, 4): values at constrained dofs are
        ``basis @ theta`` -- linear in the encoding."""
        xy = self.grid.node_coords[self.constrained_dofs]
        y = xy[:, 1] / self.grid.ly
        # single-source the edge membership from the grid's own masks so
        # the geometric tolerance lives in one place (grid.py)
        on_left = np.asarray(
            self.grid.boundary_node_masks["left"])[self.constrained_dofs
                                                   ].astype(np.float64)
        on_right = 1.0 - on_left
        B = np.stack(
            [on_left * (1 - y), on_left * y, on_right * (1 - y), on_right * y],
            axis=1,
        )
        return B

    def constrained_values(self, theta) -> jnp.ndarray:
        """theta (..., 4) -> values at constrained dofs (..., n_constrained)."""
        # keep the basis floating-point: an integer theta (natural for the
        # ND encoding) would otherwise truncate the fractional basis rows
        dt = jnp.result_type(jnp.asarray(theta).dtype, jnp.float32)
        B = jnp.asarray(self._profile_basis, dtype=dt)
        return jnp.einsum("...j,cj->...c", jnp.asarray(theta, dtype=dt), B)

    def scatter_full(self, values, free_values=None) -> jnp.ndarray:
        """Build full dof vectors: constrained entries = ``values``,
        free entries = ``free_values`` (or zero); leading batch dims of
        the two inputs broadcast.  Replaces
        ``scatter_restricted_solution`` (physics/LinearElliptic.py:103-118)."""
        values = jnp.asarray(values)
        # common dtype up front: scattering f64 free values into an f32
        # buffer is the unsafe-downcast scatter the solver stack already
        # hardened against (solvers.py rom_solve)
        dt = (values.dtype if free_values is None
              else jnp.result_type(values, free_values))
        batch = values.shape[:-1]
        if free_values is not None:
            free_values = jnp.asarray(free_values, dtype=dt)
            batch = jnp.broadcast_shapes(batch, free_values.shape[:-1])
        full = jnp.zeros(batch + (self.grid.n_nodes,), dtype=dt)
        full = full.at[..., jnp.asarray(self.constrained_dofs)].set(
            values.astype(dt))
        if free_values is not None:
            full = full.at[..., jnp.asarray(self.free_dofs)].set(free_values)
        return full

    def restrict_free(self, full) -> jnp.ndarray:
        return full[..., jnp.asarray(self.free_dofs)]


class BoundaryConditionEnsemble:
    """Batched per-sample boundary conditions over named function spaces.

    Replaces the reference ``BoundaryConditionEnsemble``
    (physics/BoundaryConditions.py:7-147): caches constrained/free dofs and
    per-sample constrained values per registered space ('fom'/'rom'), and
    assembles ``FULL_F_WITH_APPLIED_BC`` force matrices.
    """

    def __init__(self, family: str, thetas: np.ndarray):
        family = family.upper()
        if family not in FAMILIES:
            raise NotImplementedError(family)
        # copy: np.asarray aliases the caller's buffer, and external
        # mutation would desynchronize thetas from the cached _F forces
        thetas = np.array(thetas, dtype=np.float64, copy=True)
        if thetas.ndim != 2 or thetas.shape[1] != THETA_DIM:
            raise ValueError(
                f"thetas must be (N, {THETA_DIM}), got {thetas.shape}")
        self.family = family
        self.thetas = thetas
        self._profiles: Dict[str, DirichletProfile] = {}
        self._F: Dict[str, np.ndarray] = {}

    # ------------------------------------------------------------ factory
    @classmethod
    def from_factory(cls, family: str, n: int,
                     rng: Optional[np.random.Generator] = None):
        """Sample N boundary conditions (reference FromFactory,
        physics/BoundaryConditions.py:95-104)."""
        rng = rng or np.random.default_rng()
        return cls(family, sample_theta(rng, family, n))

    @classmethod
    def from_encoding(cls, family: str, thetas):
        """Rebuild from encodings (reference FromEncoding,
        physics/BoundaryConditions.py:40-55)."""
        return cls(family, thetas)

    def encode(self) -> np.ndarray:
        return self.thetas.copy()

    # ---------------------------------------------------------- registry
    def register_function_space(self, identifier: str, grid: StructuredTriGrid):
        identifier = identifier.lower()
        if identifier in self._profiles:
            return
        self._profiles[identifier] = DirichletProfile(grid)

    def check_if_registered(self, identifier: str) -> bool:
        return identifier.lower() in self._profiles

    def profile(self, identifier: str) -> DirichletProfile:
        return self._profiles[identifier.lower()]

    # ------------------------------------------------------------ queries
    def __len__(self):
        return self.thetas.shape[0]

    def __getitem__(self, idx):
        sub = BoundaryConditionEnsemble(self.family,
                                        np.atleast_2d(self.thetas[idx]))
        sub._profiles = self._profiles  # share registered function spaces
        return sub

    def constrained_dofs(self, identifier: str) -> np.ndarray:
        return self.profile(identifier).constrained_dofs

    def free_dofs(self, identifier: str) -> np.ndarray:
        return self.profile(identifier).free_dofs

    def constrained_values(self, identifier: str) -> np.ndarray:
        """(N, n_constrained) float64.

        Pure host-side numpy: data assembly must not depend on (or wake)
        the accelerator — this is called from the loader before any
        device work, and a tiny device round-trip here is pure latency.
        """
        p = self.profile(identifier)
        basis = np.asarray(p._profile_basis, dtype=np.float64)
        return np.asarray(self.thetas, dtype=np.float64) @ basis.T

    def full_f_with_applied_bc(self, identifier: str) -> np.ndarray:
        """(N, ndof): zero Neumann force with Dirichlet values inserted at
        constrained dofs (reference FULL_F_WITH_APPLIED_BC,
        physics/BoundaryConditions.py:132-147; zero source per
        LinearEllipticFactories.py:165-171)."""
        identifier = identifier.lower()
        if identifier not in self._F:
            p = self.profile(identifier)
            n_elem = len(self) * p.grid.n_nodes
            if n_elem > 2 ** 28:  # ~2 GB of f64: almost certainly the
                # fine grid by mistake (the trainer only needs 'rom' here)
                raise ValueError(
                    f"full_f_with_applied_bc('{identifier}') would "
                    f"materialise {len(self)} x {p.grid.n_nodes} float64 "
                    f"(~{8 * n_elem / 2**30:.1f} GB); this matrix is only "
                    "needed for the ROM space")
            F = np.zeros((len(self), p.grid.n_nodes), dtype=np.float64)
            F[:, p.constrained_dofs] = self.constrained_values(identifier)
            F.setflags(write=False)  # shared cache: callers must not
            # mutate it (the loader stores the same reference)
            self._F[identifier] = F
        return self._F[identifier]

    # upper-case alias for drop-in parity with the reference API
    FULL_F_WITH_APPLIED_BC = full_f_with_applied_bc
