"""Linear elliptic (Darcy) physics on structured grids.

TPU-native replacement for ``LinearEllipticPhysics``
(reference: physics/LinearElliptic.py:8-173): owns the weak form
``a = alpha * grad(u).grad(v) dx`` through the closed-form stencil operator,
provides batched full-order solves, Dirichlet-eliminated system access and
solution scattering.  The FEniCS problem factories ('ND'/'NDP',
physics/LinearEllipticFactories.py) reduce to the BC family tag since the
form itself is problem-independent.
"""

from __future__ import annotations

from functools import cached_property

import numpy as np
import jax
import jax.numpy as jnp

from .grid import StructuredTriGrid
from .assembly import StencilOperator, assembly_tensor
from .bc import FAMILIES, DirichletProfile
from .solvers import make_fom_solver
from .pixels import PixelConverter


class LinearEllipticPhysics:
    """One discretisation level of the Darcy problem.

    Parameters mirror the reference constructor
    (physics/LinearElliptic.py:10-20): an ``identifier`` ('fom'/'rom'), the
    problem family id ('ND'/'NDP') and a grid.
    """

    def __init__(self, identifier: str, physics_id: str, grid: StructuredTriGrid,
                 *, cg_tol: float | None = None, cg_maxiter: int | None = None):
        physics_id = physics_id.upper()
        if physics_id not in FAMILIES:
            raise NotImplementedError(physics_id)
        self.identifier = identifier
        self.physics_id = physics_id
        self.grid = grid
        self.op = StencilOperator(grid)
        self.profile = DirichletProfile(grid)
        self.pixels = PixelConverter(grid)
        self._cg_tol = cg_tol
        self._cg_maxiter = cg_maxiter

    # ------------------------------------------------------------- queries
    @property
    def constrained_dofs(self) -> np.ndarray:
        return self.profile.constrained_dofs

    @property
    def free_dofs(self) -> np.ndarray:
        return self.profile.free_dofs

    @property
    def dim_in(self) -> int:
        return self.grid.n_cells

    @property
    def dim_out(self) -> int:
        """Number of free dofs (reference: physics/LinearElliptic.py:66-68)."""
        return self.profile.n_free

    @property
    def dim_out_all(self) -> int:
        return self.grid.n_nodes

    # ------------------------------------------------------------- solvers
    @cached_property
    def _solver(self):
        return make_fom_solver(self.op, self.profile.free_mask,
                               tol=self._cg_tol, maxiter=self._cg_maxiter)

    @cached_property
    def assembly_tensor(self) -> np.ndarray:
        """Dense M[i,j,c] (coarse grids only; reference ROM.py:46-55)."""
        return assembly_tensor(self.grid)

    def solve_full(self, alpha: jnp.ndarray, bc_values: jnp.ndarray,
                   f_full: jnp.ndarray | None = None) -> jnp.ndarray:
        """Differentiable single solve returning the FULL dof vector.

        alpha: (n_cells,) conductivities; bc_values: (n_constrained,)
        Dirichlet values; f_full optional raw force (defaults to zero).
        """
        bc_full = self.profile.scatter_full(bc_values)
        if f_full is None:
            f_full = jnp.zeros(self.grid.n_nodes, dtype=bc_full.dtype)
        return self._solver(alpha, f_full, bc_full)

    def solve(self, alpha, bc_values, f_full=None, only_free_dofs: bool = True):
        """Reference ``solve`` semantics (physics/LinearElliptic.py:85-101):
        returns free-dof values by default."""
        y = self.solve_full(alpha, bc_values, f_full)
        return self.profile.restrict_free(y) if only_free_dofs else y

    @cached_property
    def solve_batched(self):
        """Batched differentiable solve: (N, n_cells), (N, n_constrained)
        -> (N, n_free).  Replaces the per-sample FEniCS label loop
        (utils/data.py:96-99) with one fused batch-last CG whose batch
        axis fills the TPU lane dimension (fem/batched_solver.py)."""
        from .batched_solver import make_batched_fom_solver

        return jax.jit(make_batched_fom_solver(
            self.op, self.profile, tol=self._cg_tol,
            maxiter=self._cg_maxiter))

    @cached_property
    def solve_batched_vmap(self):
        """vmapped per-sample solver (reference layout; oracle for the
        batch-last fast path)."""
        return jax.jit(jax.vmap(lambda a, b: self.solve(a, b)))

    def solve_direct(self, alpha, bc_values, only_free_dofs: bool = True):
        """Dense direct solve (oracle; reference solve_direct
        physics/LinearElliptic.py:120-133).  Host-side numpy float64."""
        from .assembly import dense_stiffness

        K = dense_stiffness(self.grid, np.asarray(alpha, dtype=np.float64))
        free = self.free_dofs
        con = self.constrained_dofs
        vals = np.asarray(bc_values, dtype=np.float64)
        f = np.zeros(self.grid.n_nodes)
        f_eff = f[free] - K[np.ix_(free, con)] @ vals
        y_f = np.linalg.solve(K[np.ix_(free, free)], f_eff)
        if only_free_dofs:
            return y_f
        out = np.zeros(self.grid.n_nodes)
        out[con] = vals
        out[free] = y_f
        return out

    # -------------------------------------------- reduced system interface
    def reduced_system_matvec(self, alpha):
        """Matrix-free handle for the Dirichlet-eliminated system
        ``K_ff v`` (reference assemble_system,
        physics/LinearElliptic.py:137-159 -- but as an operator, not CSR)."""
        m = jnp.asarray(self.profile.free_mask)
        coefs = self.op.coefficients(alpha)

        def matvec_full(v_full):
            return m * self.op.to_flat(
                self.op.apply_coeff(coefs, self.op.to_nodegrid(m * v_full)))

        return matvec_full

    def effective_force(self, alpha, bc_values, f_full=None):
        """``f_eff = f_f - K_fc y_c`` scattered on the full grid (zero at
        constrained dofs)."""
        bc_full = self.profile.scatter_full(bc_values)
        if f_full is None:
            f_full = jnp.zeros_like(bc_full)
        m = jnp.asarray(self.profile.free_mask, dtype=bc_full.dtype)
        K_bc = self.op.matvec(alpha, bc_full)
        return m * (f_full - K_bc)

    def scatter_restricted_solution(self, y_free, bc_values):
        """Free-dof solution + Dirichlet values -> full vector (reference:
        physics/LinearElliptic.py:103-118)."""
        return self.profile.scatter_full(bc_values, free_values=y_free)

    def __repr__(self):  # pragma: no cover
        return (f"LinearEllipticPhysics('{self.identifier}', '{self.physics_id}',"
                f" {self.grid!r})")


def make_fom_rom_pair(physics_id: str, nx_rom: int, ny_rom: int,
                      num_refines: int, **solver_kwargs) -> dict:
    """Build the fom/rom physics dict + interpolator W exactly as the
    reference ModelFactory does (factories/model.py:106-142).

    ``solver_kwargs`` (e.g. ``cg_tol``/``cg_maxiter``) forward to both
    LinearEllipticPhysics constructions -- without this the factory every
    caller goes through left those knobs unreachable."""
    from .interpolation import physics_resolution_interpolator

    rom_grid = StructuredTriGrid(nx_rom, ny_rom)
    fom_grid = rom_grid.refined(num_refines)
    physics = {
        "fom": LinearEllipticPhysics("fom", physics_id, fom_grid,
                                     **solver_kwargs),
        "rom": LinearEllipticPhysics("rom", physics_id, rom_grid,
                                     **solver_kwargs),
    }
    physics["W"] = physics_resolution_interpolator(
        rom_grid, fom_grid, free_dofs=physics["fom"].free_dofs)
    return physics
