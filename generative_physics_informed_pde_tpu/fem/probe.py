"""Point probes and quantities of interest (QOI).

Re-implementation of ``Probe`` (reference: fawkes/Probe.py:11-177) and
``QOI`` / ``SquareSubdomain`` (reference: bottleneck/flux.py:162-246): both
reduce to evaluating P1 basis functions at points or integrating over cell
subsets -- closed-form linear functionals on the structured grid, applied
as single matvecs (batched over solution ensembles).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .grid import StructuredTriGrid
from .interpolation import p1_interpolation_matrix


@dataclasses.dataclass(frozen=True, eq=False)
class Probe:
    """Evaluate nodal (CG1) fields at fixed points
    (reference: fawkes/Probe.py -- there PETSc-backed; here one static
    interpolation matrix).

    ``eq=False``: the ndarray field makes the generated ``__eq__`` raise
    ("truth value of an array is ambiguous") and ``__hash__`` TypeError;
    identity semantics are the honest contract."""

    grid: StructuredTriGrid
    points: np.ndarray  # (n_points, 2)

    @cached_property
    def matrix(self) -> np.ndarray:
        return p1_interpolation_matrix(self.grid, self.points)

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        """u (..., n_nodes) -> (..., n_points)."""
        M = jnp.asarray(self.matrix, dtype=jnp.result_type(u))
        return u @ M.T


@dataclasses.dataclass(frozen=True)
class QOI:
    """Point or square-subdomain-integral functional of the solution
    (reference: bottleneck/flux.py:162-246).

    * ``L is None``: point evaluation at (mx, my),
    * else: integral of u over the square |x-mx|<=L, |y-my|<=L (cells
      selected by midpoint, matching the reference's SubDomain marking).
    """

    grid: StructuredTriGrid
    mx: float = 0.5
    my: float = 0.5
    L: Optional[float] = None

    @cached_property
    def functional(self) -> np.ndarray:
        """(n_nodes,) weights: qoi(u) = functional . u."""
        if self.L is None:
            return p1_interpolation_matrix(
                self.grid, np.array([[self.mx, self.my]])).ravel()
        mids = self.grid.cell_midpoints
        inside = ((np.abs(mids[:, 0] - self.mx) <= self.L)
                  & (np.abs(mids[:, 1] - self.my) <= self.L))
        # integral of u over selected cells: each P1 vertex contributes
        # area/3 (derivative of integral(u) wrt nodal values)
        w = np.zeros(self.grid.n_nodes)
        areas = self.grid.cell_areas
        for c in np.nonzero(inside)[0]:
            for dof in self.grid.cells[c]:
                w[dof] += areas[c] / 3.0
        return w

    def extract(self, Y: jnp.ndarray, bc_values=None,
                profile=None) -> jnp.ndarray:
        """Apply the functional to solutions.

        Y: (..., n_nodes) full vectors, or (..., n_free) restricted ones if
        ``profile`` (a DirichletProfile) and per-sample ``bc_values`` are
        given (reference _complete, flux.py:201-210)."""
        if profile is not None:
            Y = profile.scatter_full(bc_values, free_values=Y)
        f = jnp.asarray(self.functional, dtype=jnp.result_type(Y))
        return Y @ f
