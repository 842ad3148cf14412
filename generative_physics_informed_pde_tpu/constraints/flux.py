"""Flux-continuity constraints across coarse-cell boundaries.

TPU-native replacement for ``FluxConstraintReducedOrderModel`` / ``FluxForm``
(reference: bottleneck/flux.py:7-158).  The reference assembles, per coarse
cell Q, the FEniCS form ``integral_{dQ} alpha grad(u) . n`` by geometric
facet matching (midpoint collinearity, flux.py:107-126) and derivative
assembly.  On the nested structured triangulation this has a closed form:
each fine edge on dQ contributes ``alpha_c * (grad phi_a|_c . n) * |e|``
for the three P1 dofs of the fine cell c on the INSIDE of Q, with n the
outward normal of Q.

Conventions matching the reference:

* interior coarse facets: one-sided evaluation (the reference uses the
  FEniCS '+' restriction, flux.py:29-31; we take the inside of Q, the
  physically meaningful side);
* coarse facets on the Dirichlet (left/right) domain boundary: exterior
  ``ds`` integral from the inside (flux.py:123-124);
* coarse facets on the top/bottom domain boundary: SKIPPED -- the
  reference appends a dS measure there which integrates to zero over
  exterior facets (flux.py:126); the true flux vanishes there anyway
  (zero Neumann).

Because the constraint is linear in both alpha (per fine cell) and u, the
whole operator is a static sparse 3-tensor assembled once on the host:
``Gamma(alpha)[q, i] = sum_e w_e * alpha[c_e]`` over entries with
``(q_e, i_e)`` -- evaluated on device as one scatter-add, vmapped over
samples.

NOTE: the reference's reduced right-hand side is computed from
``self.Gamma`` which is never assigned (flux.py:64,153) and therefore is
always zero -- a latent bug.  We implement the correct reduction
``alpha_rhs = -Gamma[:, constrained] @ y_c``.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np
import jax.numpy as jnp

from ..fem.grid import StructuredTriGrid


def _cell_gradients(grid: StructuredTriGrid, cell_id: int) -> np.ndarray:
    """(3, 2) constant P1 basis gradients on one triangle."""
    p = grid.node_coords[grid.cells[cell_id]]
    x, y = p[:, 0], p[:, 1]
    det = (x[1] - x[0]) * (y[2] - y[0]) - (x[2] - x[0]) * (y[1] - y[0])
    b = np.array([y[1] - y[2], y[2] - y[0], y[0] - y[1]]) / det
    c = np.array([x[2] - x[1], x[0] - x[2], x[1] - x[0]]) / det
    return np.stack([b, c], axis=1)


def _locate_cell(grid: StructuredTriGrid, point: np.ndarray) -> int:
    """Cell id containing a (strictly interior) point."""
    ix, iy, fx, fy = grid.locate(point[None, :])
    t = 0 if fx[0] >= fy[0] else 1
    return int((iy[0] * grid.nx + ix[0]) * 2 + t)


@dataclasses.dataclass(frozen=True)
class FluxConstraintOperator:
    """Static flux-constraint assembly data for a (coarse, fine) grid pair."""

    coarse: StructuredTriGrid
    fine: StructuredTriGrid

    @property
    def n_constraints(self) -> int:
        return self.coarse.n_cells

    @cached_property
    def _entries(self):
        """COO entries (q, i, c, w): constraint q, fine dof i, fine cell c,
        weight w."""
        fine, coarse = self.fine, self.coarse
        refine = fine.nx // coarse.nx
        if (refine * coarse.nx != fine.nx
                or fine.ny // coarse.ny * coarse.ny != fine.ny
                or fine.ny // coarse.ny != refine):
            # unequal x/y refinement would split coarse edges into the
            # wrong number of sub-edges and put coarse diagonals off the
            # fine edge lattice -- silently wrong constraint weights
            raise ValueError(
                f"fine grid ({fine.nx}x{fine.ny}) must refine coarse "
                f"({coarse.nx}x{coarse.ny}) by the SAME integer factor "
                "on both axes")
        eps = 1e-9

        qs, is_, cs, ws = [], [], [], []
        for q in range(coarse.n_cells):
            verts = coarse.node_coords[coarse.cells[q]]
            for a in range(3):
                p0, p1 = verts[a], verts[(a + 1) % 3]
                edge = p1 - p0
                length = np.linalg.norm(edge)
                tangent = edge / length
                # outward normal: rotate tangent by -90deg (cells are CCW)
                normal = np.array([tangent[1], -tangent[0]])
                # skip top/bottom domain-boundary facets (see module doc)
                on_bottom = (abs(p0[1]) < eps and abs(p1[1]) < eps)
                on_top = (abs(p0[1] - coarse.ly) < eps
                          and abs(p1[1] - coarse.ly) < eps)
                if on_bottom or on_top:
                    continue
                # split into fine sub-edges
                n_sub = refine
                sub_len = length / n_sub
                for s in range(n_sub):
                    mid = p0 + (s + 0.5) * (edge / n_sub)
                    inside_pt = mid - eps * 10 * normal
                    c = _locate_cell(fine, inside_pt)
                    grads = _cell_gradients(fine, c)  # (3, 2)
                    w = grads @ normal * sub_len      # (3,)
                    for local, dof in enumerate(fine.cells[c]):
                        qs.append(q)
                        is_.append(int(dof))
                        cs.append(c)
                        ws.append(float(w[local]))
        return (np.asarray(qs, dtype=np.int32), np.asarray(is_, dtype=np.int32),
                np.asarray(cs, dtype=np.int32), np.asarray(ws, dtype=np.float64))

    def gamma_full(self, alpha: jnp.ndarray) -> jnp.ndarray:
        """Full constraint matrix (n_constraints, n_fine_nodes) for one
        conductivity field alpha (n_fine_cells,)."""
        q, i, c, w = self._entries
        vals = jnp.asarray(w, dtype=alpha.dtype) * alpha[jnp.asarray(c)]
        G = jnp.zeros((self.n_constraints, self.fine.n_nodes),
                      dtype=alpha.dtype)
        return G.at[jnp.asarray(q), jnp.asarray(i)].add(vals)

    def assemble_reduced(self, alpha: jnp.ndarray, bc_values: jnp.ndarray,
                         free_dofs: np.ndarray, constrained_dofs: np.ndarray):
        """(Gamma_reduced, alpha_rhs): constraints on free dofs and the
        right-hand side carrying the Dirichlet values
        (reference: flux.py:143-158, with the rhs bug fixed)."""
        G = self.gamma_full(alpha)
        G_red = G[:, jnp.asarray(free_dofs)]
        rhs = -G[:, jnp.asarray(constrained_dofs)] @ bc_values.astype(G.dtype)
        return G_red, rhs
