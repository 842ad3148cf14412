"""Closed-form P1 stiffness assembly on structured triangular grids.

TPU-native replacement for FEniCS form assembly (reference:
physics/LinearElliptic.py:137-159 ``assemble_system``, bottleneck/ROM.py:46-55
assembly-tensor construction, and the implicit ``df.assemble(a)`` calls).

The weak form is ``a(u, v) = sum_c alpha_c * integral_c grad(u) . grad(v)``
with ``alpha`` piecewise constant (DG0).  On a uniform triangulation every
cell of the same orientation shares one constant 3x3 element matrix, so the
global stiffness action is expressible three equivalent ways, all provided
here:

1. ``assembly_tensor`` -- dense third-order tensor ``M[i, j, c]`` with
   ``K(alpha) = M @ alpha`` (used for the small coarse/ROM grids; mirrors
   bottleneck/ROM.py:46-55 but computed in closed form, no FEM library).
2. COO triples ``(rows, cols, cell, w)`` -- general gather/scatter form
   (used for oracles/tests).
3. ``StencilOperator`` -- a 7-point nodal stencil whose per-node
   coefficients are static linear images of ``alpha``; the stiffness
   matvec becomes shifted multiply-adds on the node grid.  This is the
   TPU hot path: pure VPU element-wise work with no scatters, fully
   fusable by XLA and batchable via ``vmap``.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np
import jax.numpy as jnp

from .grid import StructuredTriGrid


def element_stiffness(grid: StructuredTriGrid) -> np.ndarray:
    """(2, 3, 3) float64: unit-conductivity P1 element stiffness matrices
    for the lower (t=0) and upper (t=1) triangle orientations.

    Standard closed form: ``Ke[a,b] = area * (grad phi_a . grad phi_b)`` with
    ``grad phi_a = (b_a, c_a) / (2 area)``.
    """
    Ke = np.zeros((2, 3, 3), dtype=np.float64)
    for t in range(2):
        # representative cell: square (0, 0), triangle t
        p = grid.node_coords[grid.cells[t]]
        x, y = p[:, 0], p[:, 1]
        area = 0.5 * abs((x[1] - x[0]) * (y[2] - y[0]) - (x[2] - x[0]) * (y[1] - y[0]))
        b = np.array([y[1] - y[2], y[2] - y[0], y[0] - y[1]])
        c = np.array([x[2] - x[1], x[0] - x[2], x[1] - x[0]])
        Ke[t] = (np.outer(b, b) + np.outer(c, c)) / (4.0 * area)
    return Ke


def coo_triples(grid: StructuredTriGrid):
    """COO stiffness structure: arrays ``(rows, cols, cells, w)`` such that
    ``K(alpha)[rows[e], cols[e]] += w[e] * alpha[cells[e]]``."""
    Ke = element_stiffness(grid)
    cells = grid.cells  # (nc, 3)
    nc = grid.n_cells
    t = np.tile(np.array([0, 1]), nc // 2)
    a, b = np.meshgrid(np.arange(3), np.arange(3), indexing="ij")
    rows = cells[:, a.ravel()].ravel()
    cols = cells[:, b.ravel()].ravel()
    cell_ids = np.repeat(np.arange(nc), 9)
    w = Ke[t][:, a.ravel(), b.ravel()].ravel()
    return rows.astype(np.int32), cols.astype(np.int32), cell_ids.astype(np.int32), w


def assembly_tensor(grid: StructuredTriGrid, max_cells: int = 4096) -> np.ndarray:
    """Dense third-order assembly tensor ``M[i, j, c]`` with
    ``K_ij(alpha) = sum_c M[i,j,c] alpha_c``.

    Closed-form equivalent of the reference's FEniCS loop over DG0 basis
    vectors (bottleneck/ROM.py:46-55).  Intended for coarse grids only (the
    reference caps the ROM at 290 cells, ROM.py:43-44; we allow more but
    still guard against accidentally materialising a fine grid).
    """
    if grid.n_cells > max_cells:
        raise ValueError(
            f"assembly_tensor is for coarse grids (n_cells={grid.n_cells} > "
            f"{max_cells}); use StencilOperator for fine grids")
    nd = grid.n_nodes
    M = np.zeros((nd, nd, grid.n_cells), dtype=np.float64)
    rows, cols, cell_ids, w = coo_triples(grid)
    np.add.at(M, (rows, cols, cell_ids), w)
    return M


# --------------------------------------------------------------------------
# Stencil operator
# --------------------------------------------------------------------------

# Node-grid offsets reachable on the right-diagonal triangulation.
_OFFSETS = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, -1))

# The stiffness matrix is symmetric, so only the diagonal and the three
# "positive" directions are independent: coefs[-dir][y, x] ==
# coefs[+dir][y - dy, x - dx].  The symmetric form stores 4 grids instead
# of 7 -- on the TPU the stencil apply is HBM-bandwidth-bound, so this is
# a direct ~1.5x traffic cut (measured roofline: benchmarks/stencil_roofline.py).
_SYM_DIRS = ((1, 0), (0, 1), (1, 1))


def _stencil_table(grid: StructuredTriGrid):
    """For each stencil offset ``o`` the list of contributions
    ``(t, dya, dxa, weight)`` meaning: the coefficient of offset ``o`` at
    node ``(jy, jx)`` receives ``weight * alpha[t, jy - dya, jx - dxa]``
    (alpha zero-padded outside the cell grid).

    Derivation: vertex ``a`` of cell ``(t, ix, iy)`` sits at node
    ``(jx, jy) = (ix + dxa, iy + dya)`` and couples to vertex ``b`` at node
    offset ``o = pos_b - pos_a`` with weight ``Ke[t][a, b]``.
    """
    Ke = element_stiffness(grid)
    # local vertex node offsets (dx, dy) within the square, per cell type
    local = {
        0: [(0, 0), (1, 0), (1, 1)],  # lower
        1: [(0, 0), (1, 1), (0, 1)],  # upper
    }
    table = {o: [] for o in _OFFSETS}
    for t in range(2):
        for a in range(3):
            dxa, dya = local[t][a]
            for b in range(3):
                dxb, dyb = local[t][b]
                o = (dyb - dya, dxb - dxa)
                table[o].append((t, dya, dxa, float(Ke[t][a, b])))
    return table


@dataclasses.dataclass(frozen=True)
class StencilOperator:
    """Matrix-free stiffness action ``v -> K(alpha) v`` as a 7-point nodal
    stencil on the ``(ny+1, nx+1)`` node grid.

    All methods are pure jax functions of their array arguments; the
    connectivity is baked in as static Python data at construction.
    """

    grid: StructuredTriGrid

    @cached_property
    def _table(self):
        return _stencil_table(self.grid)

    # ------------------------------------------------------------ reshapes
    def alpha_to_cellgrid(self, alpha: jnp.ndarray) -> jnp.ndarray:
        """(..., n_cells) -> (..., ny, nx, 2) cell-grid layout."""
        g = self.grid
        return alpha.reshape(alpha.shape[:-1] + (g.ny, g.nx, 2))

    def to_nodegrid(self, v: jnp.ndarray) -> jnp.ndarray:
        g = self.grid
        return v.reshape(v.shape[:-1] + (g.ny + 1, g.nx + 1))

    def to_flat(self, v: jnp.ndarray) -> jnp.ndarray:
        return v.reshape(v.shape[:-2] + (self.grid.n_nodes,))

    # ---------------------------------------------------------------- core
    def coefficients(self, alpha: jnp.ndarray) -> jnp.ndarray:
        """(..., n_cells) conductivities -> (..., 7, ny+1, nx+1) stencil
        coefficient grids (static linear map; XLA fuses the shifted adds)."""
        g = self.grid
        a = self.alpha_to_cellgrid(alpha)
        batch = a.shape[:-3]
        pad = [(0, 0)] * len(batch) + [(1, 1), (1, 1), (0, 0)]
        ap = jnp.pad(a, pad)
        ny1, nx1 = g.ny + 1, g.nx + 1
        coefs = []
        for o in _OFFSETS:
            c = jnp.zeros(batch + (ny1, nx1), dtype=alpha.dtype)
            for (t, dya, dxa, w) in self._table[o]:
                y0 = 1 - dya
                x0 = 1 - dxa
                sl = ap[..., y0:y0 + ny1, x0:x0 + nx1, t]
                c = c + w * sl
            coefs.append(c)
        return jnp.stack(coefs, axis=-3)

    def coefficients_sym(self, alpha: jnp.ndarray) -> jnp.ndarray:
        """(..., n_cells) -> (..., 4, ny+1, nx+1): the symmetric stencil
        form ``[diag, c_N, c_E, c_D]`` with ``c_dir[y, x] = K[(y,x),
        (y,x)+dir]`` for dir in (1,0), (0,1), (1,1).  Stores 4 grids
        instead of 7 (K is symmetric); the apply reads ~2/3 the bytes."""
        g = self.grid
        a = self.alpha_to_cellgrid(alpha)
        batch = a.shape[:-3]
        pad = [(0, 0)] * len(batch) + [(1, 1), (1, 1), (0, 0)]
        ap = jnp.pad(a, pad)
        ny1, nx1 = g.ny + 1, g.nx + 1
        coefs = []
        for o in ((0, 0),) + _SYM_DIRS:
            c = jnp.zeros(batch + (ny1, nx1), dtype=alpha.dtype)
            for (t, dya, dxa, w) in self._table[o]:
                y0 = 1 - dya
                x0 = 1 - dxa
                c = c + w * ap[..., y0:y0 + ny1, x0:x0 + nx1, t]
            coefs.append(c)
        return jnp.stack(coefs, axis=-3)

    def apply_coeff(self, coefs: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        """Apply stencil: coefs (..., 7, Ny, Nx), v (..., Ny, Nx) -> (..., Ny, Nx)."""
        ny1, nx1 = self.grid.ny + 1, self.grid.nx + 1
        batch = v.shape[:-2]
        pad = [(0, 0)] * len(batch) + [(1, 1), (1, 1)]
        vp = jnp.pad(v, pad)
        out = jnp.zeros_like(v)
        for k, (oy, ox) in enumerate(_OFFSETS):
            sl = vp[..., 1 + oy:1 + oy + ny1, 1 + ox:1 + ox + nx1]
            out = out + coefs[..., k, :, :] * sl
        return out

    def matvec(self, alpha: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        """Full stiffness matvec on flat dof vectors:
        alpha (n_cells,), v (n_nodes,) -> (n_nodes,)."""
        coefs = self.coefficients(alpha)
        return self.to_flat(self.apply_coeff(coefs, self.to_nodegrid(v)))

    def diagonal(self, alpha: jnp.ndarray) -> jnp.ndarray:
        """diag(K(alpha)) as a flat (n_nodes,) vector (Jacobi preconditioner)."""
        coefs = self.coefficients(alpha)
        return self.to_flat(coefs[..., 0, :, :])

    # ------------------------------------------------- adjoint cell energy
    def cell_bilinear(self, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        """Per-cell bilinear contraction ``e_c = u_loc^T Ke_c v_loc``, i.e.
        the gradient of ``u^T K(alpha) v`` w.r.t. ``alpha``  (used by the
        implicit-diff VJP of the CG solver)."""
        Ke = jnp.asarray(element_stiffness(self.grid), dtype=u.dtype)
        cells = jnp.asarray(self.grid.cells)
        u_loc = u[..., cells]  # (..., nc, 3)
        v_loc = v[..., cells]
        nc = self.grid.n_cells
        t = jnp.asarray(np.tile(np.array([0, 1]), nc // 2))
        Ke_c = Ke[t]  # (nc, 3, 3)
        return jnp.einsum("...ca,cab,...cb->...c", u_loc, Ke_c, v_loc)


def coo_matvec(grid: StructuredTriGrid, alpha, v):
    """Reference gather/scatter stiffness matvec (oracle for tests)."""
    rows, cols, cell_ids, w = coo_triples(grid)
    contrib = w * np.asarray(alpha)[cell_ids] * np.asarray(v)[cols]
    out = np.zeros(grid.n_nodes, dtype=np.float64)
    np.add.at(out, rows, contrib)
    return out


def dense_stiffness(grid: StructuredTriGrid, alpha) -> np.ndarray:
    """Dense K(alpha) (oracle for tests / small grids)."""
    rows, cols, cell_ids, w = coo_triples(grid)
    K = np.zeros((grid.n_nodes, grid.n_nodes), dtype=np.float64)
    np.add.at(K, (rows, cols), w * np.asarray(alpha)[cell_ids])
    return K
