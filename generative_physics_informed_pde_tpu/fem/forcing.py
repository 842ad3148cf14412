"""Force-vector assembly: volumetric sources and Neumann boundary fluxes.

Completes the Neumann side of the BC stack (reference:
fawkes/BoundaryConditions.py NeumannSpecification/NeumannBoundaryCondition,
``assemble_flux``; physics/BoundaryConditions.py:249-252
``assemble_vanilla_force_vector``).  Both reference problem families use a
zero source (LinearEllipticFactories.py:165-171,223-233), so these helpers
exist for API completeness and for users defining richer problems:

* ``volume_force``: ``f_i = integral f phi_i dx`` for piecewise-constant
  (DG0) sources -- each P1 vertex of a cell receives ``area/3 * f_c``.
* ``neumann_force``: ``f_i = integral g phi_i ds`` over a named boundary
  side with piecewise-constant edge flux ``g`` -- each edge endpoint
  receives ``len/2 * g_e``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .grid import StructuredTriGrid


def volume_force(grid: StructuredTriGrid, f_cells: jnp.ndarray) -> jnp.ndarray:
    """(..., n_cells) DG0 source -> (..., n_nodes) load vector."""
    cells = jnp.asarray(grid.cells.astype(np.int32))
    areas = jnp.asarray(grid.cell_areas, dtype=jnp.result_type(f_cells))
    contrib = (areas / 3.0) * f_cells                     # (..., nc)
    out = jnp.zeros(f_cells.shape[:-1] + (grid.n_nodes,),
                    dtype=contrib.dtype)
    for a in range(3):
        out = out.at[..., cells[:, a]].add(contrib)
    return out


_SIDE_EDGES = {}


def _side_edges(grid: StructuredTriGrid, side: str):
    """(n_edges, 2) node-id pairs + edge length along one boundary side."""
    # hx/hy in the key: same-resolution grids over DIFFERENT physical
    # domains must not share cached edge lengths
    key = (grid.nx, grid.ny, float(grid.hx), float(grid.hy), side)
    if key not in _SIDE_EDGES:
        nodes = grid.boundary_nodes(side)
        coords = grid.node_coords[nodes]
        order = np.argsort(coords[:, 1] if side in ("left", "right")
                           else coords[:, 0])
        nodes = nodes[order]
        pairs = np.stack([nodes[:-1], nodes[1:]], axis=1)
        length = (grid.hy if side in ("left", "right") else grid.hx)
        _SIDE_EDGES[key] = (pairs.astype(np.int32), length)
    return _SIDE_EDGES[key]


def neumann_force(grid: StructuredTriGrid, side: str,
                  g_edges: jnp.ndarray) -> jnp.ndarray:
    """(..., n_side_edges) edge fluxes -> (..., n_nodes) load vector."""
    pairs, length = _side_edges(grid, side)
    pairs = jnp.asarray(pairs)
    contrib = 0.5 * length * g_edges
    out = jnp.zeros(g_edges.shape[:-1] + (grid.n_nodes,),
                    dtype=jnp.result_type(g_edges))
    out = out.at[..., pairs[:, 0]].add(contrib)
    out = out.at[..., pairs[:, 1]].add(contrib)
    return out
