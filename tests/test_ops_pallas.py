"""Pallas stencil kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from generative_physics_informed_pde_tpu import fem
from generative_physics_informed_pde_tpu.ops import (apply_stencil,
                                                     apply_stencil_reference)


def test_pallas_stencil_matches_reference():
    grid = fem.StructuredTriGrid(8, 8)
    op = fem.StencilOperator(grid)
    prof = fem.DirichletProfile(grid)
    rng = np.random.default_rng(0)
    B = 16
    alphas = jnp.asarray(rng.uniform(0.5, 2.0, (B, grid.n_cells)),
                         dtype=jnp.float32)
    coefs = jnp.moveaxis(op.coefficients(alphas), 0, -1)  # (7, Ny, Nx, B)
    v = jnp.asarray(rng.normal(size=(grid.ny + 1, grid.nx + 1, B)),
                    dtype=jnp.float32)
    mask = jnp.asarray(prof.free_mask.reshape(grid.ny + 1, grid.nx + 1, 1),
                       dtype=jnp.float32)
    got = apply_stencil(coefs, v, mask, interpret=True)
    expect = apply_stencil_reference(coefs, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)


def test_pallas_stencil_odd_batch():
    grid = fem.StructuredTriGrid(4, 4)
    op = fem.StencilOperator(grid)
    rng = np.random.default_rng(1)
    B = 11  # forces padding to the batch block
    alphas = jnp.asarray(rng.uniform(0.5, 2.0, (B, grid.n_cells)),
                         dtype=jnp.float32)
    coefs = jnp.moveaxis(op.coefficients(alphas), 0, -1)
    v = jnp.asarray(rng.normal(size=(grid.ny + 1, grid.nx + 1, B)),
                    dtype=jnp.float32)
    mask = jnp.ones((grid.ny + 1, grid.nx + 1, 1), dtype=jnp.float32)
    got = apply_stencil(coefs, v, mask, interpret=True)
    expect = apply_stencil_reference(coefs, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-6, atol=1e-6)
