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


def test_pallas_sym_stencil_matches_reference():
    """Symmetric 4-grid form == 7-point form (both kernels)."""
    from generative_physics_informed_pde_tpu.ops import stencil as st

    grid = fem.StructuredTriGrid(12, 12)
    op = fem.StencilOperator(grid)
    prof = fem.DirichletProfile(grid)
    rng = np.random.default_rng(2)
    B = 20
    Ny = Nx = grid.ny + 1
    alphas = jnp.asarray(rng.uniform(0.5, 2.0, (B, grid.n_cells)),
                         dtype=jnp.float32)
    coefs = jnp.moveaxis(op.coefficients(alphas), 0, -1)
    coefs4 = jnp.moveaxis(op.coefficients_sym(alphas), 0, -1)
    v = jnp.asarray(rng.normal(size=(Ny, Nx, B)), dtype=jnp.float32)
    mask = jnp.asarray(prof.free_mask.reshape(Ny, Nx, 1), dtype=jnp.float32)
    expect = np.asarray(apply_stencil_reference(coefs, mask * v, mask))
    got = st.apply_stencil_sym(coefs4, mask * v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6, atol=1e-6)


def test_pallas_sym_blocked_matches_reference():
    """Blocked-batch layout kernel: pad/unpad round-trip + exact apply,
    including pre-masking semantics (kernel(v) == mask*K*(mask*v)) and
    zero halo on the output."""
    from generative_physics_informed_pde_tpu.ops import stencil as st

    grid = fem.StructuredTriGrid(33, 33)  # odd size forces row/col padding
    op = fem.StencilOperator(grid)
    prof = fem.DirichletProfile(grid)
    rng = np.random.default_rng(3)
    B = 140  # forces a second batch block
    Ny = Nx = grid.ny + 1
    alphas = jnp.asarray(rng.uniform(0.5, 2.0, (B, grid.n_cells)),
                         dtype=jnp.float32)
    coefs = jnp.moveaxis(op.coefficients(alphas), 0, -1)
    mask2 = prof.free_mask.reshape(Ny, Nx)
    mask = jnp.asarray(mask2[..., None], dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Ny, Nx)), dtype=jnp.float32)
    expect = np.moveaxis(np.asarray(apply_stencil_reference(
        coefs, mask * jnp.moveaxis(v, 0, -1), mask)), -1, 0)

    TY = st.choose_tile_rows(Ny, Nx)
    c_halo = st.pad_coefs_blocked(op.coefficients_sym(alphas), Ny, Nx, TY)
    mb = jnp.asarray(st.mask_blocked(mask2.astype(np.float32), TY))
    vb = st.pad_blocked(v, Ny, Nx, TY)  # deliberately unmasked input
    out = st.apply_stencil_sym_blocked(c_halo, vb, mb, TY=TY, interpret=True)
    got = np.asarray(st.unpad_blocked(out, B, Ny, Nx))
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)
    # halo rows written and zero
    assert float(jnp.abs(out[:, 0]).max()) == 0.0
    assert float(jnp.abs(out[:, -1]).max()) == 0.0
    # round-trip
    np.testing.assert_allclose(
        np.asarray(st.unpad_blocked(vb, B, Ny, Nx)), np.asarray(v))


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
