"""Batch-last fast-path solver vs the vmapped reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from generative_physics_informed_pde_tpu import fem


def test_batched_solver_matches_vmap():
    phys = fem.LinearEllipticPhysics("fom", "NDP", fem.StructuredTriGrid(8, 8))
    rng = np.random.default_rng(0)
    B = 7
    alphas = jnp.asarray(rng.uniform(0.5, 2.0, (B, phys.grid.n_cells)))
    thetas = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 4)))
    vals = phys.profile.constrained_values(thetas)
    Y_fast = phys.solve_batched(alphas, vals)
    Y_ref = phys.solve_batched_vmap(alphas, vals)
    np.testing.assert_allclose(np.asarray(Y_fast), np.asarray(Y_ref),
                               rtol=1e-7, atol=1e-9)


def test_batched_solver_gradients_match_vmap():
    phys = fem.LinearEllipticPhysics("fom", "ND", fem.StructuredTriGrid(4, 4))
    rng = np.random.default_rng(1)
    B = 3
    alphas = jnp.asarray(rng.uniform(0.5, 2.0, (B, phys.grid.n_cells)))
    thetas = jnp.tile(jnp.array([0.0, 0.0, 1.0, 1.0]), (B, 1))
    vals = phys.profile.constrained_values(thetas)
    w = jnp.asarray(rng.normal(size=(B, phys.dim_out)))

    g_fast = jax.grad(lambda a: jnp.sum(w * phys.solve_batched(a, vals)))(alphas)
    g_ref = jax.grad(lambda a: jnp.sum(w * phys.solve_batched_vmap(a, vals)))(alphas)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-9)


def test_batched_solver_bc_gradient():
    phys = fem.LinearEllipticPhysics("fom", "NDP", fem.StructuredTriGrid(4, 4))
    rng = np.random.default_rng(2)
    B = 2
    alphas = jnp.asarray(rng.uniform(0.5, 2.0, (B, phys.grid.n_cells)))
    vals0 = jnp.asarray(rng.uniform(-0.5, 0.5,
                                    (B, phys.profile.n_constrained)))

    def loss(v):
        return jnp.sum(phys.solve_batched(alphas, v) ** 2)

    g = jax.grad(loss)(vals0)
    # finite-difference check one coordinate
    e = 1e-6
    d = jnp.zeros_like(vals0).at[1, 3].set(e)
    fd = (loss(vals0 + d) - loss(vals0 - d)) / (2 * e)
    np.testing.assert_allclose(float(g[1, 3]), float(fd), rtol=1e-4)


def test_mixed_dtype_bc_gradient():
    """f32 alphas + f64 bc_values is the natural pairing on the
    CPU-oracle path (constrained_values returns float64 numpy); the VJP
    must return cotangents in the PRIMAL dtypes or custom_vjp rejects
    them."""
    phys = fem.LinearEllipticPhysics("fom", "NDP", fem.StructuredTriGrid(4, 4))
    rng = np.random.default_rng(3)
    B = 2
    alphas = jnp.asarray(rng.uniform(0.5, 2.0, (B, phys.grid.n_cells)),
                         dtype=jnp.float32)
    vals = jnp.asarray(rng.uniform(-0.5, 0.5,
                                   (B, phys.profile.n_constrained)),
                       dtype=jnp.float64)
    if vals.dtype != jnp.float64:  # x64 disabled -> nothing mixed to test
        import pytest
        pytest.skip("requires x64")
    ga, gv = jax.grad(
        lambda a, v: jnp.sum(phys.solve_batched(a, v) ** 2),
        argnums=(0, 1))(alphas, vals)
    assert ga.dtype == alphas.dtype
    assert gv.dtype == vals.dtype
    assert bool(jnp.all(jnp.isfinite(ga))) and bool(jnp.all(jnp.isfinite(gv)))


def test_precond_string_validation():
    import pytest
    from generative_physics_informed_pde_tpu.fem.batched_solver import (
        make_batched_fom_solver)
    phys = fem.LinearEllipticPhysics("fom", "NDP", fem.StructuredTriGrid(8, 8))
    with pytest.raises(ValueError, match="precond"):
        make_batched_fom_solver(phys.op, phys.profile, precond="MG")


def test_sym_apply_hard_guard_on_tpu_at_256(monkeypatch):
    """sym=True faulted the v5e worker at 256^2 B=64 (PARITY round 4);
    the builder must refuse it at >=256 on TPU instead of letting a
    settable flag kill the process."""
    import pytest
    from generative_physics_informed_pde_tpu.fem import batched_solver
    from generative_physics_informed_pde_tpu.utils import backend

    monkeypatch.setattr(backend, "effective_platform", lambda: "tpu")
    phys = fem.LinearEllipticPhysics("fom", "NDP",
                                     fem.StructuredTriGrid(256, 256))
    with pytest.raises(ValueError, match="crashed the TPU worker"):
        batched_solver.make_batched_fom_solver(
            phys.op, phys.profile, sym=True)
    # below the faulting boundary the flag stays available for A/B runs
    phys64 = fem.LinearEllipticPhysics("fom", "NDP",
                                       fem.StructuredTriGrid(64, 64))
    batched_solver.make_batched_fom_solver(phys64.op, phys64.profile,
                                           sym=True)
