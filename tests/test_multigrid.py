"""Multigrid preconditioner: exactness of solves, transfer operators."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from generative_physics_informed_pde_tpu import fem
from generative_physics_informed_pde_tpu.fem.batched_solver import (
    make_batched_fom_solver)
from generative_physics_informed_pde_tpu.fem.multigrid import (
    MultigridPreconditioner, _prolong, _restrict)


def test_prolong_restrict_adjoint():
    rng = np.random.default_rng(0)
    Nyc, Nxc, B = 5, 5, 3
    Ny, Nx = 2 * Nyc - 1, 2 * Nxc - 1
    e = jnp.asarray(rng.normal(size=(Nyc, Nxc, B)))
    r = jnp.asarray(rng.normal(size=(Ny, Nx, B)))
    # <P e, r> == <e, R r> (transfer operators are adjoint)
    lhs = float(jnp.sum(_prolong(e) * r))
    rhs = float(jnp.sum(e * _restrict(r)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_prolong_exact_for_linear():
    """Linear functions are reproduced exactly by the P1 prolongation."""
    Nyc = Nxc = 5
    y, x = np.meshgrid(np.linspace(0, 1, Nyc), np.linspace(0, 1, Nxc),
                       indexing="ij")
    e = jnp.asarray((1 + 2 * x - 0.5 * y)[..., None])
    fine = np.asarray(_prolong(e))[..., 0]
    yf, xf = np.meshgrid(np.linspace(0, 1, 2 * Nyc - 1),
                         np.linspace(0, 1, 2 * Nxc - 1), indexing="ij")
    np.testing.assert_allclose(fine, 1 + 2 * xf - 0.5 * yf, rtol=1e-12)


@pytest.mark.slow
def test_mg_solver_matches_direct_high_contrast():
    phys = fem.LinearEllipticPhysics("fom", "NDP", fem.StructuredTriGrid(32, 32))
    rng = np.random.default_rng(1)
    B = 3
    # strong contrast (e^{+-3} ~ 400:1)
    alphas = jnp.asarray(np.exp(rng.normal(0, 1.0, (B, phys.grid.n_cells))))
    vals = phys.profile.constrained_values(
        jnp.asarray(rng.uniform(-0.5, 0.5, (B, 4))))
    solve = jax.jit(make_batched_fom_solver(phys.op, phys.profile,
                                            precond="mg"))
    Y = solve(alphas, vals)
    for n in range(B):
        y0 = phys.solve_direct(np.asarray(alphas[n]), np.asarray(vals[n]))
        np.testing.assert_allclose(np.asarray(Y[n]), y0, rtol=1e-6,
                                   atol=1e-9)


def test_mg_levels():
    mg = MultigridPreconditioner.for_grid(fem.StructuredTriGrid(64, 64))
    assert mg.num_levels == 5  # 64 -> 32 -> 16 -> 8 -> 4
    mg2 = MultigridPreconditioner.for_grid(fem.StructuredTriGrid(4, 4))
    assert mg2.num_levels == 1


@pytest.mark.slow
def test_bf16_vcycle_true_residual_high_contrast():
    """ADVICE r2: bf16 rounding makes the V-cycle application
    input-dependent, so standard PCG with recurrence-residual termination
    could silently under-converge on high-contrast fields.  Check the
    TRUE post-solve residual (not the CG recurrence) on config-3-grade
    contrast (lognormal sigma=1.3 -> worst-case ~2e4:1 across the batch)
    at 128^2 with the bf16 preconditioner."""
    n = 128
    phys = fem.LinearEllipticPhysics("fom", "ND", fem.StructuredTriGrid(n, n))
    rng = np.random.default_rng(3)
    B = 4
    alphas = jnp.asarray(
        np.exp(rng.normal(0, 1.3, (B, phys.grid.n_cells))), jnp.float32)
    vals = phys.profile.constrained_values(
        jnp.tile(jnp.array([[0.0, 0.0, 1.0, 1.0]], jnp.float32), (B, 1)))
    tol = 2e-6
    solve = jax.jit(make_batched_fom_solver(
        phys.op, phys.profile, precond="mg", precond_dtype="bfloat16",
        tol=tol))
    Yf = solve(alphas, vals)
    # true residual of the reduced system K_ff y_f = f_eff: apply the
    # full operator to y_f scattered with ZERO constrained values, so the
    # free-dof rows give exactly K_ff y_f
    free = np.asarray(phys.profile.free_dofs)
    f_eff = phys.effective_force(alphas, vals)[:, free]
    y0_full = jnp.zeros((B, phys.dim_out_all),
                        alphas.dtype).at[:, free].set(Yf)
    Ky = phys.op.matvec(alphas, y0_full)[:, free]
    rel = (np.linalg.norm(np.asarray(Ky - f_eff), axis=1)
           / np.linalg.norm(np.asarray(f_eff), axis=1))
    assert np.all(np.isfinite(np.asarray(Yf)))
    # allow one order of magnitude over the recurrence tol for the
    # true-vs-recurrence gap; silent under-convergence would be >> this
    assert np.all(rel < 10 * tol), rel


@pytest.mark.slow
def test_mg_gradients_match_jacobi():
    phys = fem.LinearEllipticPhysics("fom", "ND", fem.StructuredTriGrid(32, 32))
    rng = np.random.default_rng(2)
    B = 2
    alphas = jnp.asarray(np.exp(rng.normal(0, 0.5, (B, phys.grid.n_cells))))
    vals = phys.profile.constrained_values(
        jnp.tile(jnp.array([[0.0, 0.0, 1.0, 1.0]]), (B, 1)))
    w = jnp.asarray(rng.normal(size=(B, phys.dim_out)))
    g_mg = jax.grad(lambda a: jnp.sum(w * jax.jit(make_batched_fom_solver(
        phys.op, phys.profile, precond="mg"))(a, vals)))(alphas)
    g_j = jax.grad(lambda a: jnp.sum(w * jax.jit(make_batched_fom_solver(
        phys.op, phys.profile, precond="jacobi"))(a, vals)))(alphas)
    np.testing.assert_allclose(np.asarray(g_mg), np.asarray(g_j), rtol=1e-6,
                               atol=1e-10)


def test_precond_dtype_auto_default(monkeypatch):
    """TPU auto default: bf16 V-cycle only up to 256^2.  Past that the
    bf16 rounding compounds across the deeper hierarchy and costs PCG
    iterations instead of saving bytes (measured on v5e: 512^2 f32 95.5
    vs bf16 55.0 solves/s; 1024^2 f32 25.5 vs bf16 2.5 with the true
    residual stalled at the iteration cap -- mg_bench.py --scale)."""
    from generative_physics_informed_pde_tpu.utils import backend
    from generative_physics_informed_pde_tpu.fem import batched_solver

    picked = {}
    real = batched_solver.make_batched_fom_solver

    def probe(nx, platform):
        monkeypatch.setattr(backend, "effective_platform", lambda: platform)
        phys = fem.LinearEllipticPhysics(
            "fom", "ND", fem.StructuredTriGrid(nx, nx))
        # intercept the MG construction to read the chosen dtype
        from generative_physics_informed_pde_tpu.fem.multigrid import (
            MultigridPreconditioner)
        orig = MultigridPreconditioner.for_grid.__func__

        def spy(cls, grid, **kw):
            picked["dtype"] = kw.get("dtype", "float32")
            return orig(cls, grid, **kw)

        monkeypatch.setattr(MultigridPreconditioner, "for_grid",
                            classmethod(spy))
        real(phys.op, phys.profile, precond="mg")
        return picked["dtype"]

    assert probe(64, "tpu") == "bfloat16"
    assert probe(256, "tpu") == "bfloat16"
    assert probe(512, "tpu") == "float32"
    assert probe(64, "cpu") == "float32"


def test_mg_levels_off_power_of_two():
    """The coarsening walk (multigrid.for_grid) admits any jointly-even
    dims: 96 -> 48 -> 24 -> 12 -> 6 and 128x64 -> 8x4 (both dims halve
    per level; the even-ness of BOTH dims gates each step)."""
    mg = MultigridPreconditioner.for_grid(fem.StructuredTriGrid(96, 96))
    assert mg.num_levels == 5  # 96 -> 48 -> 24 -> 12 -> 6
    mg2 = MultigridPreconditioner.for_grid(fem.StructuredTriGrid(128, 64))
    assert mg2.num_levels == 5  # (128,64) -> ... -> (8,4)
    mg3 = MultigridPreconditioner.for_grid(fem.StructuredTriGrid(100, 100))
    assert mg3.num_levels == 3  # 100 -> 50 -> 25 (odd stops it)


def test_auto_precond_envelope():
    """VERDICT r3 item 6: the auto gate now admits non-power-of-two
    even grids >= 64 (MG measured 2.9-12.7x faster than Jacobi there,
    benchmarks/mg_bench.py --envelope), and falls back LOUDLY -- with a
    warning naming the reason -- when an odd dim forces Jacobi at a
    size where that costs real throughput."""
    import warnings

    phys = fem.LinearEllipticPhysics("fom", "NDP",
                                     fem.StructuredTriGrid(96, 96))
    rng = np.random.default_rng(3)
    B = 2
    alphas = jnp.asarray(
        np.exp(rng.normal(0, 0.8, (B, phys.grid.n_cells))),
        dtype=jnp.float32)
    vals = jnp.asarray(phys.profile.constrained_values(
        jnp.asarray(rng.uniform(-0.5, 0.5, (B, 4)))), dtype=jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # auto->mg must NOT warn here
        solve = jax.jit(make_batched_fom_solver(phys.op, phys.profile,
                                                precond="auto"))
    Y = solve(alphas, vals)
    y0 = phys.solve_direct(np.asarray(alphas[0], np.float64),
                           np.asarray(vals[0], np.float64))
    np.testing.assert_allclose(np.asarray(Y[0]), y0, rtol=5e-3, atol=1e-6)

    # odd dim at >=64: still correct, but warns about the Jacobi cliff
    phys_odd = fem.LinearEllipticPhysics("fom", "NDP",
                                         fem.StructuredTriGrid(65, 64))
    with pytest.warns(UserWarning, match="odd grid dimension"):
        make_batched_fom_solver(phys_odd.op, phys_odd.profile,
                                precond="auto")
    # small odd grids stay silent (Jacobi is fine there)
    phys_small = fem.LinearEllipticPhysics("fom", "NDP",
                                           fem.StructuredTriGrid(17, 16))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        make_batched_fom_solver(phys_small.op, phys_small.profile,
                                precond="auto")
