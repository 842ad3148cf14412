"""FEM core oracles: stencil vs COO vs dense assembly, manufactured
solutions, dense-vs-CG agreement, implicit-diff gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from generative_physics_informed_pde_tpu.fem import (
    StructuredTriGrid, StencilOperator, assembly_tensor, dense_stiffness,
    coo_matvec, DirichletProfile, LinearEllipticPhysics, rom_solve,
    stiffness_from_tensor,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("nx,ny", [(2, 2), (4, 4), (5, 3)])
def test_stencil_matches_dense(nx, ny, rng):
    grid = StructuredTriGrid(nx, ny)
    op = StencilOperator(grid)
    alpha = rng.uniform(0.5, 2.0, grid.n_cells)
    v = rng.normal(size=grid.n_nodes)
    K = dense_stiffness(grid, alpha)
    got = np.asarray(op.matvec(jnp.asarray(alpha), jnp.asarray(v)))
    np.testing.assert_allclose(got, K @ v, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(coo_matvec(grid, alpha, v), K @ v, rtol=1e-12)


def test_stencil_diagonal(rng):
    grid = StructuredTriGrid(4, 4)
    op = StencilOperator(grid)
    alpha = rng.uniform(0.5, 2.0, grid.n_cells)
    K = dense_stiffness(grid, alpha)
    np.testing.assert_allclose(np.asarray(op.diagonal(jnp.asarray(alpha))),
                               np.diag(K), rtol=1e-12)


def test_assembly_tensor_matches_dense(rng):
    grid = StructuredTriGrid(4, 4)
    M = assembly_tensor(grid)
    alpha = rng.uniform(0.5, 2.0, grid.n_cells)
    np.testing.assert_allclose(M @ alpha, dense_stiffness(grid, alpha), rtol=1e-12)
    # symmetry and row-sum zero (pure Neumann stiffness)
    np.testing.assert_allclose(M, M.transpose(1, 0, 2), rtol=1e-12)
    np.testing.assert_allclose((M @ alpha).sum(1), 0.0, atol=1e-12)


def test_manufactured_solution_exact():
    """alpha=1, u(left)=0, u(right)=1 ('ND') => exact solution u = x, which
    is in the P1 space, so the solver must reproduce it to solver tolerance.
    """
    phys = LinearEllipticPhysics("fom", "ND", StructuredTriGrid(8, 8))
    alpha = jnp.ones(phys.grid.n_cells)
    theta = jnp.array([0.0, 0.0, 1.0, 1.0])
    bc_values = phys.profile.constrained_values(theta)
    y = phys.solve_full(alpha, bc_values)
    np.testing.assert_allclose(np.asarray(y), phys.grid.node_coords[:, 0],
                               atol=1e-8)


def test_ndp_linear_profile_exact():
    """For alpha=1 and NDP linear boundary profiles, u = a + b x + c y + d xy
    satisfying the BCs... the bilinear term is not in P1, so just check the
    boundary values are honoured and CG matches the dense direct solve."""
    phys = LinearEllipticPhysics("fom", "NDP", StructuredTriGrid(6, 6))
    rng = np.random.default_rng(1)
    theta = rng.uniform(-0.5, 0.5, 4)
    alpha = rng.uniform(0.5, 3.0, phys.grid.n_cells)
    bc_values = np.asarray(phys.profile.constrained_values(jnp.asarray(theta)))
    y_cg = np.asarray(phys.solve(jnp.asarray(alpha), jnp.asarray(bc_values)))
    y_direct = phys.solve_direct(alpha, bc_values)
    np.testing.assert_allclose(y_cg, y_direct, rtol=1e-7, atol=1e-9)
    y_full = np.asarray(phys.solve_full(jnp.asarray(alpha), jnp.asarray(bc_values)))
    np.testing.assert_allclose(y_full[phys.constrained_dofs], bc_values, atol=1e-12)


def test_batched_solve(rng):
    phys = LinearEllipticPhysics("fom", "NDP", StructuredTriGrid(4, 4))
    N = 5
    alphas = rng.uniform(0.5, 2.0, (N, phys.grid.n_cells))
    thetas = rng.uniform(-0.5, 0.5, (N, 4))
    bcv = np.asarray(phys.profile.constrained_values(jnp.asarray(thetas)))
    Y = np.asarray(phys.solve_batched(jnp.asarray(alphas), jnp.asarray(bcv)))
    assert Y.shape == (N, phys.dim_out)
    for n in range(N):
        np.testing.assert_allclose(Y[n], phys.solve_direct(alphas[n], bcv[n]),
                                   rtol=1e-7, atol=1e-9)


def test_solver_gradients_match_dense():
    """Implicit-diff VJP vs autodiff through a dense solve."""
    phys = LinearEllipticPhysics("fom", "ND", StructuredTriGrid(3, 3))
    rng = np.random.default_rng(2)
    alpha0 = jnp.asarray(rng.uniform(0.5, 2.0, phys.grid.n_cells))
    theta = jnp.array([0.0, 0.0, 1.0, 1.0])
    bcv = phys.profile.constrained_values(theta)
    w = jnp.asarray(rng.normal(size=phys.dim_out))

    def loss_cg(a):
        return jnp.dot(w, phys.solve(a, bcv))

    free, con = phys.free_dofs, phys.constrained_dofs
    M = jnp.asarray(assembly_tensor(phys.grid))

    def loss_dense(a):
        K = jnp.einsum("ijc,c->ij", M, a)
        f_eff = -K[jnp.ix_(jnp.asarray(free), jnp.asarray(con))] @ bcv
        y = jnp.linalg.solve(K[jnp.ix_(jnp.asarray(free), jnp.asarray(free))], f_eff)
        return jnp.dot(w, y)

    g_cg = jax.grad(loss_cg)(alpha0)
    g_dense = jax.grad(loss_dense)(alpha0)
    np.testing.assert_allclose(np.asarray(g_cg), np.asarray(g_dense),
                               rtol=1e-6, atol=1e-9)


def test_rom_solve_matches_direct(rng):
    grid = StructuredTriGrid(4, 4)
    prof = DirichletProfile(grid)
    M = jnp.asarray(assembly_tensor(grid))
    bc_dofs = jnp.asarray(prof.constrained_dofs)
    alpha = jnp.asarray(rng.uniform(0.5, 2.0, (3, grid.n_cells)))
    theta = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 4)))
    vals = prof.constrained_values(theta)
    F = jax.vmap(prof.scatter_full)(vals)
    Y = rom_solve(M, alpha, F, bc_dofs)
    phys = LinearEllipticPhysics("rom", "NDP", grid)
    for n in range(3):
        expect = phys.solve_direct(np.asarray(alpha[n]), np.asarray(vals[n]),
                                   only_free_dofs=False)
        np.testing.assert_allclose(np.asarray(Y[n]), expect, rtol=1e-9, atol=1e-11)


def test_stiffness_from_tensor_bc_rows(rng):
    grid = StructuredTriGrid(2, 2)
    prof = DirichletProfile(grid)
    M = jnp.asarray(assembly_tensor(grid))
    alpha = jnp.asarray(rng.uniform(0.5, 2.0, grid.n_cells))
    K = np.asarray(stiffness_from_tensor(M, alpha, jnp.asarray(prof.constrained_dofs)))
    for d in prof.constrained_dofs:
        row = np.zeros(grid.n_nodes)
        row[d] = 1.0
        np.testing.assert_allclose(K[d], row)


def test_volume_and_neumann_force():
    """Load vectors against quadrature identities: for f=1 the load sums to
    the domain area; for g=1 on a side it sums to the side length; and a
    manufactured Poisson problem with constant source solves correctly."""
    from generative_physics_informed_pde_tpu.fem import (volume_force,
                                                         neumann_force)
    grid = StructuredTriGrid(6, 6)
    f = jnp.ones(grid.n_cells)
    load = volume_force(grid, f)
    np.testing.assert_allclose(float(load.sum()), 1.0, rtol=1e-12)
    g = neumann_force(grid, "top", jnp.ones(grid.nx))
    np.testing.assert_allclose(float(g.sum()), 1.0, rtol=1e-12)
    assert g.shape == (grid.n_nodes,)

    # -u'' = 1 on the strip with u(0)=u(1)=0 (ND-style BC with u1=0):
    # exact u = x(1-x)/2, quadratic -> P1 solution interpolates it at nodes
    phys = LinearEllipticPhysics("fom", "ND", StructuredTriGrid(16, 16))
    alpha = jnp.ones(phys.grid.n_cells)
    bcv = jnp.zeros(phys.profile.n_constrained)
    f_full = volume_force(phys.grid, jnp.ones(phys.grid.n_cells))
    y = np.asarray(phys.solve_full(alpha, bcv, f_full=f_full))
    x = phys.grid.node_coords[:, 0]
    np.testing.assert_allclose(y, x * (1 - x) / 2, atol=2e-4)


def test_rom_solve_chunked_matches_unchunked(rng):
    """Large batches chunked through lax.map == single-shot solve."""
    from generative_physics_informed_pde_tpu.fem import rom_solve
    grid = StructuredTriGrid(4, 4)
    prof = DirichletProfile(grid)
    M = jnp.asarray(assembly_tensor(grid))
    bc = jnp.asarray(prof.constrained_dofs)
    B = 37
    alpha = jnp.asarray(rng.uniform(0.5, 2.0, (B, grid.n_cells)))
    F = jnp.zeros((B, grid.n_nodes)).at[:, bc].set(1.0)
    full = rom_solve(M, alpha, F, bc, max_chunk=10 ** 9)
    chunked = rom_solve(M, alpha, F, bc, max_chunk=8)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-10)
    # gradient path through the chunked solve
    g = jax.grad(lambda a: jnp.sum(rom_solve(M, a, F, bc, max_chunk=8) ** 2))(alpha)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_neumann_force_cache_not_shared_across_domain_sizes():
    """The side-edge cache must key on the physical grid spacing: two
    grids with the same resolution but different domain sizes were
    sharing cached unit-domain edge lengths (round-5 review, verified
    numerically: the 2x2-domain load summed to 1.0 instead of 2.0)."""
    from generative_physics_informed_pde_tpu.fem import (StructuredTriGrid,
                                                         neumann_force)

    g1 = StructuredTriGrid(4, 4, 1.0, 1.0)
    g2 = StructuredTriGrid(4, 4, 2.0, 2.0)
    # prime the cache with the unit grid, then hit the 2x2 one
    s1 = float(neumann_force(g1, "left", jnp.ones(g1.ny)).sum())
    s2 = float(neumann_force(g2, "left", jnp.ones(g2.ny)).sum())
    np.testing.assert_allclose(s1, 1.0, rtol=1e-12)   # side length ly=1
    np.testing.assert_allclose(s2, 2.0, rtol=1e-12)   # side length ly=2


def test_probe_and_randomfield_identity_semantics():
    """ndarray-field dataclasses use eq=False: hashing works (identity)
    instead of raising TypeError, and == doesn't raise on multi-point
    arrays."""
    from generative_physics_informed_pde_tpu.fem import (
        GaussianRandomField, Probe, StructuredTriGrid)

    grid = StructuredTriGrid(4, 4)
    p = Probe(grid, np.array([[0.25, 0.25], [0.5, 0.75]]))
    assert hash(p) == hash(p)
    assert p == p and not (p == Probe(grid, p.points))
    rf = GaussianRandomField.from_image(4, 4, 0.0, 1.0, 0.3)
    assert hash(rf) == hash(rf)
