"""Virtual observables: constraint residuals at the true solution,
linear-Gaussian conditioning oracle, precision learning, energy VO."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from generative_physics_informed_pde_tpu import fem
from generative_physics_informed_pde_tpu.constraints import (
    QuerryPointEnsemble, CoarseGrainedResidualSampler,
    GaussianSketchingSampler, RadialBasisFunctionSampler,
    FluxConstrainSampler, ConcatenatedSamplers, VirtualObservablesEnsemble,
    EnergyVirtualObservablesEnsemble, FluxConstraintOperator,
    build_virtual_observables_ensemble, condition_ensemble)


@pytest.fixture(scope="module")
def setup():
    physics = fem.make_fom_rom_pair("NDP", 2, 2, 2)  # 8x8 fine grid
    fom = physics["fom"]
    rng = np.random.default_rng(0)
    N = 3
    logx = rng.normal(0.2, 0.4, (N, fom.grid.n_cells))
    bce = fem.BoundaryConditionEnsemble.from_factory("NDP", N, rng)
    bce.register_function_space("fom", fom.grid)
    bce.register_function_space("rom", physics["rom"].grid)
    bcv = jnp.asarray(bce.constrained_values("fom"))
    qpe = QuerryPointEnsemble(physics=fom, X_DG=jnp.asarray(logx),
                              bc_values=bcv)
    # true free-dof solutions
    Y = fom.solve_batched(jnp.exp(qpe.X_DG), bcv)
    return physics, qpe, Y, bce


def _residual(Gamma, alpha, Y):
    return np.abs(np.asarray(jnp.einsum("nmd,nd->nm", Gamma, Y) - alpha))


def test_cgr_constraints_exact_at_solution(setup):
    physics, qpe, Y, _ = setup
    sampler = CoarseGrainedResidualSampler(W=physics["W"])
    Gamma, alpha = sampler.sample(qpe, jax.random.PRNGKey(0))
    assert Gamma.shape == (qpe.N, physics["W"].shape[1], qpe.dim_out)
    r = _residual(Gamma, alpha, Y)
    assert r.max() < 1e-7, r.max()


def test_gaussian_and_rbf_constraints_exact_at_solution(setup):
    physics, qpe, Y, _ = setup
    fom = physics["fom"]
    coords = fom.grid.node_coords[fom.profile.free_dofs]
    sampler = ConcatenatedSamplers([
        GaussianSketchingSampler(N_aux=5),
        RadialBasisFunctionSampler(l=0.3, N_aux=4, coords=coords),
    ])
    Gamma, alpha = sampler.sample(qpe, jax.random.PRNGKey(1))
    assert Gamma.shape[1] == 9
    r = _residual(Gamma, alpha, Y)
    assert r.max() < 1e-6, r.max()


def test_gamma_matches_dense_assembly(setup):
    """V^T K_ff via the stencil == V^T K_ff with the dense matrix."""
    physics, qpe, Y, _ = setup
    fom = physics["fom"]
    rng = np.random.default_rng(3)
    V = rng.normal(size=(qpe.N, fom.dim_out, 4))
    Gamma, alpha = qpe.construct_querry_weak_galerkin(jnp.asarray(V))
    free = fom.free_dofs
    con = fom.constrained_dofs
    for n in range(qpe.N):
        K = fem.dense_stiffness(fom.grid, np.exp(np.asarray(qpe.X_DG[n])))
        K_ff = K[np.ix_(free, free)]
        expect_G = V[n].T @ K_ff
        np.testing.assert_allclose(np.asarray(Gamma[n]), expect_G, rtol=1e-9,
                                   atol=1e-10)
        f_eff = -K[np.ix_(free, con)] @ np.asarray(qpe.bc_values[n])
        np.testing.assert_allclose(np.asarray(alpha[n]), V[n].T @ f_eff,
                                   rtol=1e-9, atol=1e-10)


def test_flux_constraints_exact_for_linear_solution():
    """alpha=1, ND BCs => u = x globally linear; one-sided fluxes are then
    exact and every coarse-cell net flux must vanish."""
    physics = fem.make_fom_rom_pair("ND", 2, 2, 2)
    fom = physics["fom"]
    op = FluxConstraintOperator(coarse=physics["rom"].grid, fine=fom.grid)
    alpha = jnp.ones(fom.grid.n_cells)
    u = jnp.asarray(fom.grid.node_coords[:, 0])  # u = x
    G = op.gamma_full(alpha)
    resid = np.asarray(G @ u)
    np.testing.assert_allclose(resid, 0.0, atol=1e-10)


def test_flux_constraints_small_at_discrete_solution(setup):
    """For rough alpha the one-sided flux constraints are approximate --
    residuals must be small relative to the total boundary-flux scale."""
    physics, qpe, Y, _ = setup
    fom = physics["fom"]
    op = FluxConstraintOperator(coarse=physics["rom"].grid, fine=fom.grid)
    sampler = FluxConstrainSampler(operator=op, physics=fom)
    Gamma, alpha = sampler.sample(qpe, jax.random.PRNGKey(0))
    resid = _residual(Gamma, alpha, Y)
    scale = np.abs(np.asarray(Gamma)).sum(-1).mean()
    assert resid.max() / scale < 0.5
    assert np.all(np.asarray(sampler.precision_mask()) > 0)  # learnable


def test_conditioning_matches_dense_bayes(setup):
    """vmapped conditioning == dense Gaussian conditioning oracle."""
    physics, qpe, Y, _ = setup
    rng = np.random.default_rng(5)
    sampler = GaussianSketchingSampler(N_aux=6)
    vo = VirtualObservablesEnsemble(qpe, sampler, dtype=jnp.float64)
    d = qpe.dim_out
    G = jnp.asarray(rng.normal(size=(qpe.N, d)))
    PREC = jnp.asarray(rng.uniform(1.0, 3.0, (qpe.N, d)))
    vo.update(G, PREC, 0)

    n = 1
    Gm = np.asarray(vo.Gamma[n])
    al = np.asarray(vo.alpha[n])
    cov = np.diag(1.0 / np.asarray(PREC[n]))
    vo_var = np.asarray(vo.vo_variances) + 1e-10
    S = Gm @ cov @ Gm.T + np.diag(vo_var)
    gain = cov @ Gm.T @ np.linalg.inv(S)
    mean = np.asarray(G[n]) + gain @ (al - Gm @ np.asarray(G[n]))
    post_cov = cov - gain @ Gm @ cov
    np.testing.assert_allclose(np.asarray(vo.mean[n]), mean, rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(vo.vars[n]),
                               np.maximum(np.diag(post_cov), 1e-12),
                               rtol=1e-6, atol=1e-9)


def test_conditioning_failure_containment(setup):
    """A per-sample conditioning failure (non-finite model prior here) must
    not poison the other samples' moments, and the next update must fall
    back to the previous finite moments for the still-bad sample."""
    physics, qpe, Y, _ = setup
    rng = np.random.default_rng(7)
    sampler = GaussianSketchingSampler(N_aux=6)
    vo = VirtualObservablesEnsemble(qpe, sampler, dtype=jnp.float64)
    d = qpe.dim_out
    G = jnp.asarray(rng.normal(size=(qpe.N, d)))
    PREC = jnp.asarray(rng.uniform(1.0, 3.0, (qpe.N, d)))

    # clean reference update
    vo.update(G, PREC, 0)
    mean_ref, vars_ref = vo.mean, vo.vars

    # sample 1's prior is poisoned -> its conditioning output is NaN
    G_bad = G.at[1, 0].set(jnp.nan)
    vo2 = VirtualObservablesEnsemble(qpe, sampler, dtype=jnp.float64)
    with pytest.warns(UserWarning, match="non-finite moments for 1/"):
        vo2.update(G_bad, PREC, 0)
    assert bool(jnp.isfinite(vo2.mean).all() & jnp.isfinite(vo2.vars).all())
    # untouched samples match the clean run exactly
    np.testing.assert_array_equal(np.asarray(vo2.mean)[[0, 2]],
                                  np.asarray(mean_ref)[[0, 2]])
    # first update has no previous moments: fallback is the prior with the
    # poisoned entries sanitised (0 mean, finite variance)
    assert float(vo2.mean[1, 0]) == 0.0

    # second update, still-bad prior: falls back to the PREVIOUS moments
    with pytest.warns(UserWarning, match="non-finite model prior"):
        vo2.update(G_bad, PREC, 1)
    assert bool(jnp.isfinite(vo2.mean).all() & jnp.isfinite(vo2.vars).all())
    # and the precision update stayed finite despite the bad sample
    assert bool(jnp.isfinite(vo2.vo_variances).all())


def test_conditioning_pulls_towards_solution(setup):
    """Conditioning a poor prior on exact CGR+Gaussian constraints must
    reduce the error vs the true solution."""
    physics, qpe, Y, _ = setup
    sampler = ConcatenatedSamplers([
        CoarseGrainedResidualSampler(W=physics["W"]),
        GaussianSketchingSampler(N_aux=10),
    ])
    vo = VirtualObservablesEnsemble(qpe, sampler, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    G = Y + jnp.asarray(rng.normal(0, 0.3, Y.shape))
    PREC = jnp.full(Y.shape, 1.0 / 0.3 ** 2)
    vo.update(G, PREC, 0)
    err_prior = float(jnp.linalg.norm(G - Y))
    err_post = float(jnp.linalg.norm(vo.mean - Y))
    # conditioning can only fix the error inside the m-dim constraint space
    # (m=19 << d=63) -- so require strict improvement, not a large factor
    assert err_post < err_prior
    assert float(vo.vars.max()) <= float((1.0 / PREC).max()) + 1e-9
    # the constraints are infinite-precision: the posterior mean must
    # satisfy them almost exactly
    r_post = _residual(vo.Gamma, vo.alpha, vo.mean)
    r_prior = _residual(vo.Gamma, vo.alpha, G)
    assert r_post.max() < 1e-3 * r_prior.max()


def test_prior_tempering(setup):
    """prior_precision_factor < 1 must keep the exact constraints satisfied
    while inflating the posterior variance (weaker self-distillation anchor
    in the unconstrained directions)."""
    physics, qpe, Y, _ = setup
    rng = np.random.default_rng(11)
    sampler = CoarseGrainedResidualSampler(W=physics["W"])
    vo_ref = VirtualObservablesEnsemble(qpe, sampler, dtype=jnp.float64)
    vo_tmp = VirtualObservablesEnsemble(qpe, sampler, dtype=jnp.float64,
                                        prior_precision_factor=0.1)
    G = Y + jnp.asarray(rng.normal(0, 0.3, Y.shape))
    PREC = jnp.full(Y.shape, 1.0 / 0.3 ** 2)
    vo_ref.update(G, PREC, 0)
    vo_tmp.update(G, PREC, 0)
    # exact (infinite-precision) constraints still hold for the tempered
    # posterior mean
    r_tmp = _residual(vo_tmp.Gamma, vo_tmp.alpha, vo_tmp.mean)
    r_prior = _residual(vo_tmp.Gamma, vo_tmp.alpha, G)
    assert r_tmp.max() < 1e-3 * r_prior.max()
    # posterior variance is uniformly >= the untempered one
    assert bool(jnp.all(vo_tmp.vars >= vo_ref.vars - 1e-12))
    # and matches conditioning with the scaled precision exactly
    vo_chk = VirtualObservablesEnsemble(qpe, sampler, dtype=jnp.float64)
    vo_chk.update(G, 0.1 * PREC, 0)
    np.testing.assert_allclose(np.asarray(vo_tmp.mean),
                               np.asarray(vo_chk.mean), rtol=1e-12)


def test_precision_learning_formula(setup):
    physics, qpe, Y, _ = setup
    op = FluxConstraintOperator(coarse=physics["rom"].grid,
                                fine=physics["fom"].grid)
    sampler = FluxConstrainSampler(operator=op, physics=physics["fom"])
    vo = VirtualObservablesEnsemble(qpe, sampler, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    G = jnp.asarray(rng.normal(size=(qpe.N, qpe.dim_out)))
    PREC = jnp.ones((qpe.N, qpe.dim_out))
    vo.update(G, PREC, 0)   # first call initialises, no precision change
    v0 = np.asarray(vo.vo_variances).copy()
    np.testing.assert_allclose(v0, 1.0 / (vo._prec_alpha + 1.0))
    # the second update computes beta from the PREVIOUS conditioned state
    # (reference: VirtualObservables.py:971-998) -- capture it now
    mean_prev = np.asarray(vo.mean).copy()
    vars_prev = np.asarray(vo.vars).copy()
    vo.update(G, PREC, 1)   # now the Gamma-hyperprior kicks in
    # manual beta_j = 0.5 sum_n [(Gamma_n mu_n - alpha_n)_j^2
    #                            + (Gamma_n^2 vars_n)_j] + BETA_0
    beta = np.zeros(vo.m)
    for n in range(qpe.N):
        Gm = np.asarray(vo.Gamma[n])
        r = Gm @ mean_prev[n] - np.asarray(vo.alpha[n])
        beta += 0.5 * (r ** 2 + (Gm ** 2) @ vars_prev[n])
    beta += vo.BETA_0
    np.testing.assert_allclose(np.asarray(vo._prec_beta), beta,
                               rtol=1e-10, atol=1e-12)
    mask = np.asarray(vo.infinite_precision_mask)
    expect_vars = np.where(mask, 0.0, beta / (vo._prec_alpha + 1.0))
    np.testing.assert_allclose(np.asarray(vo.vo_variances), expect_vars,
                               rtol=1e-10, atol=1e-12)
    assert vo.vo_variances.shape == (vo.m,)
    assert float(jnp.min(vo.vo_variances)) >= 0


def test_contained_failure_does_not_poison_precision(setup):
    """A sample whose conditioning fails gets a huge-variance stand-in
    (failure containment); that stand-in must be EXCLUDED from the next
    Gamma precision update, or its 1e6 variance inflates beta_j -- and
    with it every sample's vo_variances -- ensemble-wide."""
    physics, qpe, Y, _ = setup
    op = FluxConstraintOperator(coarse=physics["rom"].grid,
                                fine=physics["fom"].grid)
    sampler = FluxConstrainSampler(operator=op, physics=physics["fom"])
    rng = np.random.default_rng(1)
    G = jnp.asarray(rng.normal(size=(qpe.N, qpe.dim_out)))
    PREC = jnp.ones((qpe.N, qpe.dim_out))

    # clean twin: all samples fine
    vo_ok = VirtualObservablesEnsemble(qpe, sampler, dtype=jnp.float64)
    vo_ok.update(G, PREC, 0)
    vo_ok.update(G, PREC, 1)

    # poisoned twin: sample 0's prior is non-finite at the first update,
    # so its stored moments become the neutral 1e6-variance stand-in
    vo_bad = VirtualObservablesEnsemble(qpe, sampler, dtype=jnp.float64)
    G_bad = G.at[0].set(jnp.nan)
    PREC_bad = PREC.at[0].set(jnp.nan)  # 1/PREC fallback is non-finite too
    with pytest.warns(UserWarning, match="non-finite"):
        vo_bad.update(G_bad, PREC_bad, 0)
    assert vo_bad._fallback_mask is not None
    assert bool(vo_bad._fallback_mask[0])
    assert np.isfinite(np.asarray(vo_bad.mean)).all()
    assert float(jnp.max(vo_bad.vars[0])) >= 1e5   # the stand-in

    # the NEXT update's learned vo_variances must match the clean twin's
    # statistics computed over the good samples only -- not blow up by
    # the 1e6 row.  Bound: within 10x of the clean twin (the good-sample
    # beta differs slightly because one sample is excluded), and at
    # least 1e3 below what including the stand-in would give.
    vo_bad.update(G_bad, PREC_bad, 1)
    v_ok = np.asarray(vo_ok.vo_variances)
    v_bad = np.asarray(vo_bad.vo_variances)
    assert np.isfinite(v_bad).all()
    assert np.all(v_bad <= 10.0 * np.maximum(v_ok, 1e-12) + 1e-9)

    # degenerate case: EVERY sample failed -> no evidence; the precision
    # update must be skipped (previous beta kept), not collapse the
    # variances to ~BETA_0/ALPHA_0 (false near-exactness from zero data)
    vo_all = VirtualObservablesEnsemble(qpe, sampler, dtype=jnp.float64)
    with pytest.warns(UserWarning, match="non-finite"):
        vo_all.update(jnp.full_like(G, jnp.nan), jnp.full_like(PREC, jnp.nan), 0)
    v_before = np.asarray(vo_all.vo_variances).copy()
    with pytest.warns(UserWarning, match="non-finite"):
        vo_all.update(jnp.full_like(G, jnp.nan), jnp.full_like(PREC, jnp.nan), 1)
    np.testing.assert_array_equal(np.asarray(vo_all.vo_variances), v_before)


@pytest.mark.slow
def test_f32_conditioning_matches_f64_oracle_at_config2_scale():
    """The dtype that PRODUCTION runs on the chip: VO conditioning +
    Gamma precision update in float32 at config-2 scale (64^2 grid,
    CGR+flux+Gaussian+RBF constraint stack over 4065 free dofs) must stay
    finite (Cholesky succeeds with the eps=1e-6 f32 jitter floor,
    constraints/virtual_observables.py:407) and track the f64 oracle.

    The reference FORCES float64 here (VirtualObservables.py:419-420);
    this rebuild runs f32 on TPU, so the claim needs a test, not a
    docstring."""
    physics = fem.make_fom_rom_pair("ND", 8, 8, 3)  # 64^2 fine grid
    fom = physics["fom"]
    rf = fem.GaussianRandomField.from_image(64, 64, 0.4, 0.8, 0.04,
                                            method="fft")
    X_img = rf.sample(jax.random.PRNGKey(0), batch_size=4)
    logx = fem.PixelConverter(fom.grid).image_to_function(X_img)
    N = logx.shape[0]
    rng = np.random.default_rng(0)
    bce = fem.BoundaryConditionEnsemble.from_factory("ND", N, rng)
    bce.register_function_space("fom", fom.grid)
    bcv = jnp.asarray(bce.constrained_values("fom"))
    qpe = QuerryPointEnsemble(physics=fom, X_DG=jnp.asarray(logx),
                              bc_values=bcv)
    Y = fom.solve_batched(jnp.exp(qpe.X_DG), bcv)

    coords = fom.grid.node_coords[fom.profile.free_dofs]
    op = FluxConstraintOperator(coarse=physics["rom"].grid, fine=fom.grid)

    def make_vo(dtype):
        sampler = ConcatenatedSamplers([
            CoarseGrainedResidualSampler(W=physics["W"]),
            FluxConstrainSampler(operator=op, physics=fom),
            GaussianSketchingSampler(N_aux=8),
            RadialBasisFunctionSampler(l=0.2, N_aux=8, coords=coords),
        ])
        return VirtualObservablesEnsemble(qpe, sampler, dtype=dtype)

    vo32 = make_vo(jnp.float32)
    vo64 = make_vo(jnp.float64)
    # realistic mid-training prior: noisy solution, moderate confidence
    G = Y + jnp.asarray(np.random.default_rng(2).normal(0, 0.2, Y.shape))
    PREC = jnp.full(Y.shape, 1.0 / 0.2 ** 2)
    for it in range(2):  # 2nd update engages the Gamma precision learning
        vo32.update(G, PREC, it)
        vo64.update(G, PREC, it)

    m32, v32 = np.asarray(vo32.mean), np.asarray(vo32.vars)
    m64, v64 = np.asarray(vo64.mean), np.asarray(vo64.vars)
    assert np.all(np.isfinite(m32)) and np.all(np.isfinite(v32))
    assert np.all(v32 > 0)
    # f32 conditioning must track the f64 oracle to well under the
    # constraint-noise scale the trainer consumes it at
    rel_mean = np.linalg.norm(m32 - m64) / np.linalg.norm(m64)
    assert rel_mean < 1e-3, rel_mean
    rel_vars = np.abs(v32 - v64) / (np.abs(v64) + 1e-12)
    assert np.median(rel_vars) < 1e-2, np.median(rel_vars)
    # learned constraint noise agrees too
    vv32, vv64 = np.asarray(vo32.vo_variances), np.asarray(vo64.vo_variances)
    mask = ~np.asarray(vo32.infinite_precision_mask)
    np.testing.assert_allclose(vv32[mask], vv64[mask], rtol=5e-2)
    # and the f32 posterior means actually moved toward the solutions
    assert (np.linalg.norm(m32 - np.asarray(Y))
            < np.linalg.norm(np.asarray(G) - np.asarray(Y)))


def test_f32_conditioning_survives_badly_scaled_schur_system():
    """Correctness guard for the Jacobi-equilibrated conditioning rewrite
    (motivated by cadence-50 on-TPU Cholesky breakdowns: Schur diag span
    [0.9, 7e5], cond 4e10 -- PARITY.md, benchmarks/vo_nan_analyze.py; that
    failure itself is TPU-accumulation-specific and does NOT reproduce on
    CPU).  What this asserts: on a synthetic system with a 6-decade
    constraint-row-scale spread, the equilibrated path's scaling algebra
    (D^-1/2 folded into resid/solvec/AL) is exact -- f32 stays finite and
    tracks the f64 oracle, and posterior variances contract the prior."""
    rng = np.random.default_rng(7)
    N, m, d = 3, 48, 400
    # constraint rows spanning 6 decades in scale, like CGR vs flux rows
    scales = np.logspace(-1, 5, m)
    Gamma = scales[:, None] * rng.normal(size=(m, d)) / np.sqrt(d)
    Gamma = np.broadcast_to(Gamma, (N, m, d))
    alpha = np.einsum("nmd,nd->nm", Gamma, rng.normal(size=(N, d)))
    G = rng.normal(size=(N, d))
    PREC = np.exp(rng.normal(0.0, 1.0, size=(N, d)))  # heteroscedastic prior
    vo_var = np.zeros(m)  # all constraints "exact": jitter carries the PD-ness

    def run(dtype, eps):
        out = condition_ensemble(
            jnp.asarray(Gamma, dtype), jnp.asarray(alpha, dtype),
            jnp.asarray(G, dtype), jnp.asarray(PREC, dtype),
            jnp.asarray(vo_var, dtype), eps)
        return tuple(np.asarray(o) for o in out)

    m32, v32 = run(jnp.float32, 1e-6)
    m64, v64 = run(jnp.float64, 1e-12)
    assert np.all(np.isfinite(m32)) and np.all(np.isfinite(v32))
    assert np.all(np.isfinite(m64))
    rel = np.linalg.norm(m32 - m64) / np.linalg.norm(m64)
    assert rel < 1e-2, rel
    # posterior variances shrink relative to the prior and stay sane
    assert np.all(v64 <= 1.0 / PREC + 1e-9)
    assert np.median(np.abs(v32 - v64) / (np.abs(v64) + 1e-12)) < 5e-2


def test_energy_vo_converges_to_minimizer(setup):
    physics, qpe, Y, _ = setup
    fom = physics["fom"]
    coords = fom.grid.node_coords[fom.profile.free_dofs]
    sampler = RadialBasisFunctionSampler(l=0.3, N_aux=12, coords=coords)
    vo = EnergyVirtualObservablesEnsemble(qpe, num_iterations_per_update=25,
                                          sampler=sampler, dtype=jnp.float64)
    vo.force_temperature(1e-4)
    # weak prior => minimiser ~ the PDE solution
    G = jnp.zeros((qpe.N, qpe.dim_out))
    PREC = jnp.full((qpe.N, qpe.dim_out), 1e-6)
    vo.update(G, PREC, 0)
    err0 = float(jnp.linalg.norm(0 * Y - Y) / jnp.linalg.norm(Y))
    err = float(jnp.linalg.norm(vo.mean - Y) / jnp.linalg.norm(Y))
    assert err < 0.2 * err0, (err, err0)
    assert vo.vars.shape == Y.shape


def test_temperature_schedules_hold_final_value():
    from generative_physics_informed_pde_tpu.constraints.virtual_observables \
        import LinearTemperatureSchedule, ExponentialTemperatureSchedule
    lin = LinearTemperatureSchedule(T_init=1.0, T_final=1e-4, num_steps=100)
    # the reference overshoots at iteration == num_steps (negative T for a
    # linear schedule -> 1/T NaNs the pseudo-labels) and raises past it;
    # here the schedule holds T_final instead
    assert lin.get_temperature(99) == pytest.approx(1e-4)
    assert lin.get_temperature(100) == pytest.approx(1e-4)
    assert lin.get_temperature(10_000) == pytest.approx(1e-4)
    assert all(lin.get_temperature(i) > 0 for i in range(0, 200, 7))
    exp = ExponentialTemperatureSchedule(T_init=1.0, T_final=1e-4,
                                         num_steps=50)
    assert exp.get_temperature(49) == pytest.approx(1e-4)
    assert exp.get_temperature(500) == pytest.approx(1e-4)


def test_energy_vo_manual_temperature_and_containment(setup):
    physics, qpe, Y, _ = setup
    fom = physics["fom"]
    coords = fom.grid.node_coords[fom.profile.free_dofs]
    sampler = RadialBasisFunctionSampler(l=0.3, N_aux=6, coords=coords)
    vo = EnergyVirtualObservablesEnsemble(qpe, num_iterations_per_update=3,
                                          sampler=sampler, dtype=jnp.float64)
    with pytest.raises(ValueError):
        vo.set_temperature(0.0)  # inv_T = 1/T
    # manual temperature without a schedule is usable (the reference's
    # update never touches the schedule)
    vo.set_temperature(0.5)
    G = jnp.zeros((qpe.N, qpe.dim_out))
    PREC = jnp.full((qpe.N, qpe.dim_out), 1e-3)
    vo.update(G, PREC, 0)
    assert vo.temperature == 0.5
    assert bool(jnp.all(jnp.isfinite(vo.mean)))
    mean_before = np.asarray(vo.mean).copy()

    # containment: a rank-deficient subspace (all-zero test functions)
    # makes Msub singular and jnp.linalg.solve return NaN silently; the
    # iterate must survive unchanged instead of being poisoned
    class ZeroSampler:
        def sample_V(self, key, N, dtype):
            return jnp.zeros((N, coords.shape[0], 4), dtype=dtype)

    vo2 = EnergyVirtualObservablesEnsemble(qpe, num_iterations_per_update=2,
                                           sampler=ZeroSampler(),
                                           dtype=jnp.float64)
    vo2.set_temperature(0.5)
    vo2.update(G, PREC, 0)
    assert bool(jnp.all(jnp.isfinite(vo2.mean)))
    # fresh run with the degenerate sampler keeps the zero-initialised mean
    np.testing.assert_allclose(np.asarray(vo2.mean), 0.0)
    del mean_before


def test_rbf_centers_follow_coordinate_box():
    """Centers must span the free-node bounding box, not a hardcoded unit
    square -- on a domain offset from [0,1]^2 the old code placed every
    center exp(-d^2/l^2) ~ 0 away from all nodes."""
    rng = np.random.default_rng(3)
    coords = jnp.asarray(rng.uniform(5.0, 6.0, (40, 2)))  # far from [0,1]^2
    sampler = RadialBasisFunctionSampler(l=0.3, N_aux=8, coords=coords)
    V = sampler.sample_V(jax.random.PRNGKey(0), N=2, dtype=jnp.float64)
    assert float(V.max()) > 0.5  # some node sits near some center


def test_build_from_spec(setup):
    physics, qpe, Y, bce = setup

    class FakeDS:
        def get(self, key):
            if key == "X_DG":
                return qpe.X_DG
            if key == "BCE":
                return bce
            raise KeyError(key)

    spec = {"type": "constrain", "CGR": True, "flux": True, "N_gaussian": 3,
            "N_rbf": 2, "l_rbf": 0.2}
    vo = build_virtual_observables_ensemble(spec, FakeDS(), physics,
                                            dtype=jnp.float64)
    m_expected = physics["W"].shape[1] + physics["rom"].grid.n_cells + 3 + 2
    assert vo.m == m_expected
    spec_e = {"type": "energy", "l_rbf": 0.2, "N_rbf": 4,
              "energy_num_iterations_per_update": 2, "T_init": 1.0,
              "T_final": 0.01, "T_iterations": 100}
    vo_e = build_virtual_observables_ensemble(spec_e, FakeDS(), physics,
                                              dtype=jnp.float64)
    G = jnp.zeros((qpe.N, qpe.dim_out))
    vo_e.update(G, jnp.ones_like(G), 0)
    assert vo_e.mean.shape == G.shape


def test_vo_spec_preset():
    """The measured-best presets (PARITY VO ablation) are the defaults:
    energy is the production arm; the constrain preset matches the
    reference's spec shape (VirtualObservables.py:57-69)."""
    from generative_physics_informed_pde_tpu.constraints import vo_spec_preset

    e = vo_spec_preset(T_iterations=500)
    assert e["type"] == "energy" and e["T_iterations"] == 500
    c = vo_spec_preset("constrain", N_gaussian=4)
    assert c["type"] == "constrain" and c["CGR"] and c["flux"]
    assert c["N_gaussian"] == 4  # overrides merge on top
    with pytest.raises(ValueError):
        vo_spec_preset("energy")  # T_iterations is required
    with pytest.raises(ValueError):
        vo_spec_preset("nope")
    # the trainer default cadence encodes the same ablation
    from generative_physics_informed_pde_tpu.training.trainer import (
        DEFAULT_CONFIG)
    assert DEFAULT_CONFIG["N_vo_update_interval"] == 50


def test_contained_inf_prior_does_not_poison_precision(setup):
    """+/-inf priors (not just NaN) must be neutralized by failure
    containment: nan_to_num's default maps inf to FLT/DBL_MAX, whose
    square overflows to inf in the next precision update and
    inf * 0-weight = NaN poisons beta for EVERY constraint."""
    physics, qpe, Y, _ = setup
    op = FluxConstraintOperator(coarse=physics["rom"].grid,
                                fine=physics["fom"].grid)
    sampler = FluxConstrainSampler(operator=op, physics=physics["fom"])
    rng = np.random.default_rng(3)
    G = jnp.asarray(rng.normal(size=(qpe.N, qpe.dim_out)))
    PREC = jnp.ones((qpe.N, qpe.dim_out))
    vo = VirtualObservablesEnsemble(qpe, sampler, dtype=jnp.float64)
    G_bad = G.at[0].set(jnp.inf)
    with pytest.warns(UserWarning, match="non-finite"):
        vo.update(G_bad, PREC, 0)
    m = np.asarray(vo.mean)
    assert np.isfinite(m).all()
    assert np.abs(m[0]).max() < 1e6, "inf must map to 0, not DBL_MAX"
    # second update: beta must stay finite for all constraints
    vo.update(G_bad, PREC, 1)
    assert np.isfinite(np.asarray(vo.vo_variances)).all()
    assert np.isfinite(np.asarray(vo.mean)).all()


def test_flux_operator_rejects_unequal_refinement():
    """Unequal x/y refinement factors would silently produce wrong
    constraint weights; must raise instead."""
    from generative_physics_informed_pde_tpu.fem import StructuredTriGrid

    op = FluxConstraintOperator(coarse=StructuredTriGrid(4, 2),
                                fine=StructuredTriGrid(8, 8))
    with pytest.raises(ValueError, match="SAME integer factor"):
        op._entries
