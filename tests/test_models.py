"""Model components: codec shapes, ROM operator vs Galerkin oracle,
effective property map, ELBO pieces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from generative_physics_informed_pde_tpu import fem
from generative_physics_informed_pde_tpu.models import (
    CNNDecoder, CNNEncoder, EffectivePropertyMap, ReducedOrderModelOperator,
    GenerativeModel)
from generative_physics_informed_pde_tpu.inference import (
    variational as va, unit_gaussian_kld, diagonal_gaussian_log_likelihood,
    coefficient_of_determination)


@pytest.fixture(scope="module")
def physics():
    return fem.make_fom_rom_pair("NDP", 4, 4, 3)


def test_decoder_shapes():
    dec = CNNDecoder(target_img_size=32, dim_latent=16, latent_img_size=8,
                     latent_img_features=1, init_features=4, blocks=(1, 1),
                     growth_rate=4)
    z = jnp.zeros((3, 16))
    variables = dec.init(jax.random.PRNGKey(0), z, train=False)
    mean, logsigma = dec.apply(variables, z, train=False)
    assert mean.shape == (3, 32, 32) and logsigma.shape == (3, 32, 32)
    m2, s2 = dec.apply(variables, z, train=False, flatten=True)
    assert m2.shape == (3, 1024)


def test_decoder_latent_size_check():
    with pytest.raises(ValueError):
        dec = CNNDecoder(target_img_size=32, dim_latent=16, latent_img_size=4,
                         latent_img_features=1, blocks=(1, 1))
        dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)), train=False)


def test_encoder_shapes():
    enc = CNNEncoder(imsize=32, latent_dim=16, blocks=(1, 1), growth_rate=4,
                     init_features=4)
    x = jnp.zeros((5, 32, 32))
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    mu, logsigma = enc.apply(variables, x, train=False)
    assert mu.shape == (5, 16) and logsigma.shape == (5, 16)


def test_rom_operator_matches_galerkin_oracle(physics):
    """W . rom_solve on the ROM grid == numpy Galerkin-free solve oracle
    (reference cross-check: bottleneck/utils.py:285-310 does the W^T K W
    version; here the ROM *is* the coarse grid so we check the direct
    coarse solve + interpolation)."""
    g = ReducedOrderModelOperator.from_physics(physics)
    params = g.init_params(dtype=jnp.float64)
    rng = np.random.default_rng(0)
    N = 4
    rom = physics["rom"]
    logX = rng.normal(0, 0.3, (N, rom.grid.n_cells))
    bce = fem.BoundaryConditionEnsemble.from_factory("NDP", N, rng)
    bce.register_function_space("rom", rom.grid)
    F = jnp.asarray(bce.full_f_with_applied_bc("rom"))
    mu, logsig = g(params, jnp.asarray(logX), F)
    assert mu.shape == (N, physics["fom"].dim_out)
    assert logsig.shape == mu.shape
    np.testing.assert_allclose(np.asarray(logsig), 1.0)  # init ones

    # oracle: dense coarse solve in numpy then interpolate
    vals = bce.constrained_values("rom")
    for n in range(N):
        y_c = rom.solve_direct(np.exp(logX[n]) + 1e-8, vals[n],
                               only_free_dofs=False)
        expect = physics["W"] @ y_c
        np.testing.assert_allclose(np.asarray(mu[n]), expect, rtol=1e-8,
                                   atol=1e-10)


def test_rom_operator_gradients(physics):
    g = ReducedOrderModelOperator.from_physics(physics)
    params = g.init_params(dtype=jnp.float64)
    rom = physics["rom"]
    F = jnp.zeros((2, rom.grid.n_nodes), dtype=jnp.float64
                  ).at[:, jnp.asarray(rom.constrained_dofs)].set(1.0)
    logX = jnp.zeros((2, rom.grid.n_cells), dtype=jnp.float64)

    def loss(lx):
        mu, _ = g(params, lx, F)
        return jnp.sum(mu ** 2)

    grad = jax.grad(loss)(logX)
    assert bool(jnp.all(jnp.isfinite(grad)))
    # FD check one coordinate
    e = 1e-6
    d = jnp.zeros_like(logX).at[0, 3].set(e)
    fd = (loss(logX + d) - loss(logX - d)) / (2 * e)
    np.testing.assert_allclose(float(grad[0, 3]), float(fd), rtol=1e-5,
                               atol=1e-10)


def test_effective_property_map_variants():
    gp = EffectivePropertyMap(latent_dim=8, dim_effective_property=32)
    z = jnp.zeros((4, 8))
    variables = gp.init(jax.random.PRNGKey(0), z)
    mean, logsig = gp.apply(variables, z)
    assert mean.shape == (4, 32) and np.allclose(np.asarray(logsig), 1.0)

    gp2 = EffectivePropertyMap(latent_dim=8, dim_effective_property=32,
                               num_hidden_layers=2, independent_X=False)
    v2 = gp2.init(jax.random.PRNGKey(0), z)
    out = gp2.apply(v2, z)
    assert out.shape == (4, 32)


def test_variational_approximation():
    q = va.init_variational(5, 3, dtype=jnp.float64)
    # KLD of standard normal q: mean 0 logsigma 0 -> 0
    np.testing.assert_allclose(float(va.kld(q)), 0.0, atol=1e-12)
    q2 = {"mean": jnp.ones((5, 3)), "logsigma": jnp.zeros((5, 3))}
    # closed form: 0.5 * sum(mean^2) = 7.5
    np.testing.assert_allclose(float(va.kld(q2)), 7.5)
    s = va.sample_all_components(q, jax.random.PRNGKey(0), 7)
    assert s.shape == (5, 7, 3)
    # entropy of unit gaussians
    expect = 5 * 3 * 0.5 * (np.log(2 * np.pi) + 1)
    np.testing.assert_allclose(float(va.entropy(q)), expect)


def test_likelihood_identities():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 6)))
    mu = jnp.asarray(rng.normal(size=(4, 6)))
    lv = jnp.asarray(rng.normal(size=(4, 6)))
    got = float(diagonal_gaussian_log_likelihood(x, mu, lv))
    from scipy import stats
    expect = stats.norm.logpdf(np.asarray(x), np.asarray(mu),
                               np.exp(0.5 * np.asarray(lv))).sum()
    np.testing.assert_allclose(got, expect, rtol=1e-10)
    # KLD identity at mean 0 var 1
    np.testing.assert_allclose(
        float(unit_gaussian_kld(jnp.zeros(5), jnp.zeros(5))), 0.0)


def test_r2_matches_reference_semantics():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=(10, 4)))
    np.testing.assert_allclose(
        float(coefficient_of_determination(y, y)), 1.0)
    y_pred = y + 0.1 * jnp.asarray(rng.normal(size=(10, 4)))
    r2 = float(coefficient_of_determination(y_pred, y))
    assert 0.9 < r2 < 1.0


@pytest.mark.slow
def test_generative_model_elbo_gradients(physics):
    g = ReducedOrderModelOperator.from_physics(physics)
    dec = CNNDecoder(target_img_size=32, dim_latent=8, latent_img_size=8,
                     latent_img_features=1, init_features=4, blocks=(1, 1),
                     growth_rate=4)
    gp = EffectivePropertyMap(latent_dim=8,
                              dim_effective_property=g.dim_effective_property)
    model = GenerativeModel(f=dec, g=g, gp=gp, encoder=None,
                            dtype=jnp.float32)
    rng = np.random.default_rng(0)
    Ns = 4
    X = jnp.asarray(rng.normal(0.4, 0.8, (Ns, 32, 32)), dtype=jnp.float32)
    Y = jnp.asarray(rng.normal(size=(Ns, physics["fom"].dim_out)),
                    dtype=jnp.float32)
    F = jnp.zeros((Ns, physics["rom"].grid.n_nodes), dtype=jnp.float32)
    data = {"supervised": {"X": X, "Y": Y, "F_ROM_BC": F}}
    params, bs = model.init_params(jax.random.PRNGKey(0), data, (32, 32))

    def loss(p):
        e, _, _ = model.elbo(p, bs, data, jax.random.PRNGKey(1))
        return -e

    val, grads = jax.value_and_grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g_))) for g_ in flat)
    # q_z and q_X gradients must be nonzero (they feed the elbo)
    assert float(jnp.abs(grads["q_z"]["supervised"]["mean"]).max()) > 0
    assert float(jnp.abs(grads["q_X"]["supervised"]["mean"]).max()) > 0
    assert float(jnp.abs(grads["g"]["logsigmas_y"]).max()) > 0


@pytest.mark.slow
def test_l2_penalty_gradients_finite_at_fresh_init(physics):
    """Fresh params contain all-zero leaves (Dense biases, the decoder's
    logsigma param); jnp.linalg.norm's gradient there is NaN (0/0), so an
    l2_penalty run would NaN on step 1 without the safe-norm form (torch
    defines the subgradient of norm at 0 as 0)."""
    g = ReducedOrderModelOperator.from_physics(physics)
    dec = CNNDecoder(target_img_size=32, dim_latent=8, latent_img_size=8,
                     latent_img_features=1, init_features=4, blocks=(1, 1),
                     growth_rate=4)
    gp = EffectivePropertyMap(latent_dim=8,
                              dim_effective_property=g.dim_effective_property)
    model = GenerativeModel(f=dec, g=g, gp=gp, encoder=None,
                            dtype=jnp.float32)
    rng = np.random.default_rng(0)
    Ns = 3
    X = jnp.asarray(rng.normal(0.4, 0.8, (Ns, 32, 32)), dtype=jnp.float32)
    Y = jnp.asarray(rng.normal(size=(Ns, physics["fom"].dim_out)),
                    dtype=jnp.float32)
    F = jnp.zeros((Ns, physics["rom"].grid.n_nodes), dtype=jnp.float32)
    data = {"supervised": {"X": X, "Y": Y, "F_ROM_BC": F}}
    params, bs = model.init_params(jax.random.PRNGKey(0), data, (32, 32))
    # precondition: a zero leaf really exists in the penalized subtree
    assert any(float(jnp.abs(leaf).max()) == 0.0
               for leaf in jax.tree_util.tree_leaves(params["f"]))

    def loss(p):
        e, _, _ = model.elbo(p, bs, data, jax.random.PRNGKey(1),
                             l2_penalty=1e-4)
        return -e

    grads = jax.grad(loss)(params)
    assert all(bool(jnp.all(jnp.isfinite(g_)))
               for g_ in jax.tree_util.tree_leaves(grads))


def test_extract_params_is_a_real_copy(physics):
    """extract_params must survive the trainer's donated buffers: the
    jitted step donates state.params, deleting the old arrays."""
    from generative_physics_informed_pde_tpu.models import DiscriminativeModel
    g = ReducedOrderModelOperator.from_physics(physics)
    dec = CNNDecoder(target_img_size=32, dim_latent=8, latent_img_size=8,
                     latent_img_features=1, init_features=4, blocks=(1, 1),
                     growth_rate=4)
    gp = EffectivePropertyMap(latent_dim=8,
                              dim_effective_property=g.dim_effective_property)
    model = GenerativeModel(f=dec, g=g, gp=gp, encoder=None,
                            dtype=jnp.float32)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(0.4, 0.8, (2, 32, 32)), dtype=jnp.float32)
    Y = jnp.asarray(rng.normal(size=(2, physics["fom"].dim_out)),
                    dtype=jnp.float32)
    F = jnp.zeros((2, physics["rom"].grid.n_nodes), dtype=jnp.float32)
    params, bs = model.init_params(
        jax.random.PRNGKey(0),
        {"supervised": {"X": X, "Y": Y, "F_ROM_BC": F}}, (32, 32))
    snap, snap_bs = DiscriminativeModel(model).extract(params, bs)
    # simulate donation: delete the original buffers
    for leaf in jax.tree_util.tree_leaves((params, bs)):
        leaf.delete()
    for leaf in jax.tree_util.tree_leaves((snap, snap_bs)):
        assert not leaf.is_deleted()
        _ = float(jnp.asarray(leaf).sum())  # still readable


@pytest.mark.slow
def test_elbo_multi_mc_samples(physics):
    """n_mc > 1 gives an unbiased lower-variance ELBO: with deterministic
    posteriors (logsigma -> -inf surrogate: tiny sigma) the S=1 and S=4
    values coincide."""
    import dataclasses as _dc
    g = ReducedOrderModelOperator.from_physics(physics)
    dec = CNNDecoder(target_img_size=32, dim_latent=8, latent_img_size=8,
                     latent_img_features=1, init_features=4, blocks=(1, 1),
                     growth_rate=4)
    gp = EffectivePropertyMap(latent_dim=8,
                              dim_effective_property=g.dim_effective_property)
    model1 = GenerativeModel(f=dec, g=g, gp=gp, encoder=None, n_mc=1,
                             dtype=jnp.float64)
    model4 = _dc.replace(model1, n_mc=4)
    rng = np.random.default_rng(3)
    Ns = 3
    X = jnp.asarray(rng.normal(0.4, 0.8, (Ns, 32, 32)))
    Y = jnp.asarray(rng.normal(size=(Ns, physics["fom"].dim_out)))
    F = jnp.zeros((Ns, physics["rom"].grid.n_nodes))
    data = {"supervised": {"X": X, "Y": Y, "F_ROM_BC": F}}
    params, bs = model1.init_params(jax.random.PRNGKey(0), data, (32, 32))
    # make the posteriors (near-)deterministic so MC draws coincide, with
    # DISTINCT nonzero means: an all-zero latent batch would make every
    # BatchNorm degenerate (variance ~ 0) and amplify the residual 1e-9
    # reparameterisation noise to macroscopic scale
    for q in (params["q_z"]["supervised"], params["q_X"]["supervised"]):
        q["logsigma"] = jnp.full_like(q["logsigma"], -20.0)
        q["mean"] = jnp.asarray(
            rng.normal(size=q["mean"].shape), dtype=q["mean"].dtype)
    e1, _, _ = model1.elbo(params, bs, data, jax.random.PRNGKey(1))
    e4, _, _ = model4.elbo(params, bs, data, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(e1), float(e4), rtol=1e-5)


@pytest.mark.slow
def test_fused_decode_matches_unfused(physics):
    """fuse_decodes=True must be BIT-identical to the unfused path in eval
    mode (BatchNorm uses running stats, dropout off -> per-slice decode is
    batch-independent), and must train with finite gradients in train mode
    (where the documented deviation is fused BN batch statistics)."""
    import dataclasses as _dc
    g = ReducedOrderModelOperator.from_physics(physics)
    dec = CNNDecoder(target_img_size=32, dim_latent=8, latent_img_size=8,
                     latent_img_features=1, init_features=4, blocks=(1, 1),
                     growth_rate=4)
    enc = CNNEncoder(imsize=32, latent_dim=8, blocks=(1, 1), growth_rate=4,
                     init_features=4)
    gp = EffectivePropertyMap(latent_dim=8,
                              dim_effective_property=g.dim_effective_property)
    model = GenerativeModel(f=dec, g=g, gp=gp, encoder=enc,
                            dtype=jnp.float32)
    fused = _dc.replace(model, fuse_decodes=True)

    rng = np.random.default_rng(0)
    Ns, Nu, Nv = 4, 6, 3
    dim_y, n_rom = physics["fom"].dim_out, physics["rom"].grid.n_nodes
    data = {
        "supervised": {
            "X": jnp.asarray(rng.normal(0.4, 0.8, (Ns, 32, 32)), jnp.float32),
            "Y": jnp.asarray(rng.normal(size=(Ns, dim_y)), jnp.float32),
            "F_ROM_BC": jnp.zeros((Ns, n_rom), jnp.float32)},
        "unsupervised": {
            "X": jnp.asarray(rng.normal(0.4, 0.8, (Nu, 32, 32)), jnp.float32)},
        "vo": {
            "X": jnp.asarray(rng.normal(0.4, 0.8, (Nv, 32, 32)), jnp.float32),
            "F_ROM_BC": jnp.zeros((Nv, n_rom), jnp.float32)},
    }
    params, bs = model.init_params(jax.random.PRNGKey(0), data, (32, 32))
    vo_state = (jnp.asarray(rng.normal(size=(Nv, dim_y)), jnp.float32),
                jnp.full((Nv, dim_y), -1.0, jnp.float32))

    key = jax.random.PRNGKey(7)
    e_ref, _, logs_ref = model.elbo(params, bs, data, key, vo_state=vo_state,
                                    train=False)
    e_fus, _, logs_fus = fused.elbo(params, bs, data, key, vo_state=vo_state,
                                    train=False)
    np.testing.assert_array_equal(np.asarray(e_ref), np.asarray(e_fus))
    for k in logs_ref:
        np.testing.assert_array_equal(np.asarray(logs_ref[k]),
                                      np.asarray(logs_fus[k]), err_msg=k)

    def loss(p):
        e, _, _ = fused.elbo(p, bs, data, key, vo_state=vo_state, train=True)
        return -e

    val, grads = jax.value_and_grad(loss)(params)
    assert bool(jnp.isfinite(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g_))) for g_ in flat)
    assert float(jnp.abs(grads["q_z"]["vo"]["mean"]).max()) > 0
    enc_leaves = jax.tree_util.tree_leaves(grads["encoder"])
    assert any(float(jnp.abs(g_).max()) > 0 for g_ in enc_leaves)


@pytest.mark.slow
def test_remat_codec_matches_plain(physics):
    """remat_codec=True recomputes codec activations in the backward pass
    instead of storing them (jax.checkpoint) -- same ops, so the train-mode
    ELBO and every gradient leaf must be BIT-identical to the plain path."""
    import dataclasses as _dc
    g = ReducedOrderModelOperator.from_physics(physics)
    dec = CNNDecoder(target_img_size=32, dim_latent=8, latent_img_size=8,
                     latent_img_features=1, init_features=4, blocks=(1, 1),
                     growth_rate=4)
    enc = CNNEncoder(imsize=32, latent_dim=8, blocks=(1, 1), growth_rate=4,
                     init_features=4)
    gp = EffectivePropertyMap(latent_dim=8,
                              dim_effective_property=g.dim_effective_property)
    model = GenerativeModel(f=dec, g=g, gp=gp, encoder=enc,
                            dtype=jnp.float32)
    remat = _dc.replace(model, remat_codec=True)

    rng = np.random.default_rng(1)
    Ns, Nu = 3, 4
    dim_y, n_rom = physics["fom"].dim_out, physics["rom"].grid.n_nodes
    data = {
        "supervised": {
            "X": jnp.asarray(rng.normal(0.4, 0.8, (Ns, 32, 32)), jnp.float32),
            "Y": jnp.asarray(rng.normal(size=(Ns, dim_y)), jnp.float32),
            "F_ROM_BC": jnp.zeros((Ns, n_rom), jnp.float32)},
        "unsupervised": {
            "X": jnp.asarray(rng.normal(0.4, 0.8, (Nu, 32, 32)), jnp.float32)},
    }
    params, bs = model.init_params(jax.random.PRNGKey(0), data, (32, 32))
    key = jax.random.PRNGKey(11)

    def loss(m):
        def inner(p):
            e, _, _ = m.elbo(p, bs, data, key, train=True)
            return -e
        return jax.jit(jax.value_and_grad(inner))(params)

    v_plain, g_plain = loss(model)
    v_remat, g_remat = loss(remat)
    np.testing.assert_array_equal(np.asarray(v_plain), np.asarray(v_remat))
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unsup_compute_dtype_scoped_to_unsup_term(physics):
    """unsup_compute_dtype=bf16 runs ONLY the unsupervised term's codec in
    reduced precision: the supervised term must stay BIT-identical to the
    plain model, the unsup term must move (bf16 rounding) but stay close,
    and all gradients must be finite."""
    import dataclasses as _dc
    g = ReducedOrderModelOperator.from_physics(physics)
    dec = CNNDecoder(target_img_size=32, dim_latent=8, latent_img_size=8,
                     latent_img_features=1, init_features=4, blocks=(1, 1),
                     growth_rate=4)
    enc = CNNEncoder(imsize=32, latent_dim=8, blocks=(1, 1), growth_rate=4,
                     init_features=4)
    gp = EffectivePropertyMap(latent_dim=8,
                              dim_effective_property=g.dim_effective_property)
    model = GenerativeModel(f=dec, g=g, gp=gp, encoder=enc,
                            dtype=jnp.float32)
    mixed = _dc.replace(model, unsup_compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(2)
    Ns, Nu = 3, 4
    dim_y, n_rom = physics["fom"].dim_out, physics["rom"].grid.n_nodes
    data = {
        "supervised": {
            "X": jnp.asarray(rng.normal(0.4, 0.8, (Ns, 32, 32)), jnp.float32),
            "Y": jnp.asarray(rng.normal(size=(Ns, dim_y)), jnp.float32),
            "F_ROM_BC": jnp.zeros((Ns, n_rom), jnp.float32)},
        "unsupervised": {
            "X": jnp.asarray(rng.normal(0.4, 0.8, (Nu, 32, 32)), jnp.float32)},
    }
    params, bs = model.init_params(jax.random.PRNGKey(0), data, (32, 32))
    key = jax.random.PRNGKey(7)
    Xu = data["unsupervised"]["X"]

    # supervised term: bit-identical (the scope must not leak)
    e_sup_plain, _, _ = model.elbo_supervised(params, bs, data["supervised"],
                                              key, train=True)
    e_sup_mixed, _, _ = mixed.elbo_supervised(params, bs, data["supervised"],
                                              key, train=True)
    np.testing.assert_array_equal(np.asarray(e_sup_plain),
                                  np.asarray(e_sup_mixed))

    # unsupervised term: same math to bf16 precision, NOT bit-identical
    e_u_plain, _, _ = model.elbo_unsupervised_amortized(params, bs, Xu, key,
                                                        train=True)
    e_u_mixed, _, _ = mixed.elbo_unsupervised_amortized(params, bs, Xu, key,
                                                        train=True)
    assert float(e_u_plain) != float(e_u_mixed)
    # loose sanity bound: at fresh init the exp-field likelihood amplifies
    # bf16 rounding (observed ~7% relative); converged-quality evidence is
    # the TPU A/B in PARITY.md, not this unit test
    np.testing.assert_allclose(float(e_u_mixed), float(e_u_plain), rtol=0.2)

    # eval mode ignores the reduced-precision clone entirely
    e_u_eval_p, _, _ = model.elbo_unsupervised_amortized(params, bs, Xu, key,
                                                         train=False)
    e_u_eval_m, _, _ = mixed.elbo_unsupervised_amortized(params, bs, Xu, key,
                                                         train=False)
    np.testing.assert_array_equal(np.asarray(e_u_eval_p),
                                  np.asarray(e_u_eval_m))

    def loss(p):
        e, _, _ = mixed.elbo(p, bs, data, key, train=True)
        return -e

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert bool(jnp.isfinite(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g_))) for g_ in flat)
    # params remain f32 masters
    assert all(g_.dtype == jnp.float32 for g_ in
               jax.tree_util.tree_leaves(grads["f"]))


def test_codec_bfloat16_compute_dtype():
    """compute_dtype='bfloat16': params and outputs stay f32, values track
    the f32 path to bf16 precision (mixed-precision MXU path)."""
    from generative_physics_informed_pde_tpu.factories.model import ModelFactory

    outs = {}
    for cd in (None, "bfloat16"):
        f = ModelFactory.FromIdentifier("highres32", compute_dtype=cd)
        _, model, _, encoder, _ = f.setup()
        z = jax.random.normal(jax.random.PRNGKey(0), (4, 16),
                              dtype=jnp.float32)
        variables = model.f.init(jax.random.PRNGKey(1), z, train=False)
        mean, logsigma = model.f.apply(variables, z, train=False)
        # outputs keep the input dtype regardless of compute dtype
        assert mean.dtype == jnp.float32 and logsigma.dtype == jnp.float32
        assert all(a.dtype == jnp.float32 for a in
                   jax.tree_util.tree_leaves(variables["params"]))
        outs[cd] = np.asarray(mean, np.float32)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32),
                              dtype=jnp.float32)
        ev = encoder.init(jax.random.PRNGKey(3), x, train=False)
        m_enc, _ = encoder.apply(ev, x, train=False)
        assert m_enc.dtype == jnp.float32
        assert bool(jnp.isfinite(m_enc).all())
    scale = np.abs(outs[None]).max()
    assert np.abs(outs[None] - outs["bfloat16"]).max() < 0.05 * scale


def test_bilinear_upsample_matches_torch_align_corners():
    """upsample_bilinear_2x must match torch UpsamplingBilinear2d
    (align_corners=True) exactly (reference bottleneck/codec.py:147,251)."""
    torch = pytest.importorskip("torch")
    from generative_physics_informed_pde_tpu.models.codec import (
        upsample_bilinear_2x)

    rng = np.random.default_rng(0)
    for h, w in ((8, 8), (5, 7), (1, 4)):
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        ours = np.asarray(upsample_bilinear_2x(jnp.asarray(x)))
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ref = torch.nn.UpsamplingBilinear2d(scale_factor=2)(xt)
        ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_codec_pad_cin_math_preserving():
    """pad_cin pads conv INPUT channels with zeros: the padded weight
    rows see only zero activations, so (a) cropping them away yields a
    plain-architecture parameter set computing the same function, and
    (b) those rows receive identically-zero gradients."""
    kw = dict(target_img_size=32, dim_latent=8, latent_img_size=8,
              latent_img_features=1, init_features=4, blocks=(1, 1),
              growth_rate=4)
    dec_plain = CNNDecoder(**kw)
    dec_pad = CNNDecoder(pad_cin=8, **kw)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(5, 8)), jnp.float32)
    vars_pad = dec_pad.init(jax.random.PRNGKey(1), z, train=False)
    vars_plain = dec_plain.init(jax.random.PRNGKey(2), z, train=False)

    def crop(p, ref):
        if p.shape == ref.shape:
            return p
        assert p.ndim == 4 and p.shape[2] > ref.shape[2], (p.shape, ref.shape)
        return p[:, :, : ref.shape[2], :]

    vars_crop = jax.tree_util.tree_map(crop, vars_pad, vars_plain)
    out_pad = dec_pad.apply(vars_pad, z, train=False)
    out_plain = dec_plain.apply(vars_crop, z, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(out_pad),
                    jax.tree_util.tree_leaves(out_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    # padded weight rows get exactly zero gradient (they can never drift)
    def loss(params):
        mean, logsigma = dec_pad.apply(
            {"params": params, "batch_stats": vars_pad["batch_stats"]},
            z, train=False)
        return jnp.sum(mean ** 2) + jnp.sum(logsigma ** 2)

    grads = jax.grad(loss)(vars_pad["params"])
    flat_g, _ = jax.tree_util.tree_flatten_with_path(grads)
    flat_ref = jax.tree_util.tree_leaves(vars_plain["params"])
    checked = 0
    for (path, g), ref in zip(flat_g, flat_ref):
        if g.shape != ref.shape:
            assert g.ndim == 4
            np.testing.assert_array_equal(
                np.asarray(g[:, :, ref.shape[2]:, :]), 0.0)
            checked += 1
    assert checked > 0  # at least one conv actually got padded


def test_unsup_compute_dtype_auto_resolution():
    """The factory default 'auto' resolves to bf16 only where measured to
    win (>= 128^2, +9% full step; 64^2 is a 3% loss -- PARITY round 5)."""
    from generative_physics_informed_pde_tpu.factories.model import (
        ModelFactory)

    _, m128, *_ = ModelFactory.FromIdentifier("highres128").setup()
    assert m128.unsup_compute_dtype == jnp.bfloat16
    _, m32, *_ = ModelFactory.FromIdentifier("highres32").setup()
    assert m32.unsup_compute_dtype is None


def test_dec_architecture_overrides():
    """The decode-architecture study knobs (PARITY round 5 'wide' arms):
    dec_growth_rate / dec_init_features / dec_blocks rebuild the
    highres128 decoder and produce a working forward pass; a
    wrong-length dec_blocks raises with the expected count."""
    import pytest
    from generative_physics_informed_pde_tpu.factories.model import (
        ModelFactory)

    mf = ModelFactory.FromIdentifier("highres128")
    mf.set({"dec_growth_rate": 12, "dec_init_features": 12,
            "dec_blocks": (1, 1, 1, 1)})
    _, model, *_ = mf.setup()
    assert model.f.blocks == (1, 1, 1, 1)
    assert model.f.growth_rate == 12 and model.f.init_features == 12
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 64), dtype=jnp.float32)
    variables = model.f.init(jax.random.PRNGKey(1), z, train=False)
    mean, logsigma = model.f.apply(variables, z, train=False)
    assert mean.shape == (2, 128, 128) and logsigma.shape == (2, 128, 128)
    assert bool(jnp.isfinite(mean).all())

    bad = ModelFactory.FromIdentifier("highres128")
    bad.set({"dec_blocks": (1, 1)})  # target 128 needs 4 up-blocks
    with pytest.raises(ValueError, match="4 entries"):
        bad.setup()


def test_decode_knobs_consumed_by_every_preset():
    """codec_pad_cin / dec_growth_rate / dec_init_features / dec_blocks
    live in the BASE factory params, so every preset must actually
    consume them -- a preset that accepts-but-ignores them turns
    margs-driven A/Bs into silent self-comparisons (round-5 review)."""
    from generative_physics_informed_pde_tpu.factories.model import (
        ModelFactory)

    for ident in ("highres", "highres32"):
        mf = ModelFactory.FromIdentifier(
            ident, codec_pad_cin=8, dec_growth_rate=6, dec_init_features=10)
        _, model, _, encoder, _ = mf.setup()
        assert model.f.pad_cin == 8, ident
        assert model.f.growth_rate == 6, ident
        assert model.f.init_features == 10, ident
        assert encoder.pad_cin == 8, ident

    # likelihood-shaping flags must reach the decoder in EVERY preset --
    # a dropped binary_field builds a 2-channel decoder whose tuple
    # output crashes the Bernoulli likelihood at trace time
    for ident in ("highres", "highres32", "highres128"):
        mf = ModelFactory.FromIdentifier(ident, homoscedastic=True)
        _, model, _, _, _ = mf.setup()
        assert model.f.homoscedastic, ident
        mf2 = ModelFactory.FromIdentifier(ident, binary_field=True)
        _, model2, _, _, _ = mf2.setup()
        assert model2.f.binary, ident


def test_decoder_force_single_output_returns_mean_only():
    """Single-channel non-binary decode returns the mean ALONE
    (reference Decoder.py:293-304).  The old x[..., 1] read on a size-1
    axis clamped to index 0 -- JAX does not raise -- silently yielding
    (mean, mean)."""
    dec = CNNDecoder(target_img_size=32, dim_latent=8, latent_img_size=8,
                     latent_img_features=1, init_features=4, blocks=(1, 1),
                     growth_rate=4, force_single_output=True)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(3, 8)),
                    jnp.float32)
    variables = dec.init(jax.random.PRNGKey(0), z, train=False)
    out = dec.apply(variables, z, train=False)
    assert not isinstance(out, tuple)
    assert out.shape == (3, 32, 32)
    flat = dec.apply(variables, z, train=False, flatten=True)
    assert flat.shape == (3, 1024)
