"""Random fields, pixel converters, interpolation operators."""

import numpy as np
import jax
import jax.numpy as jnp

from generative_physics_informed_pde_tpu.fem import (
    StructuredTriGrid, PixelConverter, GaussianRandomField,
    convert_log_mean_std, p1_interpolation_matrix,
    physics_resolution_interpolator, DirichletProfile,
    squared_exponential_covariance, pixel_center_points,
)


def test_pixel_roundtrip():
    grid = StructuredTriGrid(4, 4)
    conv = PixelConverter(grid)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(3, 4, 4)))
    x = conv.image_to_function(img)
    assert x.shape == (3, grid.n_cells)
    back = conv.function_to_image(x)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), rtol=1e-12)


def test_pixel_orientation():
    """Pixel (0, 0) is the TOP-LEFT of the domain: its two cells sit in grid
    square (ix=0, iy=ny-1)."""
    grid = StructuredTriGrid(2, 2)
    conv = PixelConverter(grid)
    img = jnp.zeros((1, 2, 2)).at[0, 0, 0].set(1.0)
    x = np.asarray(conv.image_to_function(img))[0]
    hot = np.nonzero(x)[0]
    mids = grid.cell_midpoints[hot]
    assert np.all(mids[:, 0] < 0.5) and np.all(mids[:, 1] > 0.5)


def test_grf_kl_truncation_and_moments():
    rf = GaussianRandomField.from_image(8, 8, mean=0.4, stddev=0.8,
                                        corrlength=0.15, truncation="adaptive")
    assert rf.dim_in < rf.dim_out  # truncated
    # reference semantics (RandomField.py:191-192): truncation index is the
    # FIRST index whose cumulative explained variance exceeds 99.9%, and
    # eigvals[:index] are kept -- so the crossing component itself is cut.
    ev = np.cumsum(rf.eigvals) / np.sum(rf.eigvals)
    assert ev[rf.dim_in] > 0.999 >= ev[rf.dim_in - 1]
    key = jax.random.PRNGKey(0)
    X = np.asarray(rf.sample(key, batch_size=4096, dtype=jnp.float64))
    assert X.shape == (4096, 8, 8)
    np.testing.assert_allclose(X.mean(), 0.4, atol=0.05)
    np.testing.assert_allclose(X.std(), 0.8, atol=0.05)


def test_grf_cholesky_covariance():
    rf = GaussianRandomField.from_image(6, 6, mean=0.0, stddev=1.0,
                                        corrlength=0.3, truncation=None)
    key = jax.random.PRNGKey(1)
    X = np.asarray(rf.sample(key, batch_size=20000, dtype=jnp.float64))
    X = X.reshape(20000, -1)
    C_emp = np.cov(X.T)
    C = squared_exponential_covariance(pixel_center_points(6, 6), 1.0, 0.3)
    np.testing.assert_allclose(C_emp, C, atol=0.06)


def test_grf_fft_covariance():
    rf = GaussianRandomField.from_image(8, 8, mean=0.2, stddev=0.7,
                                        corrlength=0.1, method="fft")
    key = jax.random.PRNGKey(2)
    X = np.asarray(rf.sample(key, batch_size=20000, dtype=jnp.float64))
    assert X.shape == (20000, 8, 8)
    Xf = X.reshape(20000, -1)
    C_emp = np.cov(Xf.T)
    C = squared_exponential_covariance(pixel_center_points(8, 8), 0.7, 0.1)
    np.testing.assert_allclose(C_emp, C, atol=0.05)
    np.testing.assert_allclose(Xf.mean(), 0.2, atol=0.02)


def test_grf_fft_matmul_paths_agree():
    """The real-arithmetic MXU DFT path (used on TPU runtimes without
    complex support) must reproduce the complex-fft circulant sampling
    exactly (same PRNG key -> same fields)."""
    rf = GaussianRandomField.from_image(32, 32, mean=0.4, stddev=0.8,
                                        corrlength=0.08, method="fft")
    key = jax.random.PRNGKey(7)
    a = np.asarray(rf._sample_fft(key, 6, jnp.float32))
    b = np.asarray(rf._sample_fft_matmul(key, 6, jnp.float32))
    np.testing.assert_allclose(a, b, atol=5e-6)


def test_grf_max_sample_batch_bounds_memory():
    """The sampler's on-device batch cap shrinks with the embedding size
    (512^2 fields OOM at an unbounded 1024-chunk) but never below 8, and
    never disturbs the chunk stream of <=256^2 grids on the TPU path."""
    caps = []
    for n in (64, 128, 256, 512):
        rf = GaussianRandomField.from_image(n, n, 0.4, 0.8, 0.08,
                                            method="fft")
        caps.append(rf.max_sample_batch)
    assert all(c >= 8 for c in caps)
    assert all(a >= b for a, b in zip(caps, caps[1:]))  # monotone in size
    # dense paths are unbounded in practice
    rf_dense = GaussianRandomField.from_image(16, 16, 0.4, 0.8, 0.2)
    assert rf_dense.max_sample_batch == 4096


def test_convert_log_mean_std():
    mu, sigma = convert_log_mean_std(1.0, 0.5)
    # moments of the log-normal must reproduce mean/std
    m = np.exp(mu + sigma ** 2 / 2)
    s = np.sqrt((np.exp(sigma ** 2) - 1) * np.exp(2 * mu + sigma ** 2))
    np.testing.assert_allclose([m, s], [1.0, 0.5], rtol=1e-12)


def test_p1_interpolation_exact_for_linear():
    """Coarse P1 interpolation must be exact for functions linear on every
    coarse triangle -- in particular for globally linear u = a + bx + cy."""
    coarse = StructuredTriGrid(4, 4)
    fine = coarse.refined(2)
    W = physics_resolution_interpolator(coarse, fine)
    xyc = coarse.node_coords
    xyf = fine.node_coords
    for (a, b, c) in [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.2, -0.7, 1.3)]:
        uc = a + b * xyc[:, 0] + c * xyc[:, 1]
        uf = a + b * xyf[:, 0] + c * xyf[:, 1]
        np.testing.assert_allclose(W @ uc, uf, rtol=1e-12, atol=1e-12)


def test_interpolator_free_dof_restriction():
    coarse = StructuredTriGrid(4, 4)
    fine = coarse.refined(3)
    prof = DirichletProfile(fine)
    W = physics_resolution_interpolator(coarse, fine, free_dofs=prof.free_dofs)
    assert W.shape == (prof.n_free, coarse.n_nodes)
    # highres32 dims (SURVEY: 1023 free fine dofs x 25 rom dofs)
    assert W.shape == (1023, 25)
    # partition of unity
    np.testing.assert_allclose(W.sum(1), 1.0, rtol=1e-12)


def test_matern_kernels():
    from generative_physics_informed_pde_tpu.fem.randomfield import (
        stationary_covariance, _kernel_fn)
    X = pixel_center_points(5, 5)
    for k in ("matern12", "matern32", "matern52", "se"):
        C = stationary_covariance(X, 0.7, 0.2, kernel=k)
        # SPD-ish and correct variance on the diagonal
        np.testing.assert_allclose(np.diag(C), 0.7 ** 2 + 1e-12, rtol=1e-9)
        w = np.linalg.eigvalsh(C)
        assert w.min() > -1e-10
    # matern32 has the right closed form at r = l
    f = _kernel_fn("matern32", 1.0, 0.5)
    r = 0.5
    c = np.sqrt(3) / 0.5
    np.testing.assert_allclose(f(r), (1 + c * r) * np.exp(-c * r))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        _kernel_fn("bogus", 1.0, 1.0)


def test_grf_matern_fft_sampling():
    rf = GaussianRandomField.from_image(8, 8, mean=0.0, stddev=1.0,
                                        corrlength=0.2, method="fft",
                                        kernel="matern32")
    X = np.asarray(rf.sample(jax.random.PRNGKey(3), batch_size=4000,
                             dtype=jnp.float64))
    assert np.isfinite(X).all()
    np.testing.assert_allclose(X.std(), 1.0, atol=0.1)


def test_sample_numpy_matches_statistics():
    """Host-side numpy sampling reproduces the kernel statistics of the
    jax path (different stream, same law)."""
    rng = np.random.default_rng(0)
    rf = GaussianRandomField.from_image(6, 6, mean=0.3, stddev=0.9,
                                        corrlength=0.25, truncation=None)
    X = rf.sample_numpy(rng, 20000).reshape(20000, -1)
    C_emp = np.cov(X.T)
    C = squared_exponential_covariance(pixel_center_points(6, 6), 0.9, 0.25)
    np.testing.assert_allclose(C_emp, C, atol=0.06)
    np.testing.assert_allclose(X.mean(), 0.3, atol=0.02)
    # fft path
    rf2 = GaussianRandomField.from_image(8, 8, mean=0.0, stddev=0.5,
                                         corrlength=0.15, method="fft")
    X2 = rf2.sample_numpy(rng, 20000).reshape(20000, -1)
    C2 = squared_exponential_covariance(pixel_center_points(8, 8), 0.5, 0.15)
    np.testing.assert_allclose(np.cov(X2.T), C2, atol=0.03)


def test_fft_covariance_respects_physical_domain():
    """On a ly=lx=2 domain the fft path must use physical pixel widths --
    the old unit-domain assumption halved all distances, silently
    doubling the effective correlation length."""
    from generative_physics_informed_pde_tpu.fem import GaussianRandomField
    import numpy as _np
    kw = dict(mean=0.0, stddev=1.0, corrlength=0.25)
    rf_unit = GaussianRandomField.from_image(32, 32, **kw, method="fft")
    rf_wide = GaussianRandomField.from_image(32, 32, **kw, ly=2.0, lx=2.0,
                                             method="fft")
    # same pixel count, doubled physical spacing -> spectra must differ,
    # and the wide-domain spectrum must equal a unit-domain field with
    # HALF the correlation length (scale invariance of the SE kernel)
    rf_half = GaussianRandomField.from_image(32, 32, mean=0.0, stddev=1.0,
                                             corrlength=0.125, method="fft")
    assert not _np.allclose(rf_unit._fft_factor, rf_wide._fft_factor)
    _np.testing.assert_allclose(rf_wide._fft_factor, rf_half._fft_factor,
                                rtol=1e-12)


def test_sample_gamma_contracts():
    from generative_physics_informed_pde_tpu.fem import GaussianRandomField
    import numpy as _np
    import pytest as _pytest
    rf = GaussianRandomField.from_image(8, 8, 0.0, 1.0, 0.2,
                                        truncation="adaptive")
    k = rf._L.shape[1]
    g = _np.zeros((5, k))
    out = rf.sample(jax.random.PRNGKey(0), batch_size=5, gamma=g)
    assert out.shape == (5, 8, 8)
    _np.testing.assert_allclose(_np.asarray(out), 0.0, atol=1e-12)
    with _pytest.raises(ValueError):  # conflicting batch size
        rf.sample(jax.random.PRNGKey(0), batch_size=3, gamma=g)
    rf_fft = GaussianRandomField.from_image(32, 32, 0.0, 1.0, 0.1,
                                            method="fft")
    with _pytest.raises(ValueError):  # no latent contract on fft
        rf_fft.sample(jax.random.PRNGKey(0), batch_size=2,
                      gamma=_np.zeros((2, 4)))
    # near-constant field: the first eigenvalue explains everything;
    # adaptive truncation must keep one mode instead of raising
    rf_const = GaussianRandomField.from_image(8, 8, 0.0, 1.0, 50.0,
                                              truncation="adaptive")
    assert rf_const._L.shape[1] >= 1
    with _pytest.raises(ValueError):  # fft requires a grid
        GaussianRandomField(mean=0.0, stddev=1.0, corrlength=0.1,
                            X=_np.zeros((4, 2)), method="fft")
