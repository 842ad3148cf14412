"""Model variants not covered elsewhere: DenseED, linear/MLP codecs,
binary and homoscedastic decoders, param utilities."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from generative_physics_informed_pde_tpu.models import (
    DenseED, LinearEncoder, LinearDecoder, NeuralNetworkEncoder,
    NeuralNetworkDecoder, CNNDecoder)
from generative_physics_informed_pde_tpu.inference.likelihoods import (
    bernoulli_log_likelihood)
from generative_physics_informed_pde_tpu.utils import (
    count_parameters, global_norm, freeze_optimizer)


@pytest.mark.slow
def test_dense_ed_shapes():
    m = DenseED(out_channels=2, blocks=(1, 2, 1), growth_rate=4,
                init_features=8)
    x = jnp.zeros((2, 32, 32, 1))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, 32, 32, 2)
    try:
        DenseED(out_channels=1, blocks=(1, 1)).init(
            jax.random.PRNGKey(0), x, train=False)
        raise AssertionError("even blocks should fail")
    except ValueError:
        pass


def test_linear_and_mlp_codecs():
    enc = LinearEncoder(dim_in=64, latent_dim=4)
    x = jnp.zeros((3, 8, 8))
    v = enc.init(jax.random.PRNGKey(0), x)
    mu, ls = enc.apply(v, x)
    assert mu.shape == (3, 4) and ls.shape == (3, 4)

    nne = NeuralNetworkEncoder(dim_in=64, latent_dim=4, num_hidden_layers=2)
    v2 = nne.init(jax.random.PRNGKey(0), x)
    mu2, _ = nne.apply(v2, x)
    assert mu2.shape == (3, 4)

    dec = LinearDecoder(dim_latent=4, dim_out=64)
    z = jnp.zeros((3, 4))
    v3 = dec.init(jax.random.PRNGKey(0), z)
    m3, s3 = dec.apply(v3, z)
    assert m3.shape == (3, 64)

    nnd = NeuralNetworkDecoder(dim_latent=4, dim_out=64, num_hidden_layers=1)
    v4 = nnd.init(jax.random.PRNGKey(0), z)
    m4, _ = nnd.apply(v4, z)
    assert m4.shape == (3, 64)


def test_binary_and_homoscedastic_decoders():
    z = jnp.zeros((2, 8))
    dec_b = CNNDecoder(target_img_size=16, dim_latent=8, latent_img_size=8,
                       latent_img_features=1, init_features=4, blocks=(1,),
                       growth_rate=4, binary=True)
    v = dec_b.init(jax.random.PRNGKey(0), z, train=False)
    out = dec_b.apply(v, z, train=False)
    assert out.shape == (2, 16, 16)
    assert float(out.min()) >= 0 and float(out.max()) <= 1  # sigmoid

    dec_h = CNNDecoder(target_img_size=16, dim_latent=8, latent_img_size=8,
                       latent_img_features=1, init_features=4, blocks=(1,),
                       growth_rate=4, homoscedastic=True)
    vh = dec_h.init(jax.random.PRNGKey(0), z, train=False)
    mean, logsigma = dec_h.apply(vh, z, train=False)
    assert mean.shape == (2, 16, 16)
    np.testing.assert_allclose(np.asarray(logsigma), 0.0)  # shared param


def test_bernoulli_likelihood():
    target = jnp.asarray([[0.1, 0.9], [0.1, 0.9]])  # min -> class 0
    predict = jnp.asarray([[0.01, 0.99], [0.2, 0.7]])
    got = float(bernoulli_log_likelihood(predict, target))
    t = np.array([[0.0, 1.0], [0.0, 1.0]])
    p = np.asarray(predict)
    expect = (t * np.log(p) + (1 - t) * np.log(1 - p)).sum()
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_param_utils_and_freezing():
    params = {"f": {"w": jnp.ones((3, 4))}, "q_z": {"mean": jnp.ones(5)}}
    assert count_parameters(params) == 17
    np.testing.assert_allclose(float(global_norm(params)), np.sqrt(17.0))

    opt = freeze_optimizer(optax.sgd(1.0), params, frozen=["f"])
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["f"]["w"]), 0.0)
    np.testing.assert_allclose(np.asarray(updates["q_z"]["mean"]), -1.0)
