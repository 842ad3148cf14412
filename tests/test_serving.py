"""AOT surrogate serving: export/deserialize roundtrip, bucket padding,
chunked oversize requests, on-disk bundle persistence.

The reference deploys its DiscriminativeModel by pickling the torch
module (generative.py:605-644); the rebuild's serving path is static
batch-bucket AOT export (serving.py) -- these tests pin its semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from generative_physics_informed_pde_tpu import fem
from generative_physics_informed_pde_tpu.models import (
    CNNDecoder, CNNEncoder, EffectivePropertyMap, ReducedOrderModelOperator,
    GenerativeModel, DiscriminativeModel)
from generative_physics_informed_pde_tpu.serving import (
    SurrogateBundle, surrogate_fn)


@pytest.fixture(scope="module")
def served_model():
    physics = fem.make_fom_rom_pair("ND", 4, 4, 2)  # 16x16 FOM
    g = ReducedOrderModelOperator.from_physics(physics)
    dec = CNNDecoder(target_img_size=16, dim_latent=8, latent_img_size=8,
                     latent_img_features=1, init_features=4, blocks=(1,),
                     growth_rate=4)
    enc = CNNEncoder(imsize=16, latent_dim=8, blocks=(1,), growth_rate=4,
                     init_features=4)
    gp = EffectivePropertyMap(latent_dim=8,
                              dim_effective_property=g.dim_effective_property)
    model = GenerativeModel(f=dec, g=g, gp=gp, encoder=enc,
                            dtype=jnp.float32)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(0.4, 0.8, (4, 16, 16)), dtype=jnp.float32)
    Y = jnp.asarray(rng.normal(size=(4, physics["fom"].dim_out)),
                    dtype=jnp.float32)
    F = jnp.zeros((4, physics["rom"].grid.n_nodes), dtype=jnp.float32)
    data = {"supervised": {"X": X, "Y": Y, "F_ROM_BC": F}}
    params, bs = model.init_params(jax.random.PRNGKey(0), data, (16, 16))
    dm = DiscriminativeModel(model)
    dim_F = physics["rom"].grid.n_nodes
    return physics, dm, params, bs, dim_F


def _request(n, dim_F, seed=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0.4, 0.8, (n, 16, 16)), dtype=jnp.float32)
    F = jnp.asarray(rng.normal(size=(n, dim_F)), dtype=jnp.float32)
    return x, F


@pytest.fixture(scope="module")
def bundle(served_model):
    _, dm, params, bs, dim_F = served_model
    return SurrogateBundle.build(dm, params, bs, (16, 16), dim_F,
                                 buckets=(4, 8), dtype=jnp.float32)


def test_export_matches_direct_call(served_model, bundle):
    _, dm, params, bs, dim_F = served_model
    x, F = _request(4, dim_F)
    direct = dm(params, bs, x, F)
    served = bundle.predict(x, F)
    np.testing.assert_allclose(np.asarray(served), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_bucket_padding_is_invisible(served_model, bundle):
    # n=3 pads to bucket 4; result must equal the n=3 rows of a direct call
    _, dm, params, bs, dim_F = served_model
    x, F = _request(3, dim_F, seed=2)
    served = bundle.predict(x, F)
    direct = dm(params, bs, x, F)
    assert served.shape == direct.shape == (3, direct.shape[1])
    np.testing.assert_allclose(np.asarray(served), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_oversize_request_streams_in_chunks(served_model, bundle):
    # n=13 > max bucket 8: streamed as 8 + padded 5
    _, dm, params, bs, dim_F = served_model
    x, F = _request(13, dim_F, seed=3)
    served = bundle.predict(x, F)
    direct = dm(params, bs, x, F)
    np.testing.assert_allclose(np.asarray(served), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_bundle_roundtrip_on_disk(served_model, bundle, tmp_path):
    _, dm, params, bs, dim_F = served_model
    path = str(tmp_path / "surrogate.zip")
    bundle.save(path)
    loaded = SurrogateBundle.load(path)
    assert loaded.buckets == bundle.buckets
    assert loaded.image_shape == (16, 16) and loaded.dim_F == dim_F
    x, F = _request(5, dim_F, seed=4)
    np.testing.assert_allclose(np.asarray(loaded.predict(x, F)),
                               np.asarray(bundle.predict(x, F)),
                               rtol=1e-6, atol=1e-6)


def test_surrogate_fn_is_closed_over_params(served_model):
    # the frozen closure must hold REAL copies: the trainer's jitted step
    # donates the TrainState, deleting the caller's buffers -- an
    # identity 'snapshot' would raise 'Array has been deleted' here
    _, dm, params, bs, dim_F = served_model
    p2 = jax.tree_util.tree_map(jnp.array, params)   # sacrificial copies
    b2 = jax.tree_util.tree_map(jnp.array, bs)
    fn = surrogate_fn(dm, p2, b2)
    x, F = _request(2, dim_F, seed=5)
    before = fn(x, F)
    for leaf in jax.tree_util.tree_leaves((p2, b2)):
        leaf.delete()  # simulate donation of the originals
    after = fn(x, F)  # closure must survive on its own buffers
    np.testing.assert_allclose(np.asarray(before), np.asarray(after))


def test_predict_validates_batch(bundle, served_model):
    _, _, _, _, dim_F = served_model
    x, F = _request(4, dim_F)
    with pytest.raises(ValueError):
        bundle.predict(x, F[:2])
    with pytest.raises(ValueError):
        bundle.predict(x[:0], F[:0])
    with pytest.raises(ValueError, match="image shape"):
        bundle.predict(x[:, :-1], F)
    with pytest.raises(ValueError, match="feature dim"):
        bundle.predict(x, F[:, :-1])


def test_predict_casts_input_dtype(bundle, served_model):
    """x64-enabled callers hand in float64 arrays; predict must cast to
    the exported dtype instead of failing deep in the StableHLO call."""
    _, _, _, _, dim_F = served_model
    x, F = _request(4, dim_F)
    y32 = bundle.predict(x, F)
    y64 = bundle.predict(np.asarray(x, np.float64),
                         np.asarray(F, np.float64))
    np.testing.assert_array_equal(np.asarray(y32), np.asarray(y64))
