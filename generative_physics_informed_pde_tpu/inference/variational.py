"""Non-amortized per-datapoint Gaussian variational approximations.

TPU-native re-implementation of ``VariationalApproximation``
(reference: bottleneck/components.py:71-198) as a parameter pytree plus
pure functions -- the natural JAX shape for something whose 'parameters'
are optimised by the outer optax optimiser.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .likelihoods import unit_gaussian_kld


def init_variational(N: int, dim: int, dtype=jnp.float32,
                     init_logsigma: float = 0.0) -> dict:
    """Zero-mean, logsigma-init pytree (reference inits both to zeros,
    components.py:82-83; ``init_standard_deviation`` maps to
    init_logsigma=log(stddev), components.py:143-145)."""
    return {
        "mean": jnp.zeros((N, dim), dtype=dtype),
        "logsigma": jnp.full((N, dim), init_logsigma, dtype=dtype),
    }


def sample(params: dict, key) -> jnp.ndarray:
    """One reparameterised sample per datapoint, (N, dim)
    (reference: components.py:167-172)."""
    eps = jax.random.normal(key, params["logsigma"].shape,
                            dtype=params["mean"].dtype)
    return params["mean"] + jnp.exp(params["logsigma"]) * eps


def sample_component(params: dict, index, key, batch_size: int) -> jnp.ndarray:
    """(batch_size, dim) samples of datapoint ``index``
    (reference: components.py:174-180)."""
    mean = params["mean"][index]
    logsigma = params["logsigma"][index]
    eps = jax.random.normal(key, (batch_size,) + mean.shape, dtype=mean.dtype)
    return mean + jnp.exp(logsigma) * eps


def sample_all_components(params: dict, key, batch_size: int) -> jnp.ndarray:
    """(N, batch_size, dim) MC samples for every datapoint at once --
    vmapped replacement for the reference's per-index python loops
    (components.py:504-509, generative.py:198-207)."""
    mean = params["mean"][:, None, :]
    logsigma = params["logsigma"][:, None, :]
    eps = jax.random.normal(
        key, (mean.shape[0], batch_size, mean.shape[-1]),
        dtype=params["mean"].dtype)
    return mean + jnp.exp(logsigma) * eps


def kld(params: dict) -> jnp.ndarray:
    """Unit-Gaussian KL, summed (reference: components.py:192-193)."""
    return unit_gaussian_kld(params["mean"], 2.0 * params["logsigma"])


def entropy(params: dict) -> jnp.ndarray:
    """Gaussian entropy, summed over datapoints and dims
    (reference: components.py:195-197; note the reference's additive
    constant uses N instead of N*dim -- a bug with no gradient effect.
    We use the correct constant)."""
    N = params["mean"].shape[0]
    dim = params["mean"].shape[1]
    const = N * dim * 0.5 * (np.log(2 * np.pi) + 1.0)
    return jnp.sum(params["logsigma"]) + const


def init_by_encoder(apply_encoder, X) -> dict:
    """Initialise (mean, logsigma) from an amortized encoder
    (reference: components.py:160-165)."""
    mu, logsigma = apply_encoder(X)
    return {"mean": mu, "logsigma": logsigma}
