"""ELBO math primitives.

TPU-native re-implementation of bottleneck/utils.py:216-248
(``reparametrize``, ``DiagonalGaussianLogLikelihood``,
``UnitGaussianKullbackLeiblerDivergence``, ``relative_error[_batched]``)
plus lamp/utils.py:5-20 (``coefficient_of_determination``).  All pure jnp,
vmap/jit friendly; reductions are SUMS over all elements to match the
reference ELBO scaling exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_2PI = 1.8378770664093453  # reference hard-codes this constant


def reparametrize(key, mean, logsigma):
    """mean + exp(logsigma) * eps (reference: bottleneck/utils.py:216-219)."""
    eps = jax.random.normal(key, jnp.shape(logsigma), dtype=jnp.result_type(mean))
    return mean + jnp.exp(logsigma) * eps


def diagonal_gaussian_log_likelihood(target, mean, logvars, reduce=jnp.sum):
    """Sum of elementwise Gaussian log-densities; ``logvars = 2 logsigma``
    (reference: bottleneck/utils.py:231-241)."""
    part2 = (target - mean) ** 2 * jnp.exp(-logvars)
    L = -0.5 * (logvars + part2 + LOG_2PI)
    return reduce(L) if reduce is not None else L


def unit_gaussian_kld(mean, logvars):
    """KL(N(mean, exp(logvars)) || N(0, I)) summed over everything
    (reference: bottleneck/utils.py:246-248)."""
    return -0.5 * jnp.sum(1 + logvars - mean ** 2 - jnp.exp(logvars))


def bernoulli_log_likelihood(predict, target):
    """Binary-field path: -BCE(sum) with targets binarised at the minimum
    (reference: generative.py:240-244)."""
    t = jnp.where(target == target.min(), 0.0, 1.0)
    p = jnp.clip(predict, 1e-12, 1 - 1e-12)
    return jnp.sum(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))


def relative_error(y, y_true):
    """||y - y*|| / ||y*|| (reference: bottleneck/utils.py:222-224)."""
    return jnp.linalg.norm(y - y_true) / jnp.linalg.norm(y_true)


def relative_error_batched(Y, Y_true):
    """Mean over the batch of per-row relative L2 errors
    (reference: bottleneck/utils.py:227-228)."""
    num = jnp.sqrt(jnp.sum((Y - Y_true) ** 2, axis=1))
    den = jnp.sqrt(jnp.sum(Y_true ** 2, axis=1))
    return jnp.mean(num / den)


def coefficient_of_determination(y_pred, y, global_average: bool = False):
    """R^2; per-dimension mean by default (reference: lamp/utils.py:5-20)."""
    y_pred = y_pred.reshape(y_pred.shape[0], -1)
    y = y.reshape(y.shape[0], -1)
    if global_average:
        e = jnp.sum((y - y_pred) ** 2) / jnp.sum((y - y.mean()) ** 2)
        return 1.0 - e
    e = jnp.sum((y - y_pred) ** 2, 0) / jnp.sum((y - y.mean(0)) ** 2, 0)
    return jnp.mean(1.0 - e)


def predictive_logscore(y_true, y_mean, y_std):
    """Mean Gaussian predictive log-density (reference:
    bottleneck/components.py:620-632)."""
    return jnp.mean(-jnp.log(y_std)
                    - 0.5 * (y_true - y_mean) ** 2 / y_std ** 2
                    - 0.5 * LOG_2PI)
