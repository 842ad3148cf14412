"""Test-time inference for held-out data (the "prediction ensemble").

TPU-native re-implementation of ``PredictionEnsemble``
(reference: bottleneck/components.py:326-394): a fresh per-datapoint
variational posterior over the validation set optimised by its own Adam
against the reconstruction-only ELBO ``logL_x - KLD``, a few steps per
training iteration.  Here the inner optimisation is a pure function
(fori_loop of optax updates) that the trainer fuses into its jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from . import variational as va


@dataclasses.dataclass
class PredictionEnsemble:
    """Static config; state (q params + opt state) lives in the train state."""

    model: "GenerativeModel"  # noqa: F821
    X: jnp.ndarray            # validation fields (N, py, px)
    optimizer: optax.GradientTransformation
    # Hot-loop decode compute dtype (None = the model's own precision).
    # The inner SVI only optimises the VALIDATION posterior q -- it never
    # touches model parameters -- so reduced precision here cannot perturb
    # the training trajectory; the finalize-time refinement passes
    # ``final=True`` to run at full precision before the final metrics.
    compute_dtype: object = None

    def _decoder_module(self, final: bool):
        if final or self.compute_dtype is None:
            return None
        if not hasattr(self.model.f, "compute_dtype"):
            # decoders without a compute_dtype field (e.g. LinearDecoder)
            # run at their own precision -- same guard as
            # GenerativeModel._unsup_modules
            return None
        return self.model.f.clone(compute_dtype=self.compute_dtype)

    def init(self, dtype=jnp.float32) -> Tuple[dict, optax.OptState]:
        q = va.init_variational(self.X.shape[0], self.model.dim_latent,
                                dtype=dtype)
        return q, self.optimizer.init(q)

    def elbo(self, params, batch_stats, q, key, *, final: bool = False):
        """Reconstruction-only ELBO (reference: components.py:357-363)."""
        k1, kd = jax.random.split(key)
        Z = va.sample(q, k1)
        predict_x, _ = self.model.apply_decoder(
            params, batch_stats, Z, train=True, key=kd,
            module=self._decoder_module(final))
        logL = self.model.random_field_likelihood(predict_x, self.X)
        return logL - va.kld(q), logL

    def update(self, params, batch_stats, q, opt_state, key, num_iter: int,
               final: bool = False):
        """num_iter Adam steps on q only (reference: components.py:365-388).
        Pure: returns (q, opt_state, last_elbo, last_logL)."""

        def body(i, carry):
            q, opt_state, _, _ = carry
            k = jax.random.fold_in(key, i)

            def loss(qp):
                elbo, logL = self.elbo(params, batch_stats, qp, k,
                                       final=final)
                return -elbo, logL

            (neg_elbo, logL), grads = jax.value_and_grad(
                loss, has_aux=True)(q)
            updates, opt_state = self.optimizer.update(grads, opt_state, q)
            q = optax.apply_updates(q, updates)
            return (q, opt_state, -neg_elbo, logL)

        init = (q, opt_state, jnp.zeros((), dtype=self.X.dtype),
                jnp.zeros((), dtype=self.X.dtype))
        return jax.lax.fori_loop(0, num_iter, body, init)
