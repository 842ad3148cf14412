"""Posterior-predictive evaluation (metrics over a dataset).

TPU-native re-implementation of ``Analysis`` / ``DataPair``
(reference: bottleneck/components.py:396-653).  The reference loops over
validation indices in Python (components.py:504-509); here the whole
MC-sample -> propagate -> metric pipeline is a single vmapped, jittable
function over the dataset.
"""

from __future__ import annotations

import dataclasses
import math
from math import prod as np_prod
from typing import Dict, Optional

import jax
import jax.numpy as jnp

# Largest MC-sample block (in array elements of the N x S_chunk x dim
# working set) a single fused eval dispatch may materialise.  Above this
# the eval streams over MC chunks with lax.map, accumulating first and
# second moments -- at 512^2 (dim_y = 263,169) a one-shot S=128 eval
# over 32 validation fields allocates >4 GB for Ys alone plus
# propagation intermediates and crashed the v5e worker (HBM OOM); the
# chunked path bounds the working set at ~0.5 GB regardless of grid.
_EVAL_ELEMENT_BUDGET = 2 ** 27


def _mc_chunk(n_monte_carlo: int, per_mc_elements: int,
              budget: Optional[int] = None):
    """Split ``n_monte_carlo`` into equal chunks whose N*chunk*dim
    working set stays under ``budget`` elements (default: the module
    budget, resolved at call time so tests can patch it).  Returns
    (chunk, n_chunks); chunk * n_chunks >= n_monte_carlo (the effective
    sample count is rounded up -- more MC samples, never fewer)."""
    if budget is None:
        budget = _EVAL_ELEMENT_BUDGET
    chunk = max(1, min(n_monte_carlo, budget // max(per_mc_elements, 1)))
    n_chunks = math.ceil(n_monte_carlo / chunk)
    return chunk, n_chunks

from . import variational as va
from .likelihoods import (coefficient_of_determination, predictive_logscore,
                          relative_error)
from ..models.components import propagate_gp_samples


class DataPair:
    """(iteration, value) series with optional metrics-writer mirroring
    (reference: components.py:396-424)."""

    def __init__(self, writer=None, label: str = "", name: Optional[str] = None):
        if writer is not None and name is None:
            raise ValueError("writer requires a name")
        self.iteration = []
        self.value = []
        self._writer = writer
        self._label = label
        self._name = name

    def append(self, iteration, value):
        value = float(value)
        self.iteration.append(iteration)
        self.value.append(value)
        if self._writer is not None:
            self._writer.add_scalar(f"{self._label}/{self._name}", value,
                                    global_step=iteration)

    def min(self):
        return min(self.value)

    def max(self):
        return max(self.value)

    def final(self):
        return self.value[-1]


@dataclasses.dataclass
class Analysis:
    """Evaluate posterior-predictive y (and x) metrics for one dataset.

    ``q`` is a variational-approximation pytree over the dataset; ``model``
    the static GenerativeModel; ``data`` holds 'X', 'Y', 'F_ROM_BC'.
    """

    model: "GenerativeModel"  # noqa: F821
    data: Dict[str, jnp.ndarray]
    label: str = "validation"
    writer: object = None

    def __post_init__(self):
        self.series = {
            name: DataPair(self.writer, self.label, name)
            for name in ("relerr_x", "relerr_y", "logscore_x", "logscore_y",
                         "r2_y")
        }
        self._jitted = {}

    # ----------------------------------------------------------- sampling
    def sample_predictive_y(self, params, q, key, n_monte_carlo: int,
                            index=None, F=None):
        """MC samples of y: z ~ q -> gp.propagate -> g.propagate (reference:
        components.py:471-478).  index=None -> all datapoints at once,
        returning (N, S, dim_y).  ``F`` defaults to the instance data;
        the jitted eval paths pass it explicitly -- closing over a
        process-spanning (multi-host dp-sharded) array inside jit is an
        error, and even single-host it would bloat the HLO payload (the
        no-constants rule, see _build_train_step)."""
        k1, k2, k3 = jax.random.split(key, 3)
        if F is None:
            F = self.data["F_ROM_BC"]
        if index is None:
            Zs = va.sample_all_components(q, k1, n_monte_carlo)  # (N, S, dz)
            N = Zs.shape[0]
            gp_out = self.model.apply_gp(params, Zs.reshape(-1, Zs.shape[-1]))
            Xs = propagate_gp_samples(gp_out, k2).reshape(N, n_monte_carlo, -1)
            F_rep = jnp.broadcast_to(F[:, None, :],
                                     (N, n_monte_carlo, F.shape[-1]))
            Ys = self.model.g.propagate_samples(
                params["g"], Xs.reshape(N * n_monte_carlo, -1),
                F_rep.reshape(N * n_monte_carlo, -1), k3)
            return Ys.reshape(N, n_monte_carlo, -1)
        Zs = va.sample_component(q, index, k1, n_monte_carlo)
        gp_out = self.model.apply_gp(params, Zs)
        Xs = propagate_gp_samples(gp_out, k2)
        F_rep = jnp.broadcast_to(F[index][None, :],
                                 (n_monte_carlo, F.shape[-1]))
        return self.model.g.propagate_samples(params["g"], Xs, F_rep, k3)

    def sample_predictive_x(self, params, batch_stats, q, key,
                            n_monte_carlo: int, index):
        """MC reconstruction samples (reference: components.py:480-484)."""
        k1, k2 = jax.random.split(key)
        Zs = va.sample_component(q, index, k1, n_monte_carlo)
        (mean, logsigma), _ = self.model.apply_decoder(
            params, batch_stats, Zs, train=False)
        eps = jax.random.normal(k2, mean.shape, dtype=mean.dtype)
        return mean + jnp.exp(logsigma) * eps

    # ------------------------------------------------------------ metrics
    def eval_all_y_fn(self, n_monte_carlo: int):
        """Build the jittable metric function (params, q, key) ->
        dict(relerr_y, r2_y, logscore_y, y_mean, y_std).  Replaces the
        python loop of components.py:494-524 with one fused computation.

        When N * n_monte_carlo * dim_y exceeds the element budget (large
        grids: 512^2 and up), the MC axis is streamed in lax.map chunks
        with first/second-moment accumulation so the working set stays
        bounded -- the one-shot variant OOMs the TPU worker at that
        scale (see _EVAL_ELEMENT_BUDGET)."""
        N, dim_y = self.data["Y"].shape[0], self.data["Y"].shape[-1]
        chunk, n_chunks = _mc_chunk(n_monte_carlo, N * dim_y)

        # data (Y, F) rides as ARGUMENTS, not closure constants: sharded
        # (possibly process-spanning) arrays cannot be closed over inside
        # jit, and constants bloat the HLO payload at large grids
        def metrics(y_mean, y_std, Y):
            Y = Y.astype(y_mean.dtype)
            relerr = jax.vmap(relative_error)(y_mean, Y).mean()
            logscore = jax.vmap(predictive_logscore)(Y, y_mean, y_std).mean()
            r2 = coefficient_of_determination(y_mean, Y)
            return {"relerr_y": relerr, "r2_y": r2, "logscore_y": logscore,
                    "y_mean": y_mean, "y_std": y_std}

        if n_chunks == 1:
            def fn(params, q, key, Y, F):
                Ys = self.sample_predictive_y(params, q, key, n_monte_carlo,
                                              F=F)
                # same 1e-12 variance floor as the chunked path: a
                # collapsed posterior must not yield -log(0) = inf here
                # while reporting a finite clamped value there
                std = jnp.maximum(Ys.std(axis=1, ddof=1), 1e-6)
                return metrics(Ys.mean(axis=1), std, Y)
            return fn

        S_eff = chunk * n_chunks  # MC count rounded UP to fill chunks

        def fn(params, q, key, Y, F):
            keys = jax.random.split(key, n_chunks)

            def body(k):
                Ys = self.sample_predictive_y(params, q, k, chunk, F=F)
                return Ys.sum(axis=1), jnp.square(Ys).sum(axis=1)

            s1, s2 = jax.lax.map(body, keys)      # (n_chunks, N, dim_y)
            s1, s2 = s1.sum(axis=0), s2.sum(axis=0)
            y_mean = s1 / S_eff
            # streamed E[y^2] - E[y]^2; clamp the f32 cancellation noise
            var = jnp.maximum(
                (s2 - S_eff * jnp.square(y_mean)) / (S_eff - 1), 1e-12)
            return metrics(y_mean, jnp.sqrt(var), Y)

        return fn

    def eval_all_y(self, params, q, key, n_monte_carlo: int,
                   iteration: Optional[int] = None,
                   return_mean_std: bool = False):
        """Reference eval_all_y semantics (components.py:494-524): record
        series when an iteration is given, else return the scalars."""
        if n_monte_carlo not in self._jitted:
            self._jitted[n_monte_carlo] = jax.jit(
                self.eval_all_y_fn(n_monte_carlo))
        out = self._jitted[n_monte_carlo](params, q, key, self.data["Y"],
                                          self.data["F_ROM_BC"])
        if iteration is None:
            if return_mean_std:
                raise RuntimeError("nope")  # reference parity
            return (float(out["logscore_y"]), float(out["r2_y"]),
                    float(out["relerr_y"]))
        self.series["relerr_y"].append(iteration, out["relerr_y"])
        self.series["logscore_y"].append(iteration, out["logscore_y"])
        self.series["r2_y"].append(iteration, out["r2_y"])
        if return_mean_std:
            return out["y_mean"], out["y_std"]

    def eval_all_x_fn(self, n_monte_carlo: int, batch_stats=None):
        """x-space metrics: relerr_x + predictive logscore on the field
        reconstruction (reference: components.py:568-590, 636-653), fully
        vmapped over the dataset.

        ``batch_stats`` is an ARGUMENT of the built function (like X):
        closing over it would both bake the first call's BatchNorm
        statistics into the cached jit (stale on every later call) and
        break under multi-host sharded state.  The parameter is kept for
        backward compatibility and ignored."""
        del batch_stats

        N = self.data["X"].shape[0]
        dim_x = int(np_prod(self.data["X"].shape[1:]))
        # DenseNet decode intermediates run ~8x the output pixels, so the
        # x-eval budget is 8x tighter than the y-eval one
        chunk, n_chunks = _mc_chunk(n_monte_carlo, N * dim_x,
                                    budget=_EVAL_ELEMENT_BUDGET // 8)

        def decode_chunk(params, batch_stats, q, k, S):
            k1, k2 = jax.random.split(k)
            Zs = va.sample_all_components(q, k1, S)  # (N, S, dz)
            (mean, logsigma), _ = self.model.apply_decoder(
                params, batch_stats, Zs.reshape(N * S, -1), train=False)
            eps = jax.random.normal(k2, mean.shape, dtype=mean.dtype)
            return (mean + jnp.exp(logsigma) * eps).reshape((N, S, -1))

        def metrics(x_mean, x_std, X):
            X = X.reshape(N, -1).astype(x_mean.dtype)
            relerr = jax.vmap(relative_error)(x_mean, X).mean()
            logscore = jax.vmap(predictive_logscore)(X, x_mean, x_std).mean()
            return {"relerr_x": relerr, "logscore_x": logscore}

        if n_chunks == 1:
            def fn(params, batch_stats, q, key, X):
                Xs = decode_chunk(params, batch_stats, q, key, n_monte_carlo)
                std = jnp.maximum(Xs.std(axis=1, ddof=1), 1e-6)
                return metrics(Xs.mean(axis=1), std, X)
            return fn

        S_eff = chunk * n_chunks

        def fn(params, batch_stats, q, key, X):
            keys = jax.random.split(key, n_chunks)

            def body(k):
                Xs = decode_chunk(params, batch_stats, q, k, chunk)
                return Xs.sum(axis=1), jnp.square(Xs).sum(axis=1)

            s1, s2 = jax.lax.map(body, keys)
            s1, s2 = s1.sum(axis=0), s2.sum(axis=0)
            x_mean = s1 / S_eff
            var = jnp.maximum(
                (s2 - S_eff * jnp.square(x_mean)) / (S_eff - 1), 1e-12)
            return metrics(x_mean, jnp.sqrt(var), X)

        return fn

    def eval_all(self, params, batch_stats, q, key, n_monte_carlo: int,
                 iteration: Optional[int] = None):
        """Both x and y metric families (reference eval_all,
        components.py:486-491)."""
        y = self.eval_all_y(params, q, key, n_monte_carlo,
                            iteration=iteration)
        key_x = jax.random.fold_in(key, 1)
        cache_key = ("x", n_monte_carlo)
        if cache_key not in self._jitted:
            self._jitted[cache_key] = jax.jit(self.eval_all_x_fn(n_monte_carlo))
        out = self._jitted[cache_key](params, batch_stats, q, key_x,
                                      self.data["X"])
        res = {k: float(v) for k, v in out.items()}
        if iteration is not None:
            self.series["relerr_x"].append(iteration, out["relerr_x"])
            self.series["logscore_x"].append(iteration, out["logscore_x"])
        else:
            # with no series to record into, the y scalars must come back
            # to the caller -- dropping them wastes the whole MC propagate
            res["logscore_y"], res["r2_y"], res["relerr_y"] = y
        return res

    @classmethod
    def from_encoder(cls, model, params, batch_stats, data, **kw):
        """Amortized-posterior analysis: q = encoder(X) with frozen params
        (reference: components.py:453-457)."""
        (mean, logsigma), _ = model.apply_encoder(params, batch_stats,
                                                  data["X"], train=False)
        q = {"mean": mean, "logsigma": logsigma}
        analysis = cls(model=model, data=data, **kw)
        return analysis, q
