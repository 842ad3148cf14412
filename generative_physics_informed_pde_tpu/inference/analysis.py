"""Posterior-predictive evaluation (metrics over a dataset).

TPU-native re-implementation of ``Analysis`` / ``DataPair``
(reference: bottleneck/components.py:396-653).  The reference loops over
validation indices in Python (components.py:504-509); here the whole
MC-sample -> propagate -> metric pipeline is a single vmapped, jittable
function over the dataset.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

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
                            index=None):
        """MC samples of y: z ~ q -> gp.propagate -> g.propagate (reference:
        components.py:471-478).  index=None -> all datapoints at once,
        returning (N, S, dim_y)."""
        k1, k2, k3 = jax.random.split(key, 3)
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
        python loop of components.py:494-524 with one fused computation."""

        def fn(params, q, key):
            Ys = self.sample_predictive_y(params, q, key, n_monte_carlo)
            y_mean = Ys.mean(axis=1)
            y_std = Ys.std(axis=1, ddof=1)
            Y = self.data["Y"].astype(y_mean.dtype)
            relerr = jax.vmap(relative_error)(y_mean, Y).mean()
            logscore = jax.vmap(predictive_logscore)(Y, y_mean, y_std).mean()
            r2 = coefficient_of_determination(y_mean, Y)
            return {"relerr_y": relerr, "r2_y": r2, "logscore_y": logscore,
                    "y_mean": y_mean, "y_std": y_std}

        return fn

    def eval_all_y(self, params, q, key, n_monte_carlo: int,
                   iteration: Optional[int] = None,
                   return_mean_std: bool = False):
        """Reference eval_all_y semantics (components.py:494-524): record
        series when an iteration is given, else return the scalars."""
        if n_monte_carlo not in self._jitted:
            self._jitted[n_monte_carlo] = jax.jit(
                self.eval_all_y_fn(n_monte_carlo))
        out = self._jitted[n_monte_carlo](params, q, key)
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

    def eval_all_x_fn(self, n_monte_carlo: int, batch_stats):
        """x-space metrics: relerr_x + predictive logscore on the field
        reconstruction (reference: components.py:568-590, 636-653), fully
        vmapped over the dataset."""

        def fn(params, q, key):
            k1, k2 = jax.random.split(key)
            Zs = va.sample_all_components(q, k1, n_monte_carlo)  # (N, S, dz)
            N, S, dz = Zs.shape
            (mean, logsigma), _ = self.model.apply_decoder(
                params, batch_stats, Zs.reshape(N * S, dz), train=False)
            eps = jax.random.normal(k2, mean.shape, dtype=mean.dtype)
            Xs = (mean + jnp.exp(logsigma) * eps).reshape((N, S, -1))
            x_mean = Xs.mean(axis=1)
            x_std = Xs.std(axis=1, ddof=1)
            X = self.data["X"].reshape(N, -1).astype(x_mean.dtype)
            relerr = jax.vmap(relative_error)(x_mean, X).mean()
            logscore = jax.vmap(predictive_logscore)(X, x_mean, x_std).mean()
            return {"relerr_x": relerr, "logscore_x": logscore}

        return fn

    def eval_all(self, params, batch_stats, q, key, n_monte_carlo: int,
                 iteration: Optional[int] = None):
        """Both x and y metric families (reference eval_all,
        components.py:486-491)."""
        self.eval_all_y(params, q, key, n_monte_carlo, iteration=iteration)
        key_x = jax.random.fold_in(key, 1)
        cache_key = ("x", n_monte_carlo)
        if cache_key not in self._jitted:
            self._jitted[cache_key] = jax.jit(
                self.eval_all_x_fn(n_monte_carlo, batch_stats))
        out = self._jitted[cache_key](params, q, key_x)
        if iteration is not None:
            self.series["relerr_x"].append(iteration, out["relerr_x"])
            self.series["logscore_x"].append(iteration, out["logscore_x"])
        return {k: float(v) for k, v in out.items()}

    @classmethod
    def from_encoder(cls, model, params, batch_stats, data, **kw):
        """Amortized-posterior analysis: q = encoder(X) with frozen params
        (reference: components.py:453-457)."""
        (mean, logsigma), _ = model.apply_encoder(params, batch_stats,
                                                  data["X"], train=False)
        q = {"mean": mean, "logsigma": logsigma}
        analysis = cls(model=model, data=data, **kw)
        return analysis, q
