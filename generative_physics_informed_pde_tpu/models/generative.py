"""The semi-supervised physics-informed VAE and its composite ELBO.

TPU-native re-implementation of ``GenerativeModel``
(reference: bottleneck/generative.py:10-585) as a *static* model object
plus pure functions over a parameter pytree:

    params = {
      'f':   decoder params,           'encoder': encoder params (optional),
      'gp':  effective-property map,   'g': {'logsigmas_y': ...},
      'q_z': {modality: {'mean','logsigma'}},   # non-amortized posteriors
      'q_X': {modality: {'mean','logsigma'}},   # when independent_X
    }

ELBO structure mirrors generative.py:247-287:
  elbo = elbo_supervised (lockX/freeX, :418-500)
       + elbo_unsupervised | elbo_unsupervised_amortized (:515-585)
       + elbo_virtual_observables (lockX/freeX, :290-392)
with all likelihoods summed (not averaged) unless ``normalize``.

Everything here is jit/vmap/grad-compatible; the training loop jits one
step closing over the registered datasets.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..inference import variational as va
from ..inference.likelihoods import (bernoulli_log_likelihood,
                                     diagonal_gaussian_log_likelihood,
                                     reparametrize, unit_gaussian_kld)
from .components import ReducedOrderModelOperator, propagate_gp_samples


@dataclasses.dataclass
class GenerativeModel:
    """Static wiring of decoder f, ROM operator g, property map gp and an
    optional amortized encoder (reference constructor generative.py:12-49).
    """

    f: nn.Module                       # decoder z -> (mu_x, logsigma_x) images
    g: ReducedOrderModelOperator       # (X_c, F) -> (mu_y, logsigma_y)
    gp: nn.Module                      # z -> X_c (or (mu_X, logsigma_X))
    encoder: Optional[nn.Module] = None
    independent_X: bool = True
    binary_field: bool = False
    reconstruct_log_eff_property: bool = True   # config flag (generative.py:45)
    disable_elbo_vo: bool = False
    disable_elbo_supervised: bool = False
    disable_elbo_unsupervised: bool = False
    preprocess_y: Optional[Callable] = None     # hook (generative.py:51-56)
    n_mc: int = 1   # MC ELBO samples per step (reference uses 1; >1 is the
    #                 BASELINE config-3 extension, averaged per-term)
    # Optional NamedSharding for the flattened (N*n_mc) Monte-Carlo batch
    # axis: on a ("dp","mc") mesh the S-fold replicated supervised batch is
    # spread over BOTH axes (SURVEY §2.7's MC-ELBO-sample axis), so the
    # n_mc>1 decode + embedded ROM solves scale over dp*mc devices instead
    # of replicating over 'mc'.  Set via Trainer.setup(mesh=...).
    mc_sharding: Any = None
    # Fuse the per-modality decoder applies (supervised + amortized
    # unsupervised + VO z-samples) into ONE batched decode per ELBO
    # evaluation.  The reference decodes each term separately
    # (generative.py:418-585).  Measured on v5e at 64^2 this is
    # throughput-neutral -- the conv kernels scale with batch, so fusing
    # buys nothing (PARITY.md step speed-of-light study); kept as tested
    # opt-in infrastructure.
    # Deviation when train=True: BatchNorm batch statistics are computed
    # over the concatenated batch instead of per-term, and dropout masks
    # are drawn per fused batch.  With train=False the fused path is
    # bit-identical to the unfused one.  Ignored when mc_sharding is set.
    fuse_decodes: bool = False
    # Rematerialize codec activations in the backward pass
    # (jax.checkpoint around the train-mode decoder/encoder applies).
    # Bit-identical math -- the same ops are recomputed instead of having
    # their activations round-trip HBM.  The 128^2 step is HBM-bound with
    # ~1 GB/step of traffic against ~microseconds of MXU compute
    # (PARITY.md 128^2 roofline), so trading recompute for activation
    # traffic is the textbook lever; measured A/B in PARITY.md round 4.
    remat_codec: bool = False
    # Reduced-precision conv compute for the UNSUPERVISED term only (e.g.
    # jnp.bfloat16).  After the round-4 PE optimizations the unlabeled
    # reconstruction is the largest 128^2 step term (~45%, PARITY.md) and
    # is pure codec fwd+bwd -- no ROM solve.  Unlike PE_compute_dtype this
    # DOES perturb training: the unsup gradients and the SHARED BatchNorm
    # batch stats ('f'/'encoder') see bf16 activations, so it ships
    # opt-in, gated on the measured quality A/B (PARITY.md).  The
    # supervised and VO terms always run at full precision.  Ignored on
    # the fused decode path (fuse_decodes pre-decodes all terms at full
    # precision).
    unsup_compute_dtype: Any = None
    dtype: Any = jnp.float32

    # ------------------------------------------------------------- shapes
    @property
    def dim_latent(self) -> int:
        return self.f.dim_latent

    @property
    def dim_effective_property(self) -> int:
        return self.g.dim_effective_property

    @property
    def dim_y(self) -> int:
        return self.g.dim_out

    def _preprocess(self, y):
        return y if self.preprocess_y is None else self.preprocess_y(y)

    # ------------------------------------------------------- param init
    def init_params(self, key, datasets: Dict[str, dict],
                    image_shape) -> tuple:
        """Create the full parameter pytree.  ``datasets`` maps modality ->
        dict with at least 'X' (to size the per-datapoint posteriors,
        reference register_* generative.py:142-179)."""
        kf, ke, kg = jax.random.split(key, 3)
        x_dummy = jnp.zeros((1,) + tuple(image_shape), dtype=self.dtype)
        z_dummy = jnp.zeros((1, self.dim_latent), dtype=self.dtype)

        params: dict = {}
        # jit the inits: eager (op-by-op) init dispatch is pathologically
        # slow on remote-compile TPU runtimes
        f_vars = jax.jit(lambda k, z: self.f.init({"params": k}, z,
                                                  train=False))(kf, z_dummy)
        params["f"] = f_vars["params"]
        batch_stats = {"f": f_vars.get("batch_stats", {})}

        if self.encoder is not None:
            e_vars = jax.jit(
                lambda k, x: self.encoder.init({"params": k}, x,
                                               train=False))(ke, x_dummy)
            params["encoder"] = e_vars["params"]
            batch_stats["encoder"] = e_vars.get("batch_stats", {})

        params["gp"] = jax.jit(self.gp.init)(kg, z_dummy)["params"]
        params["g"] = self.g.init_params(dtype=self.dtype)

        params["q_z"] = {}
        params["q_X"] = {}
        for name, data in datasets.items():
            if data is None:
                continue
            N = data["X"].shape[0]
            if name == "unsupervised" and self.encoder is not None:
                continue  # amortized: no per-datapoint q_z (generative.py:553-556)
            if name in ("supervised", "unsupervised", "vo"):
                params["q_z"][name] = va.init_variational(
                    N, self.dim_latent, dtype=self.dtype)
            if self.independent_X and name in ("supervised", "vo"):
                params["q_X"][name] = va.init_variational(
                    N, self.dim_effective_property, dtype=self.dtype)
        return params, batch_stats

    # ------------------------------------------------------- applications
    def apply_decoder(self, params, batch_stats, z, *, train: bool, key=None,
                      module: Optional[nn.Module] = None):
        """``module`` overrides the decoder module (same parameter pytree);
        used by PredictionEnsemble to run its hot loop through a reduced-
        precision clone of ``f`` (see prediction.py)."""
        f = self.f if module is None else module
        variables = {"params": params["f"],
                     "batch_stats": batch_stats.get("f", {})}
        rngs = {"dropout": key} if key is not None else None
        if train:
            def _fwd(variables, z, rngs):
                return f.apply(variables, z, train=True,
                               mutable=["batch_stats"], rngs=rngs)
            if self.remat_codec:
                _fwd = jax.checkpoint(_fwd)
            out, mut = _fwd(variables, z, rngs)
            return out, mut["batch_stats"]
        return f.apply(variables, z, train=False), batch_stats.get("f", {})

    def apply_encoder(self, params, batch_stats, x, *, train: bool, key=None,
                      module: Optional[nn.Module] = None):
        """``module`` overrides the encoder module (same parameter pytree);
        used by the unsup_compute_dtype path (a reduced-precision clone)."""
        enc = self.encoder if module is None else module
        variables = {"params": params["encoder"],
                     "batch_stats": batch_stats.get("encoder", {})}
        rngs = {"dropout": key} if key is not None else None
        if train:
            def _fwd(variables, x, rngs):
                return enc.apply(variables, x, train=True,
                                 mutable=["batch_stats"], rngs=rngs)
            if self.remat_codec:
                _fwd = jax.checkpoint(_fwd)
            out, mut = _fwd(variables, x, rngs)
            return out, mut["batch_stats"]
        return (enc.apply(variables, x, train=False),
                batch_stats.get("encoder", {}))

    def _unsup_modules(self, train: bool):
        """(decoder, encoder) module overrides for the unsupervised term:
        reduced-precision clones when ``unsup_compute_dtype`` is set (and
        the codec variant supports it), else (None, None) = the originals.
        Trace-time only -- clone() is a cheap dataclass copy over the SAME
        parameter pytree."""
        if self.unsup_compute_dtype is None or not train:
            return None, None
        dt = self.unsup_compute_dtype
        dec = (self.f.clone(compute_dtype=dt)
               if hasattr(self.f, "compute_dtype") else None)
        enc = (self.encoder.clone(compute_dtype=dt)
               if self.encoder is not None
               and hasattr(self.encoder, "compute_dtype") else None)
        return dec, enc

    def apply_gp(self, params, z):
        return self.gp.apply({"params": params["gp"]}, z)

    def apply_g(self, params, effprop, F):
        return self.g(params["g"], effprop, F)

    # ---------------------------------------------------- likelihood of x
    def random_field_likelihood(self, predict, target):
        """Gaussian (on the log field, or the exp field) or Bernoulli
        (reference: generative.py:232-244)."""
        if self.binary_field:
            return bernoulli_log_likelihood(predict, target)
        mean, logsigma = predict
        if self.reconstruct_log_eff_property:
            return diagonal_gaussian_log_likelihood(target, mean, 2 * logsigma)
        return diagonal_gaussian_log_likelihood(
            jnp.exp(target), jnp.exp(mean), 2 * logsigma)

    # ------------------------------------------------------- ELBO pieces
    def elbo_supervised(self, params, batch_stats, data, key, *,
                        train: bool = True, normalize: bool = False,
                        decoded=None):
        """Labeled-pair term (reference: generative.py:418-500, lockX and
        freeX variants).  ``decoded`` = precomputed (predict_x, bs_f) from
        the fused decode path (elbo); Z must then have been sampled with
        the same key split as below."""
        if self.disable_elbo_supervised:
            return 0.0, batch_stats, {}
        k1, k2, k3, kd = jax.random.split(key, 4)
        X, Y, F = data["X"], data["Y"], data["F_ROM_BC"]
        qz = params["q_z"]["supervised"]
        S = self.n_mc
        if S > 1:
            # S Monte-Carlo draws folded into the batch axis; per-sample
            # likelihoods averaged over S
            Z = va.sample_all_components(qz, k1, S).reshape(-1, self.dim_latent)
            X_rep = jnp.repeat(X, S, axis=0)
            Y_rep = jnp.repeat(Y, S, axis=0)
            F_rep = jnp.repeat(F, S, axis=0)
            if self.mc_sharding is not None:
                Z, X_rep, Y_rep, F_rep = jax.lax.with_sharding_constraint(
                    (Z, X_rep, Y_rep, F_rep), self.mc_sharding)
        else:
            Z = va.sample(qz, k1)
            X_rep, Y_rep, F_rep = X, Y, F
        if decoded is None:
            predict_x, bs_f = self.apply_decoder(params, batch_stats, Z,
                                                 train=train, key=kd)
        else:
            predict_x, bs_f = decoded
        logL_x = self.random_field_likelihood(predict_x, X_rep) / S
        DKL = va.kld(qz)
        logs = {}

        if self.independent_X:
            qX = params["q_X"]["supervised"]
            if S > 1:
                X_sample = va.sample_all_components(qX, k2, S).reshape(
                    -1, self.dim_effective_property)
                if self.mc_sharding is not None:
                    X_sample = jax.lax.with_sharding_constraint(
                        X_sample, self.mc_sharding)
            else:
                X_sample = va.sample(qX, k2)
            mu_X, logsigmas_X = self.apply_gp(params, Z)
            logL_X = diagonal_gaussian_log_likelihood(X_sample, mu_X,
                                                      2 * logsigmas_X) / S
            ent = va.entropy(qX)
        else:
            X_sample = self.apply_gp(params, Z)
            logL_X = 0.0
            ent = 0.0

        mu_y, logsigmas_y = self.apply_g(params, X_sample, F_rep)
        # preprocess_y applied to logsigmas too, and NOT applied in the
        # VO y-likelihood: both are verbatim reference behavior
        # (generative.py:439,473 vs :312) -- odd for affine preprocessors,
        # kept for parity
        logL_y = diagonal_gaussian_log_likelihood(
            self._preprocess(Y_rep), self._preprocess(mu_y),
            2 * self._preprocess(logsigmas_y)) / S

        if normalize:
            bs = X.shape[0]
            logL_x, logL_y, logL_X, ent, DKL = (
                v / bs for v in (logL_x, logL_y, logL_X, ent, DKL))

        elbo = logL_x + logL_y + logL_X + ent - DKL
        logs.update({"supervised_logL_x": logL_x, "supervised_logL_y": logL_y,
                     "supervised_DKL_z": DKL, "supervised_elbo": elbo})
        if self.independent_X:
            logs.update({"supervised_logL_X": logL_X,
                         "supervised_entropy_X": ent})
        new_bs = dict(batch_stats)
        new_bs["f"] = bs_f
        return elbo, new_bs, logs

    def elbo_unsupervised_amortized(self, params, batch_stats, X_batch, key, *,
                                    train: bool = True, normalize: bool = False,
                                    decoded=None, _enc=None):
        """Amortized unlabeled term (reference: generative.py:546-585).
        ``decoded``/``_enc`` = precomputed (predict_x, bs_f) and
        ((mean, logsigma), bs_e) from the fused decode path (elbo)."""
        if self.disable_elbo_unsupervised:
            return 0.0, batch_stats, {}
        k1, kd1, kd2 = jax.random.split(key, 3)
        dec_mod, enc_mod = self._unsup_modules(train)
        (mean, logsigma), bs_e = _enc if _enc is not None else \
            self.apply_encoder(params, batch_stats, X_batch, train=train,
                               key=kd1, module=enc_mod)
        if decoded is None:
            Z = reparametrize(k1, mean, logsigma)
            predict_x, bs_f = self.apply_decoder(params, batch_stats, Z,
                                                 train=train, key=kd2,
                                                 module=dec_mod)
        else:
            # the fused path already sampled Z (same k1 split) and decoded
            predict_x, bs_f = decoded
        logL_x = self.random_field_likelihood(predict_x, X_batch)
        DKL = unit_gaussian_kld(mean, 2 * logsigma)
        if normalize:
            bs = X_batch.shape[0]
            logL_x, DKL = logL_x / bs, DKL / bs
        elbo = logL_x - DKL
        new_bs = dict(batch_stats)
        new_bs["f"] = bs_f
        new_bs["encoder"] = bs_e
        return elbo, new_bs, {"ARM_unsupervised_logL_x": logL_x,
                              "ARM_unsupervised_DKL_z": DKL,
                              "ARM_unsupervised_elbo": elbo}

    def elbo_unsupervised(self, params, batch_stats, X, key, *,
                          train: bool = True, normalize: bool = False):
        """Non-amortized unlabeled term (reference: generative.py:515-544;
        NOTE the reference takes the KLD of q_z['supervised'] there --
        a bug we do not replicate: we use q_z['unsupervised'])."""
        if self.disable_elbo_unsupervised:
            return 0.0, batch_stats, {}
        k1, kd = jax.random.split(key)
        qz = params["q_z"]["unsupervised"]
        Z = va.sample(qz, k1)
        dec_mod, _ = self._unsup_modules(train)
        predict_x, bs_f = self.apply_decoder(params, batch_stats, Z,
                                             train=train, key=kd,
                                             module=dec_mod)
        logL_x = self.random_field_likelihood(predict_x, X)
        DKL = va.kld(qz)
        if normalize:
            logL_x, DKL = logL_x / X.shape[0], DKL / X.shape[0]
        elbo = logL_x - DKL
        new_bs = dict(batch_stats)
        new_bs["f"] = bs_f
        return elbo, new_bs, {"unsupervised_logL_x": logL_x,
                              "unsupervised_DKL_z": DKL,
                              "unsupervised_elbo": elbo}

    def elbo_virtual_observables(self, params, batch_stats, data, key, *,
                                 vo_mean, vo_logsigma, holdoff: bool = False,
                                 train: bool = True, normalize: bool = False,
                                 decoded=None):
        """Virtual-observable term: the VO posterior (mean, logsigma) over y
        plays the role of labels via reparameterised samples
        (reference: generative.py:290-392).  ``decoded`` = precomputed
        (predict_x, bs_f) from the fused decode path (elbo)."""
        if self.disable_elbo_vo:
            return 0.0, batch_stats, {}
        k1, k2, k3, kd = jax.random.split(key, 4)
        X, F = data["X"], data["F_ROM_BC"]
        qz = params["q_z"]["vo"]
        Z = va.sample(qz, k1)
        DKL = va.kld(qz)
        if decoded is None:
            predict_x, bs_f = self.apply_decoder(params, batch_stats, Z,
                                                 train=train, key=kd)
        else:
            predict_x, bs_f = decoded
        logL_x = self.random_field_likelihood(predict_x, X)
        logs = {}

        if holdoff:
            logL_y = 0.0
            logL_X = 0.0
            ent = 0.0
        else:
            if self.independent_X:
                qX = params["q_X"]["vo"]
                X_sample = va.sample(qX, k2)
                mu_X, logsigmas_X = self.apply_gp(params, Z)
                logL_X = diagonal_gaussian_log_likelihood(
                    X_sample, mu_X, 2 * logsigmas_X)
                ent = va.entropy(qX)
            else:
                X_sample = self.apply_gp(params, Z)
                logL_X = 0.0
                ent = 0.0
            mu_y, logsigmas_y = self.apply_g(params, X_sample, F)
            y_sample = reparametrize(k3, vo_mean.astype(mu_y.dtype),
                                     vo_logsigma.astype(mu_y.dtype))
            logL_y = diagonal_gaussian_log_likelihood(y_sample, mu_y,
                                                      2 * logsigmas_y)

        if normalize:
            bs = X.shape[0]
            logL_x, logL_y, logL_X, ent, DKL = (
                v / bs for v in (logL_x, logL_y, logL_X, ent, DKL))

        elbo = logL_x + logL_y + logL_X + ent - DKL
        logs.update({"vo_logL_x": logL_x, "vo_logL_y": logL_y,
                     "vo_DKL": DKL, "vo_elbo": elbo})
        if self.independent_X:
            # X-channel components logged like the supervised term, so
            # vo_elbo is reconcilable from its logged parts
            logs.update({"vo_logL_X": logL_X, "vo_entropy_X": ent})
        new_bs = dict(batch_stats)
        new_bs["f"] = bs_f
        return elbo, new_bs, logs

    # --------------------------------------------------------- full ELBO
    def elbo(self, params, batch_stats, data, key, *, vo_state=None,
             vo_holdoff: bool = False, train: bool = True,
             normalize: bool = False, l2_penalty: Optional[float] = None):
        """Composite ELBO (reference: generative.py:247-287).

        ``data`` maps modality -> arrays; 'unsupervised' must already be the
        minibatch when amortized.  ``vo_state`` = (vo_mean, vo_logsigma).
        Returns (elbo, new_batch_stats, logs).
        """
        ks, ku, kv = jax.random.split(key, 3)
        total = 0.0
        logs = {}
        bs = batch_stats

        dec_u = dec_s = dec_v = enc_u = None
        # fusion requires the amortized encoder when an unsupervised term
        # exists: without it the unsupervised decode is not part of the
        # fused batch, and handing the supervised/VO terms the pre-fusion
        # batch_stats would silently drop the unsupervised batch's
        # BatchNorm running-stat update
        fuse_ok = self.fuse_decodes and self.mc_sharding is None and (
            self.encoder is not None or data.get("unsupervised") is None)
        if fuse_ok:
            dec_u, dec_s, dec_v, enc_u, bs = self._fused_decode(
                params, bs, data, (ks, ku, kv),
                vo_active=data.get("vo") is not None and vo_state is not None,
                train=train)

        if data.get("unsupervised") is not None:
            X_u = data["unsupervised"]["X"]
            if self.encoder is not None:
                e, bs, l = self.elbo_unsupervised_amortized(
                    params, bs, X_u, ku, train=train, normalize=normalize,
                    decoded=dec_u, _enc=enc_u)
            else:
                e, bs, l = self.elbo_unsupervised(
                    params, bs, X_u, ku, train=train, normalize=normalize)
            total += e
            logs.update(l)

        if data.get("supervised") is not None:
            e, bs, l = self.elbo_supervised(
                params, bs, data["supervised"], ks, train=train,
                normalize=normalize, decoded=dec_s)
            total += e
            logs.update(l)

        if data.get("vo") is not None and vo_state is not None:
            vo_mean, vo_logsigma = vo_state
            e, bs, l = self.elbo_virtual_observables(
                params, bs, data["vo"], kv, vo_mean=vo_mean,
                vo_logsigma=vo_logsigma, holdoff=vo_holdoff, train=train,
                normalize=normalize, decoded=dec_v)
            total += e
            logs.update(l)

        if l2_penalty is not None:
            pen = _l2_norm_sum(params["f"])
            if self.encoder is not None:
                pen += _l2_norm_sum(params["encoder"])
            total -= l2_penalty * pen
            logs["elbo_l2_penalty"] = pen

        logs["elbo"] = total
        return total, bs, logs

    def _fused_decode(self, params, batch_stats, data, keys, *,
                      vo_active: bool, train: bool):
        """ONE decoder apply over the concatenated z-samples of all active
        modalities (see ``fuse_decodes``).  Samples each modality's Z with
        exactly the key splits its term function uses, so the terms'
        internal recomputation of Z is a common subexpression.  Returns
        (dec_unsup, dec_sup, dec_vo, enc_unsup, batch_stats), each dec a
        (predict_x_slice, bs_f) pair or None."""
        ks, ku, kv = keys
        parts, names, kd = [], [], None
        enc_u = None

        if (data.get("unsupervised") is not None and self.encoder is not None
                and not self.disable_elbo_unsupervised):
            k1, kd1, kd2 = jax.random.split(ku, 3)
            enc_u = self.apply_encoder(params, batch_stats,
                                       data["unsupervised"]["X"],
                                       train=train, key=kd1)
            (mean, logsigma), _ = enc_u
            parts.append(reparametrize(k1, mean, logsigma))
            names.append("u")
            kd = kd2
        if (data.get("supervised") is not None
                and not self.disable_elbo_supervised):
            k1, k2, k3, kds = jax.random.split(ks, 4)
            qz = params["q_z"]["supervised"]
            if self.n_mc > 1:
                Z = va.sample_all_components(qz, k1, self.n_mc).reshape(
                    -1, self.dim_latent)
            else:
                Z = va.sample(qz, k1)
            parts.append(Z)
            names.append("s")
            kd = kds if kd is None else kd
        if vo_active and not self.disable_elbo_vo:
            k1, k2, k3, kdv = jax.random.split(kv, 4)
            parts.append(va.sample(params["q_z"]["vo"], k1))
            names.append("v")
            kd = kdv if kd is None else kd

        if len(parts) < 2:  # nothing to fuse -- keep exact term semantics
            return None, None, None, None, batch_stats

        sizes = [p.shape[0] for p in parts]
        out, bs_f = self.apply_decoder(params, batch_stats,
                                       jnp.concatenate(parts, axis=0),
                                       train=train, key=kd)
        total = sum(sizes)

        def cut(lo, hi):
            return jax.tree_util.tree_map(
                lambda a: a[lo:hi]
                if (hasattr(a, "shape") and a.shape
                    and a.shape[0] == total) else a, out)

        dec = {}
        lo = 0
        for name, n in zip(names, sizes):
            dec[name] = (cut(lo, lo + n), bs_f)
            lo += n
        new_bs = dict(batch_stats)
        new_bs["f"] = bs_f
        if enc_u is not None:
            new_bs["encoder"] = enc_u[1]
        return (dec.get("u"), dec.get("s"), dec.get("v"), enc_u, new_bs)

    # ------------------------------------------------ VO moment propagation
    def propagate_vo_moments(self, params, data_vo, key, n_monte_carlo: int):
        """Monte-Carlo push of q through gp o g for every VO sample at once
        -- (Y_mean, Y_std), each (N_vo, dim_y).  Replaces the per-sample
        loop of generative.py:198-207 with one vmapped batch."""
        if n_monte_carlo < 2:
            # std(ddof=1) over one sample is NaN, which would silently
            # poison the VO precision downstream
            raise ValueError("N_monte_carlo_vo must be >= 2 "
                             f"(got {n_monte_carlo})")
        k1, k2, k3 = jax.random.split(key, 3)
        F = data_vo["F_ROM_BC"]
        N = F.shape[0]
        if self.independent_X:
            Xs = va.sample_all_components(params["q_X"]["vo"], k1,
                                          n_monte_carlo)  # (N, S, c)
        else:
            Zs = va.sample_all_components(params["q_z"]["vo"], k1,
                                          n_monte_carlo)  # (N, S, dz)
            gp_out = self.apply_gp(params, Zs.reshape(-1, Zs.shape[-1]))
            Xs = propagate_gp_samples(gp_out, k2)
            Xs = Xs.reshape(N, n_monte_carlo, -1)
        F_rep = jnp.broadcast_to(F[:, None, :], (N, n_monte_carlo, F.shape[-1]))
        flatX = Xs.reshape(N * n_monte_carlo, -1)
        flatF = F_rep.reshape(N * n_monte_carlo, -1)
        Ys = self.g.propagate_samples(params["g"], flatX, flatF, k3)
        Ys = Ys.reshape(N, n_monte_carlo, -1)
        return Ys.mean(axis=1), Ys.std(axis=1, ddof=1)


def _l2_norm_sum(tree) -> jnp.ndarray:
    """Sum of per-leaf L2 norms (reference sums torch.norm per parameter,
    generative.py:270-276).  Safe-norm form: jnp.linalg.norm's gradient
    at an all-zero leaf is NaN (0/0), and zero-initialized leaves are
    guaranteed (Dense biases, the decoder's logsigma param) -- torch
    defines the subgradient of norm at 0 as 0, so match that; the VALUE
    is identical everywhere."""
    def safe_norm(leaf):
        sq = jnp.sum(jnp.square(leaf))
        return jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)

    leaves = jax.tree_util.tree_leaves(tree)
    return sum(safe_norm(leaf) for leaf in leaves)


@dataclasses.dataclass
class DiscriminativeModel:
    """Deterministic x -> y surrogate extracted from a trained generative
    model: ``y = g(gp_mean(encoder_mean(x)), F)``
    (reference: generative.py:394-415, 605-644).

    Functional: holds the static modules; parameters are passed per call
    (a snapshot of the generative model's params, which in JAX are plain
    arrays -- the reference's deepcopy becomes a no-op value copy).
    """

    model: GenerativeModel

    def extract_params(self, params) -> dict:
        # a REAL buffer copy: the trainer's jitted step donates the whole
        # TrainState (donate_argnums), which deletes the old buffers --
        # an identity tree_map would hand out those soon-dead arrays and
        # the surrogate would raise 'Array has been deleted' after the
        # next training step
        return jax.tree_util.tree_map(jnp.array, params)

    def extract(self, params, batch_stats) -> tuple:
        """Snapshot (params, batch_stats) for serving while training
        continues -- batch_stats live in the donated TrainState too, so
        they need the same copy treatment as the parameters."""
        return self.extract_params(params), self.extract_params(batch_stats)

    def __call__(self, params, batch_stats, x, F, *, use_encoder: bool = True):
        if use_encoder:
            if self.model.encoder is None:
                raise RuntimeError("encoder is not set")
            (z, _), _ = self.model.apply_encoder(params, batch_stats, x,
                                                 train=False)
        else:
            z = x  # x is already a latent encoding (FromLatentEncoding)
        gp_out = self.model.apply_gp(params, z)
        X_c = gp_out[0] if isinstance(gp_out, tuple) else gp_out
        mu_y, _ = self.model.apply_g(params, X_c, F)
        return mu_y
