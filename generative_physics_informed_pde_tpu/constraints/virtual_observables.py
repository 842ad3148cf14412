"""Virtual observables: weak-form PDE residual constraints as free labels.

TPU-native re-implementation of bottleneck/VirtualObservables.py (1093 LoC,
the reference's most novel subsystem).  The idea (VirtualObservables.py:61-69):
for an unlabeled conductivity field x the discrete PDE gives linear
constraints on the unknown solution, ``Gamma y = alpha`` with
``Gamma = V^T K_ff(x)`` and ``alpha = V^T f_eff`` for any test matrix V.
Conditioning the model's predictive Gaussian over y on these constraints
yields a virtual posterior used as a label substitute in the ELBO.

Architectural differences from the reference:

* No per-sample Python objects: the ensemble state is stacked arrays
  (Gamma (N, m, d), alpha (N, m), mean/vars (N, d)) and every update is a
  single vmapped, jitted kernel.
* ``Gamma`` is built matrix-free: ``V^T K_ff = (K_ff V)^T`` via the stencil
  operator (K symmetric), so no sparse matrices are ever materialised --
  the reference assembles scipy CSR per sample
  (LinearElliptic.py:137-159).
* Test functions have closed forms: V=W for the coarse-grained residual
  (:297-321), iid Gaussian sketches (:230-258), analytic RBFs evaluated at
  free node coordinates (:172-228, replacing ``df.interpolate``), and the
  structured-grid flux constraints (constraints/flux.py).
* float64 conditioning when x64 is enabled (reference forces torch.double,
  :419-420); on TPU the f32 path keeps the Cholesky well-scaled via
  Jacobi equilibration of the Schur system + a relative diagonal jitter
  and a HIGHEST-precision einsum (see _condition_single -- an absolute
  jitter is a no-op against the 6-decade diagonal spread measured in
  benchmarks/vo_nan_analyze.py).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property, partial
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..fem.physics import LinearEllipticPhysics
from .flux import FluxConstraintOperator


# ---------------------------------------------------------------------------
# Query-point ensemble: cached per-sample operator data
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class QuerryPointEnsemble:
    """Stacked replacement for QuerryPoint/QuerryPointEnsemble
    (reference: VirtualObservables.py:8-116): per unlabeled sample the
    log-field x (DG0) and its Dirichlet values; K and f_eff are *functions*
    (matrix-free) instead of cached scipy matrices."""

    physics: LinearEllipticPhysics
    X_DG: jnp.ndarray        # (N, n_cells) log-conductivity
    bc_values: jnp.ndarray   # (N, n_constrained) Dirichlet values

    def __post_init__(self):
        assert self.X_DG.ndim == 2
        assert self.X_DG.shape[0] == self.bc_values.shape[0]

    @property
    def N(self) -> int:
        return self.X_DG.shape[0]

    @property
    def dim_out(self) -> int:
        return self.physics.dim_out

    @property
    def alpha(self) -> jnp.ndarray:
        """exp(x): conductivities (the reference stores x log-transformed
        and exponentiates at assembly, VirtualObservables.py:57-59)."""
        return jnp.exp(self.X_DG)

    def f_eff(self) -> jnp.ndarray:
        """(N, n_free) effective forces ``f_f - K_fc y_c``."""
        prof = self.physics.profile
        f_full = jax.vmap(self.physics.effective_force)(
            self.alpha, self.bc_values)
        return f_full[:, jnp.asarray(prof.free_dofs)]

    def apply_Kff(self, V_free: jnp.ndarray) -> jnp.ndarray:
        """Batched ``K_ff(x_n) V_n``: V_free (N, n_free, m) ->
        (N, n_free, m)."""
        op = self.physics.op
        prof = self.physics.profile
        free = jnp.asarray(prof.free_dofs)
        n_nodes = self.physics.grid.n_nodes

        def single(alpha, V):
            coefs = op.coefficients(alpha)
            V_full = jnp.zeros((n_nodes, V.shape[1]), V.dtype
                               ).at[free, :].set(V)
            grids = op.to_nodegrid(V_full.T)           # (m, Ny, Nx)
            out = op.apply_coeff(coefs[None], grids)   # broadcast coefs
            return op.to_flat(out).T[free, :]

        return jax.vmap(single)(self.alpha, V_free)

    def construct_querry_weak_galerkin(self, V_free: jnp.ndarray):
        """(Gamma, alpha): Gamma (N, m, n_free) = V^T K_ff (via symmetry),
        alpha (N, m) = V^T f_eff (reference: VirtualObservables.py:61-69)."""
        KV = self.apply_Kff(V_free)                    # (N, d, m)
        Gamma = jnp.swapaxes(KV, -1, -2)               # (N, m, d)
        alpha = jnp.einsum("ndm,nd->nm", V_free, self.f_eff(),
                           precision=jax.lax.Precision.HIGHEST)
        return Gamma, alpha


# ---------------------------------------------------------------------------
# Test-function samplers
# ---------------------------------------------------------------------------

class BaseSampler:
    """m test functions per query point; ``is_constant`` controls resampling
    and ``precision_mask < 0`` marks infinite-precision constraints
    (reference: VirtualObservables.py:120-161)."""

    m: int
    is_constant: bool

    def precision_mask(self) -> np.ndarray:
        raise NotImplementedError

    def sample(self, qpe: QuerryPointEnsemble, key):
        """-> (Gamma (N, m, d), alpha (N, m))"""
        raise NotImplementedError

    @property
    def fixed_precision(self) -> bool:
        return bool(np.all(self.precision_mask() < 0))


@dataclasses.dataclass
class CoarseGrainedResidualSampler(BaseSampler):
    """Constant V = W: the coarse-grained Galerkin residual
    (reference: VirtualObservables.py:297-321)."""

    W: np.ndarray  # (n_free, d_rom)

    @property
    def m(self) -> int:
        return self.W.shape[1]

    is_constant = True

    def precision_mask(self):
        return -np.ones(self.m)

    def sample(self, qpe, key):
        V = jnp.broadcast_to(jnp.asarray(self.W, dtype=qpe.X_DG.dtype),
                             (qpe.N,) + self.W.shape)
        return qpe.construct_querry_weak_galerkin(V)


@dataclasses.dataclass
class GaussianSketchingSampler(BaseSampler):
    """iid standard-normal test vectors (reference:
    VirtualObservables.py:230-258)."""

    N_aux: int

    @property
    def m(self) -> int:
        return self.N_aux

    is_constant = False

    def precision_mask(self):
        return -np.ones(self.m)

    def sample(self, qpe, key):
        V = jax.random.normal(key, (qpe.N, qpe.dim_out, self.N_aux),
                              dtype=qpe.X_DG.dtype)
        return qpe.construct_querry_weak_galerkin(V)


@dataclasses.dataclass
class RadialBasisFunctionSampler(BaseSampler):
    """Random-centre RBFs ``exp(-|s - r0|^2 / l^2)`` evaluated at the free
    node coordinates (reference: VirtualObservables.py:172-228 +
    fawkes/Expressions.py:26-31; closed-form instead of df.interpolate)."""

    l: float
    N_aux: int
    coords: np.ndarray  # (n_free, 2) free-dof coordinates

    @property
    def m(self) -> int:
        return self.N_aux

    is_constant = False

    def precision_mask(self):
        return -np.ones(self.m)

    def sample_V(self, key, N: int, dtype) -> jnp.ndarray:
        coords = jnp.asarray(self.coords, dtype=dtype)
        # centers span the actual free-node bounding box, not a hardcoded
        # unit square -- grids support [0,lx]x[0,ly] domains (fem/grid.py)
        lo, hi = coords.min(axis=0), coords.max(axis=0)
        r0 = lo + (hi - lo) * jax.random.uniform(key, (N, self.N_aux, 1, 2))
        d2 = ((coords[None, None, :, :] - r0) ** 2).sum(-1)  # (N, m, n_free)
        V = jnp.exp(-d2 / (self.l ** 2)).astype(dtype)
        return jnp.swapaxes(V, -1, -2)  # (N, n_free, m)

    def sample(self, qpe, key):
        V = self.sample_V(key, qpe.N, qpe.X_DG.dtype)
        return qpe.construct_querry_weak_galerkin(V)


@dataclasses.dataclass
class FluxConstrainSampler(BaseSampler):
    """Flux-continuity constraints (reference: VirtualObservables.py:323-349
    via flux.py); constant per sample, learnable precision (mask +1)."""

    operator: FluxConstraintOperator
    physics: LinearEllipticPhysics

    @property
    def m(self) -> int:
        return self.operator.n_constraints

    is_constant = True

    def precision_mask(self):
        return np.ones(self.m)

    def sample(self, qpe, key):
        prof = self.physics.profile

        def single(alpha, bcv):
            return self.operator.assemble_reduced(
                alpha, bcv, prof.free_dofs, prof.constrained_dofs)

        return jax.vmap(single)(qpe.alpha, qpe.bc_values)


@dataclasses.dataclass
class ConcatenatedSamplers(BaseSampler):
    """Stack several samplers (reference: VirtualObservables.py:260-294)."""

    samplers: Sequence[BaseSampler]

    @property
    def m(self) -> int:
        return sum(s.m for s in self.samplers)

    @property
    def is_constant(self) -> bool:
        return all(s.is_constant for s in self.samplers)

    def precision_mask(self):
        return np.concatenate([s.precision_mask() for s in self.samplers])

    def sample(self, qpe, key):
        keys = jax.random.split(key, len(self.samplers))
        parts = [s.sample(qpe, k) for s, k in zip(self.samplers, keys)]
        Gamma = jnp.concatenate([p[0] for p in parts], axis=1)
        alpha = jnp.concatenate([p[1] for p in parts], axis=1)
        return Gamma, alpha


# ---------------------------------------------------------------------------
# Linear-Gaussian conditioning (the VO update)
# ---------------------------------------------------------------------------

def _condition_single(Gamma, alpha, g, prec, vo_variances, eps):
    """Exact linear-Gaussian conditioning for one sample
    (reference: VirtualObservables.py:642-669).

    Prior y ~ N(g, diag(1/prec)); observe Gamma y = alpha + eps,
    eps ~ N(0, diag(vo_variances)).  Returns posterior (mean, vars-diagonal).

    Numerics (the reference forces float64 here, VirtualObservables.py:419;
    this implementation must also survive the f32 TPU path): the Schur
    matrix ``Lam = Gamma cov Gamma^T + diag(vo_var)`` mixes constraint
    families whose rows differ by orders of magnitude (a cadence-50 VO dump
    measured diag spanning [0.9, 7e5], cond 4e10 -- benchmarks/
    vo_nan_analyze.py), so it is Jacobi-equilibrated before the Cholesky:
    ``Lam_s = D^-1/2 Lam D^-1/2`` has unit diagonal, and ``eps`` acts as a
    RELATIVE per-constraint jitter in the scaled space (an absolute floor
    on vo_var is a no-op against a 7e5 diagonal).  The einsum runs at
    HIGHEST precision: TPU f32 matmuls otherwise accumulate through
    bf16-product passes, which is what broke factorisations that f32 CPU
    replays of the same inputs survive.
    """
    cov = 1.0 / prec
    Lam = jnp.einsum("id,d,sd->is", Gamma, cov, Gamma,
                     precision=jax.lax.Precision.HIGHEST)
    Lam = Lam + jnp.diag(vo_variances)
    d = jnp.sqrt(jnp.diagonal(Lam))
    d = jnp.where(d > 0, d, jnp.ones_like(d))
    Lam_s = Lam / d[:, None] / d[None, :]
    Lam_s = Lam_s + eps * jnp.eye(Lam.shape[0], dtype=Lam.dtype)
    L = jnp.linalg.cholesky(Lam_s)
    # residual + posterior-mean matmuls at HIGHEST too: near convergence
    # the true residual is small, so the ~1e-3 bf16-pass error of a
    # default-precision Gamma @ g would dominate it (same asymmetry the
    # Gram einsum fix above addresses); at m ~ 225 this costs nothing
    resid = (jnp.einsum("md,d->m", Gamma, g,
                        precision=jax.lax.Precision.HIGHEST) - alpha) / d
    solvec = jax.scipy.linalg.cho_solve((L, True), resid) / d
    mean = g - cov * jnp.einsum("md,m->d", Gamma, solvec,
                                precision=jax.lax.Precision.HIGHEST)
    A = Gamma * cov[None, :]                      # (m, d)
    AL = jax.scipy.linalg.solve_triangular(L, A / d[:, None], lower=True)
    post_sub = jnp.sum(AL * AL, axis=0)
    # clamp HERE (not only in the trainer-side caller): f32 cancellation
    # with near-exact constraints (post_sub ~= cov) can leave vars_
    # slightly negative, and sqrt/log of that is NaN for any API user
    vars_ = jnp.maximum(cov - post_sub, 1e-12)
    return mean, vars_


@partial(jax.jit, donate_argnums=(), static_argnames=())
def condition_ensemble(Gamma, alpha, G, PREC, vo_variances, eps=0.0):
    """vmapped conditioning over the ensemble: Gamma (N, m, d), alpha
    (N, m), G/PREC (N, d), vo_variances (m,) -> (mean, vars) each (N, d).
    ``eps``: relative diagonal jitter in the equilibrated Schur system."""
    eps = jnp.asarray(eps, dtype=Gamma.dtype)
    return jax.vmap(_condition_single, in_axes=(0, 0, 0, 0, None, None))(
        Gamma, alpha, G, PREC, vo_variances, eps)


@jax.jit
def gamma_precision_beta(Gamma, alpha, mean, vars_, weights=None):
    """Gamma-hyperprior posterior rate over constraint-noise variances
    (reference: VirtualObservables.py:971-998):
    beta_j = 0.5 sum_n [(Gamma_n mu_n - alpha_n)_j^2 + (Gamma_n^2 vars_n)_j].

    ``weights`` (N,): optional 0/1 per-sample mask -- samples whose stored
    moments are failure-containment stand-ins (huge-variance pseudo-labels)
    must not enter the sum, or their 1e6 variances inflate beta for EVERY
    sample's vo_variances.
    """
    resid = jnp.einsum("nmd,nd->nm", Gamma, mean,
                       precision=jax.lax.Precision.HIGHEST) - alpha
    spread = jnp.einsum("nmd,nd->nm", Gamma ** 2, vars_,
                        precision=jax.lax.Precision.HIGHEST)
    per_sample = resid ** 2 + spread
    if weights is not None:
        per_sample = per_sample * weights[:, None]
    return 0.5 * jnp.sum(per_sample, axis=0)


class VirtualObservablesEnsemble:
    """Constraint-based VO ensemble with Gamma-hyperprior precision learning
    (reference: VirtualObservables.py:596-669, 796-998)."""

    ALPHA_0 = 1e-6
    BETA_0 = 1e-6

    def __init__(self, qpe: QuerryPointEnsemble, sampler: BaseSampler,
                 dtype=None, prior_precision_factor: float = 1.0):
        self.qpe = qpe
        self.sampler = sampler
        self.dtype = dtype or qpe.X_DG.dtype
        # prior tempering (beyond the reference): conditioning with the raw
        # model precision anchors training to the model's own stale
        # predictions in the unconstrained directions (the VO-ablation
        # staleness diagnosis, PARITY.md).  A factor < 1 inflates the prior
        # variance before conditioning, so the virtual posterior keeps the
        # constraint information but carries less self-distillation weight.
        self.prior_precision_factor = float(prior_precision_factor)
        self._Gamma = None
        self._alpha = None
        self._mean = None
        self._vars = None
        # samples whose stored moments are failure-containment stand-ins
        # (excluded from the Gamma precision update until they recover)
        self._fallback_mask = None

        self.m = sampler.m
        self.N = qpe.N
        mask = sampler.precision_mask() < 0
        self.infinite_precision_mask = jnp.asarray(mask)
        self._prec_alpha = 0.5 * self.N + self.ALPHA_0
        self._prec_beta = jnp.ones(self.m, dtype=self.dtype)
        self.vo_variances = self._mean_vo_variances()
        # jit the test-function sampling: the stencil-based Gamma assembly
        # is many small ops and eager dispatch is pathological on remote
        # TPU runtimes
        self._sample_jit = jax.jit(lambda key: sampler.sample(qpe, key))
        self.resample(jax.random.PRNGKey(0), force=True)

    # ------------------------------------------------------------ state
    @property
    def dim_out(self) -> int:
        return self.qpe.dim_out

    @property
    def mean(self) -> jnp.ndarray:
        if self._mean is None:
            raise RuntimeError("VO not yet updated")
        return self._mean

    @property
    def vars(self) -> jnp.ndarray:
        if self._vars is None:
            raise RuntimeError("VO not yet updated")
        return self._vars

    @property
    def logsigma(self) -> jnp.ndarray:
        return 0.5 * jnp.log(self.vars)

    @property
    def Gamma(self) -> jnp.ndarray:
        return self._Gamma

    @property
    def alpha(self) -> jnp.ndarray:
        return self._alpha

    @property
    def fixed_precision(self) -> bool:
        return bool(jnp.all(self.infinite_precision_mask))

    def _mean_vo_variances(self) -> jnp.ndarray:
        """E[var] under the Gamma posterior, zero where infinite precision
        (reference: VirtualObservables.py:960-964)."""
        mean_vars = self._prec_beta / (self._prec_alpha + 1.0)
        return jnp.where(self.infinite_precision_mask,
                         jnp.zeros_like(mean_vars), mean_vars)

    # ---------------------------------------------------------- updates
    def resample(self, key, force: bool = False):
        """Redraw the non-constant test functions (reference:
        VirtualObservables.py:414-421,484-486)."""
        if self.sampler.is_constant and not force and self._Gamma is not None:
            return
        Gamma, alpha = self._sample_jit(key)
        self._Gamma = Gamma.astype(self.dtype)
        self._alpha = alpha.astype(self.dtype)

    def update_vo_precision(self, iteration: int, writer=None):
        """(reference: VirtualObservables.py:971-998).  The first call is
        a no-op via the ``_mean is None`` check: conditioning has not run
        yet, so there are no residuals to update the Gamma posterior from."""
        if self.fixed_precision or self._mean is None:
            return
        fb = self._fallback_mask
        if fb is not None and bool(fb.all()):
            # zero clean samples: no evidence to update from -- keep the
            # previous beta/alpha rather than collapsing vo_variances to
            # ~BETA_0/ALPHA_0 (extreme false confidence from an empty sum)
            return
        if fb is not None and bool(fb.any()):
            # exclude contained-failure samples: their huge-variance
            # stand-ins would inflate beta_j ensemble-wide (the exact
            # poisoning path the containment exists to stop)
            w = (~fb).astype(self._mean.dtype)
            beta = gamma_precision_beta(self._Gamma, self._alpha,
                                        self._mean, self._vars, w)
            self._prec_alpha = 0.5 * float(w.sum()) + self.ALPHA_0
        else:
            beta = gamma_precision_beta(self._Gamma, self._alpha,
                                        self._mean, self._vars)
            self._prec_alpha = 0.5 * self.N + self.ALPHA_0
        self._prec_beta = beta + self.BETA_0
        self.vo_variances = self._mean_vo_variances()
        if writer is not None:
            writer.add_scalar("Monitor/Mean_VO_variances",
                              float(jnp.mean(self.vo_variances)),
                              global_step=iteration)

    def update(self, G, PREC, iteration: int, writer=None):
        """(reference: VirtualObservables.py:891-898)"""
        self.update_vo_precision(iteration, writer)
        # numerical floor: RELATIVE jitter on the equilibrated Schur system
        # (see _condition_single) -- exact constraints stay positive-
        # definite in f32 without drowning small-scale constraint rows
        eps = 1e-12 if self.dtype == jnp.float64 else 1e-6
        vo_var = self.vo_variances
        G = G.astype(self.dtype)
        PREC = PREC.astype(self.dtype)
        if self.prior_precision_factor != 1.0:
            PREC = PREC * self.prior_precision_factor
        mean, vars_ = condition_ensemble(self._Gamma, self._alpha, G,
                                         PREC, vo_var, eps)
        # failure containment: a per-sample Cholesky breakdown (non-finite
        # conditioning output, or a non-finite model prior) must not poison
        # the ensemble -- the NaN would propagate through the next
        # gamma_precision_beta into EVERY sample's vo_variances and from
        # there into the ELBO.  Fall back to the prior moments for the
        # failed samples and say so loudly.
        bad = ~(jnp.isfinite(mean).all(axis=1) & jnp.isfinite(vars_).all(axis=1))
        n_bad = int(bad.sum())
        if n_bad:
            import os, warnings
            bad_in = ~(jnp.isfinite(G).all(axis=1)
                       & jnp.isfinite(PREC).all(axis=1))
            warnings.warn(
                f"VO conditioning produced non-finite moments for {n_bad}/"
                f"{self.N} samples at iteration {iteration} "
                f"({int(bad_in.sum())} had a non-finite model prior); "
                "falling back to the prior/previous moments for those "
                "samples (set GPIPDE_VO_DUMP=<path> to capture the inputs)")
            dump = os.environ.get("GPIPDE_VO_DUMP")
            if dump:
                np.savez(dump, Gamma=np.asarray(self._Gamma),
                         alpha=np.asarray(self._alpha), G=np.asarray(G),
                         PREC=np.asarray(PREC),
                         vo_var=np.asarray(vo_var),
                         bad=np.asarray(bad), iteration=iteration)
            # best finite stand-in per sample: the prior moments, unless the
            # prior itself is non-finite and previous VO moments exist
            fb_mean, fb_vars = G, 1.0 / PREC
            if self._mean is not None:
                fb_mean = jnp.where(bad_in[:, None], self._mean, fb_mean)
                fb_vars = jnp.where(bad_in[:, None], self._vars, fb_vars)
            mean = jnp.where(bad[:, None], fb_mean, mean)
            vars_ = jnp.where(bad[:, None], fb_vars, vars_)
            # the fallback itself can be poisoned (first update with a
            # non-finite prior): stored moments MUST be finite, or the next
            # gamma_precision_beta re-poisons every sample.  Neutral stand-in:
            # zero mean with a huge variance (an uninformative pseudo-label).
            # +/-inf must map to 0, NOT FLT_MAX (the nan_to_num default):
            # FLT_MAX squared in the precision residual overflows to inf and
            # inf * 0-weight = NaN -- exactly the ensemble-wide poisoning
            # this path exists to contain.
            mean = jnp.nan_to_num(mean, posinf=0.0, neginf=0.0)
            vars_ = jnp.where(jnp.isfinite(vars_), vars_,
                              jnp.asarray(1e6, dtype=vars_.dtype))
        if writer is not None and n_bad:
            writer.add_scalar("Monitor/VO_conditioning_failures", n_bad,
                              global_step=iteration)
        # flag stand-in samples so the NEXT precision update skips them
        self._fallback_mask = bad if n_bad else None
        self._mean = mean
        self._vars = jnp.maximum(vars_, 1e-12)


# ---------------------------------------------------------------------------
# Energy-based virtual observables
# ---------------------------------------------------------------------------

class TemperatureSchedule:
    def get_temperature(self, iteration: int) -> float:
        raise NotImplementedError


@dataclasses.dataclass
class LinearTemperatureSchedule(TemperatureSchedule):
    """(reference: VirtualObservables.py:1050-1068)"""

    T_init: float
    T_final: float
    num_steps: int

    def __post_init__(self):
        assert self.num_steps > 1 and self.T_final < self.T_init

    def get_temperature(self, iteration):
        # hold T_final once exhausted.  Deviation from the reference,
        # which raises past num_steps AND overshoots at iteration ==
        # num_steps (frac = n/(n-1) > 1 extrapolates BELOW T_final --
        # for a linear schedule that can go negative, and 1/T then NaNs
        # the pseudo-labels).
        frac = min(iteration, self.num_steps - 1) / (self.num_steps - 1)
        return self.T_init + frac * (self.T_final - self.T_init)


@dataclasses.dataclass
class ExponentialTemperatureSchedule(TemperatureSchedule):
    """(reference: VirtualObservables.py:1071-1091)"""

    T_init: float
    T_final: float
    num_steps: int

    def __post_init__(self):
        assert self.num_steps > 1 and self.T_final < self.T_init
        self._lmbda = -np.log(self.T_final / self.T_init)

    def get_temperature(self, iteration):
        # hold T_final once exhausted (see LinearTemperatureSchedule)
        t = min(iteration, self.num_steps - 1) / (self.num_steps - 1)
        return self.T_init * np.exp(-self._lmbda * t)


class EnergyVirtualObservablesEnsemble:
    """Energy-minimisation VOs: minimise ``(1/T)(0.5 y^T K y - f^T y) +
    0.5 ||y - g||^2_prec`` by randomized-subspace iteration
    (reference: VirtualObservables.py:672-793, 1001-1037).

    The subspace solve is vmapped over the ensemble and over iterations is
    a lax.fori_loop -- one jitted kernel per update instead of the
    reference's numpy loops.
    """

    def __init__(self, qpe: QuerryPointEnsemble,
                 num_iterations_per_update: int,
                 sampler: RadialBasisFunctionSampler, dtype=None):
        self.qpe = qpe
        self.num_iterations_per_update = num_iterations_per_update
        self.sampler = sampler
        self.dtype = dtype or qpe.X_DG.dtype
        self._temperature = 1.0
        self._forced_temperature = None
        self._schedule: Optional[TemperatureSchedule] = None
        self._mean = jnp.zeros((qpe.N, qpe.dim_out), dtype=self.dtype)
        self._vars = None
        # diag(K_ff) per sample
        op = qpe.physics.op
        free = jnp.asarray(qpe.physics.profile.free_dofs)
        self._K_diag = jax.vmap(
            lambda a: op.diagonal(a)[free])(qpe.alpha).astype(self.dtype)

    # ---------------------------------------------------------- plumbing
    @property
    def N(self):
        return self.qpe.N

    @property
    def dim_out(self):
        return self.qpe.dim_out

    @property
    def temperature(self) -> float:
        return (self._forced_temperature
                if self._forced_temperature is not None
                else self._temperature)

    def force_temperature(self, value):
        self._forced_temperature = value

    def set_temperature(self, value):
        if not value > 0:  # inv_T = 1/T is used directly
            raise ValueError(f"temperature must be > 0, got {value}")
        self._temperature = value

    def set_temperature_schedule(self, type: str, T_init, T_final, num_steps):
        cls = {"linear": LinearTemperatureSchedule,
               "exponential": ExponentialTemperatureSchedule}[type.lower()]
        self._schedule = cls(T_init, T_final, num_steps)

    def set_linear_temperature_schedule(self, T_init=1.0, T_final=1e-4,
                                        num_steps=None):
        if num_steps is None:
            raise ValueError
        self._schedule = LinearTemperatureSchedule(T_init, T_final, num_steps)

    @property
    def mean(self):
        return self._mean

    @property
    def vars(self):
        if self._vars is None:
            raise RuntimeError("VO not yet updated")
        return self._vars

    @property
    def logsigma(self):
        return 0.5 * jnp.log(self.vars)

    def resample(self, key, force: bool = False):
        pass  # test functions are drawn inside update (reference :726-728)

    def update_vo_precision(self, iteration, writer=None):
        """Temperature annealing (reference: VirtualObservables.py:758-766,
        1031-1037).  With no schedule set, a temperature fixed via
        ``set_temperature`` (or the constructor default) is kept as-is --
        the reference's EnergyVirtualObservable.update never touches the
        schedule, so manual-temperature operation must stay usable."""
        if self._forced_temperature is not None:
            return
        if self._schedule is not None:
            self._temperature = self._schedule.get_temperature(iteration)
        if writer is not None:
            writer.add_scalar("Monitor/Temperature", self._temperature,
                              global_step=iteration)

    @cached_property
    def _update_jit(self):
        """Jitted update core (eager dispatch of the subspace iteration is
        pathological on remote TPU runtimes)."""
        qpe = self.qpe
        op = qpe.physics.op
        free = jnp.asarray(qpe.physics.profile.free_dofs)
        n_nodes = qpe.physics.grid.n_nodes
        sampler = self.sampler
        n_iter = self.num_iterations_per_update
        dtype = self.dtype

        def apply_A(alpha, prec, inv_T, v):
            """(diag(prec) + inv_T * K_ff) v for one sample."""
            coefs = op.coefficients(alpha)
            v_full = jnp.zeros(n_nodes, v.dtype).at[free].set(v)
            Kv = op.to_flat(op.apply_coeff(coefs, op.to_nodegrid(v_full)))
            return prec * v + inv_T * Kv[free]

        @jax.jit
        def run(mean0, G, PREC, inv_T, key):
            f_eff = qpe.f_eff().astype(dtype)
            b = inv_T * f_eff + PREC * G

            def body(i, mean):
                k = jax.random.fold_in(key, i)
                V = sampler.sample_V(k, qpe.N, dtype)  # (N, d, s)

                def single(alpha, prec, bn, mn, Vn):
                    AV = jax.vmap(
                        lambda col: apply_A(alpha, prec, inv_T, col),
                        in_axes=1, out_axes=1)(Vn)  # (d, s)
                    Msub = Vn.T @ AV
                    r = Vn.T @ (apply_A(alpha, prec, inv_T, mn) - bn)
                    new = mn - Vn @ jnp.linalg.solve(Msub, r)
                    # containment: a numerically singular Msub makes
                    # jnp.linalg.solve return NaN silently (unlike the
                    # reference's np.linalg.solve, which raises); since
                    # _mean is the carry for every later update, one bad
                    # subspace draw would poison the run permanently --
                    # keep the previous iterate for that sample instead
                    return jnp.where(jnp.all(jnp.isfinite(new)), new, mn)

                return jax.vmap(single)(qpe.alpha.astype(dtype), PREC, b,
                                        mean, V)

            return jax.lax.fori_loop(0, n_iter, body, mean0)

        return run

    def update(self, G, PREC, iteration: int, writer=None):
        """(reference: VirtualObservables.py:769-788)"""
        self.update_vo_precision(iteration, writer)
        inv_T = jnp.asarray(1.0 / self.temperature, dtype=self.dtype)
        G = G.astype(self.dtype)
        PREC = PREC.astype(self.dtype)
        self._vars = 1.0 / (PREC + inv_T * self._K_diag)
        key = jax.random.fold_in(jax.random.PRNGKey(101), iteration)
        self._mean = self._update_jit(self._mean, G, PREC, inv_T, key)


# ---------------------------------------------------------------------------
# Factory (reference: QuerryEnsemble.FromQuerryPointEnsemble :498-543 +
# Trainer.set_data_from_datasets :314-343)
# ---------------------------------------------------------------------------

def build_virtual_observables_ensemble(vo_spec: dict, dataset_vo, physics,
                                       dtype=None):
    """Build the VO ensemble from a reference-style spec dict:
    {'type': 'constrain'|'energy', 'CGR': bool, 'flux': bool,
     'N_gaussian': int, 'N_rbf': int, 'l_rbf': float, and for 'energy':
     'energy_num_iterations_per_update', 'T_init', 'T_final',
     'T_iterations'}."""
    if not isinstance(vo_spec, dict) or "type" not in vo_spec:
        raise ValueError("vo_spec dict with a 'type' key is required")

    fom = physics["fom"]
    X_DG = dataset_vo.get("X_DG")
    bce = dataset_vo.get("BCE")
    bc_values = jnp.asarray(bce.constrained_values("fom"))
    qpe = QuerryPointEnsemble(physics=fom, X_DG=jnp.asarray(X_DG),
                              bc_values=bc_values)

    kind = vo_spec["type"].lower()
    if kind == "energy":
        coords = fom.grid.node_coords[fom.profile.free_dofs]
        sampler = RadialBasisFunctionSampler(
            l=vo_spec["l_rbf"], N_aux=vo_spec["N_rbf"], coords=coords)
        vo = EnergyVirtualObservablesEnsemble(
            qpe, vo_spec["energy_num_iterations_per_update"], sampler,
            dtype=dtype)
        vo.set_temperature_schedule(
            "exponential", T_init=vo_spec["T_init"],
            T_final=vo_spec["T_final"], num_steps=vo_spec["T_iterations"])
        return vo

    if kind == "constrain":
        samplers = []
        if vo_spec.get("CGR"):
            samplers.append(CoarseGrainedResidualSampler(W=physics["W"]))
        if vo_spec.get("flux"):
            op = FluxConstraintOperator(coarse=physics["rom"].grid,
                                        fine=fom.grid)
            samplers.append(FluxConstrainSampler(operator=op, physics=fom))
        if vo_spec.get("N_gaussian", 0) > 0:
            samplers.append(GaussianSketchingSampler(vo_spec["N_gaussian"]))
        if vo_spec.get("N_rbf", 0) > 0:
            coords = fom.grid.node_coords[fom.profile.free_dofs]
            samplers.append(RadialBasisFunctionSampler(
                l=vo_spec["l_rbf"], N_aux=vo_spec["N_rbf"], coords=coords))
        if not samplers:
            raise ValueError("vo_spec selected no samplers")
        sampler = samplers[0] if len(samplers) == 1 \
            else ConcatenatedSamplers(samplers)
        return VirtualObservablesEnsemble(
            qpe, sampler, dtype=dtype,
            prior_precision_factor=vo_spec.get("prior_precision_factor", 1.0))

    raise ValueError(f"Type: {vo_spec['type']} not known as specification.")


def vo_spec_preset(kind: str = "energy", *, T_iterations: int = None,
                   **overrides) -> dict:
    """Measured-best ``vo_spec`` presets (PARITY.md VO ablation).

    ``kind='energy'`` is the DEFAULT and the production semi-supervised
    arm: at equal budgets it beat both labels-only and constrain-VO on
    every converged comparison (rel-L2, r^2_y, logscore; incl. the
    zero-label regime) in the recorded ablations.  ``T_iterations`` must
    be set to the planned number of SVI iterations (the annealing
    schedule spans the run).

    ``kind='constrain'`` is the reference's linear-Gaussian conditioning
    arm (VirtualObservables.py:57-69 spec); pair it with the default
    trainer cadence ``N_vo_update_interval=50`` (see DEFAULT_CONFIG) --
    the reference's cadence 250 measurably cripples its convergence.

    Keyword ``overrides`` are merged on top of the preset.
    """
    kind = kind.lower()
    if kind == "energy":
        if T_iterations is None and "T_iterations" not in overrides:
            raise ValueError(
                "vo_spec_preset('energy') needs T_iterations: the annealing "
                "schedule must span the planned SVI iteration count")
        spec = {"type": "energy", "l_rbf": 0.2, "N_rbf": 32,
                "energy_num_iterations_per_update": 10,
                "T_init": 1.0, "T_final": 1e-6,
                "T_iterations": T_iterations}
    elif kind == "constrain":
        spec = {"type": "constrain", "CGR": True, "flux": True,
                "N_gaussian": 8, "N_rbf": 8, "l_rbf": 0.2}
    else:
        raise ValueError(f"unknown vo preset kind {kind!r} "
                         "(expected 'energy' or 'constrain')")
    spec.update(overrides)
    return spec
