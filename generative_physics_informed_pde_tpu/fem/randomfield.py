"""Gaussian random-field sampling (squared-exponential covariance).

TPU-native replacement for ``NormalRandomFieldSampler``
(reference: physics/RandomField.py:13-219).  Two factorisations:

* ``'kl'`` / ``'cholesky'`` -- dense covariance, on-device ``eigh`` with
  adaptive Karhunen-Loeve truncation at 99.9% explained variance, or
  Cholesky (reference semantics, RandomField.py:162-209).  The reference
  caps the field at 8192 points (RandomField.py:43-44); we keep the dense
  path for parity but add
* ``'fft'`` -- circulant-embedding sampling for large grids (128^2 and up):
  embed the stationary kernel in a periodic 2D torus of >= double size, take
  the real FFT of the kernel image, and colour white noise in the frequency
  domain.  O(n log n), no factorisation, exact for valid embeddings.

Sampling is a pure function of a PRNG key and is vmapped over the batch,
so dataset generation is one fused on-device kernel instead of the
reference's per-sample numpy loop (RandomField.py:113-132).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Optional, Union

import numpy as np
import jax
import jax.numpy as jnp


def pixel_center_points(py: int, px: int, ly: float = 1.0, lx: float = 1.0) -> np.ndarray:
    """(py*px, 2) pixel-centre coordinates, row-major with row 0 at the
    BOTTOM in coordinate terms (the reference builds a meshgrid the same
    way, RandomField.py:62-73 -- image orientation only matters at the
    DG0 converter)."""
    wx, wy = lx / px, ly / py
    x = np.linspace(0.5 * wx, lx - 0.5 * wx, px)
    y = np.linspace(0.5 * wy, ly - 0.5 * wy, py)
    X, Y = np.meshgrid(x, y)
    return np.stack([X.ravel(), Y.ravel()], axis=1)


def squared_exponential_covariance(X: np.ndarray, stddev: float, corrlength: float) -> np.ndarray:
    """Dense SE kernel ``sigma^2 exp(-r^2 / (2 l^2))`` + 1e-12 jitter
    (reference: RandomField.py:162-174).  Delegates to
    ``stationary_covariance`` so the kernel/jitter live in one place."""
    return stationary_covariance(X, stddev, corrlength, "se")


def _kernel_fn(kernel: str, stddev: float, corrlength: float):
    """Stationary kernel k(r): 'se' (reference) plus the Matern family
    (nu = 1/2, 3/2, 5/2) used by the high-contrast 128^2 configs --
    beyond the reference, which only ships squared-exponential."""
    s2 = stddev ** 2
    l = corrlength
    k = kernel.lower()
    if k in ("se", "rbf", "gaussian"):
        return lambda r: s2 * np.exp(-0.5 * (r / l) ** 2)
    if k in ("matern12", "exponential"):
        return lambda r: s2 * np.exp(-r / l)
    if k == "matern32":
        c = np.sqrt(3.0) / l
        return lambda r: s2 * (1 + c * r) * np.exp(-c * r)
    if k == "matern52":
        c = np.sqrt(5.0) / l
        return lambda r: s2 * (1 + c * r + (c * r) ** 2 / 3) * np.exp(-c * r)
    raise ValueError(f"unknown kernel {kernel!r}")


def stationary_covariance(X: np.ndarray, stddev: float, corrlength: float,
                          kernel: str = "se") -> np.ndarray:
    r = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    C = _kernel_fn(kernel, stddev, corrlength)(r)
    return C + 1e-12 * np.eye(C.shape[0])


def convert_log_mean_std(mean: float, std: float):
    """Log-normal moment conversion (reference: RandomField.py:211-219)."""
    if mean <= 0 or std <= 0:
        raise ValueError
    mu = np.log(mean) - 0.5 * np.log((std / mean) ** 2 + 1)
    sigma = np.sqrt(np.log((std / mean) ** 2 + 1))
    return mu, sigma


@dataclasses.dataclass(frozen=True, eq=False)
class GaussianRandomField:
    """SE Gaussian random field on a set of points or a pixel grid.

    ``eq=False``: the ndarray ``X`` field would make the generated
    ``__eq__`` raise and ``__hash__`` TypeError; identity semantics."""

    mean: float
    stddev: float
    corrlength: float
    X: np.ndarray  # (n, d) sample locations
    truncation: Optional[Union[int, float, str]] = None
    py: Optional[int] = None
    px: Optional[int] = None
    method: str = "auto"  # 'auto' | 'kl' | 'cholesky' | 'fft'
    kernel: str = "se"    # 'se' (reference) | 'matern12' | 'matern32' | 'matern52'

    def __post_init__(self):
        if self.stddev <= 0 or self.corrlength <= 0:
            raise ValueError("stddev and corrlength must be positive")
        if self.method == "fft" and (self.py is None or self.px is None):
            raise ValueError("method='fft' requires a pixel grid "
                             "(use from_image)")

    # ----------------------------------------------------------- factories
    @classmethod
    def from_image(cls, py, px, mean, stddev, corrlength, truncation=None,
                   ly=1.0, lx=1.0, method="auto", kernel="se"):
        """Pixel-centre grid construction (reference FromImage,
        RandomField.py:61-73)."""
        X = pixel_center_points(py, px, ly, lx)
        return cls(mean=mean, stddev=stddev, corrlength=corrlength, X=X,
                   truncation=truncation, py=py, px=px, method=method,
                   kernel=kernel)

    # ------------------------------------------------------------ properties
    @property
    def dim_out(self) -> int:
        return self.X.shape[0]

    @property
    def _resolved_method(self) -> str:
        if self.method != "auto":
            return self.method
        if self.py is not None and self.dim_out > 8192:
            return "fft"
        if self.truncation is None:
            return "cholesky"
        return "kl"

    @property
    def dim_in(self) -> int:
        if self._resolved_method == "fft":
            # the circulant sampler draws TWO standard-normal grids per
            # sample (real + imaginary parts of the white noise)
            return 2 * int(np.prod(self._fft_factor.shape))
        return self._L.shape[1]

    # -------------------------------------------------------- dense factors
    @cached_property
    def _eig(self):
        C = stationary_covariance(self.X, self.stddev, self.corrlength,
                                  self.kernel)
        eigvals, eigvecs = np.linalg.eigh(C)
        return np.flip(eigvals, 0).copy(), np.fliplr(eigvecs).copy()

    @cached_property
    def eigvals(self) -> np.ndarray:
        return self._eig[0]

    @cached_property
    def _L(self) -> np.ndarray:
        """Colouring matrix: sample = mean + L gamma (reference
        RandomField.py:98-110,176-209)."""
        method = self._resolved_method
        if method == "cholesky":
            C = stationary_covariance(self.X, self.stddev, self.corrlength,
                                      self.kernel)
            return np.linalg.cholesky(C)
        if method == "kl":
            eigvals, eigvecs = self._eig
            trunc = self.truncation
            if isinstance(trunc, str):
                if trunc.lower() != "adaptive":
                    raise ValueError(trunc)
                trunc = 0.999
            if isinstance(trunc, float):
                # reference: explained-variance threshold hard-coded to
                # 0.999 regardless of the float value (RandomField.py:189-192);
                # the crossing-component cut is reference parity too, but
                # keep >= 1 mode when the FIRST eigenvalue already clears
                # the threshold (near-constant fields: argmax returns 0)
                var_explained = np.cumsum(eigvals) / np.sum(eigvals)
                trunc = max(1, int(np.argmax(var_explained > 0.999)))
            if not isinstance(trunc, (int, np.integer)) or trunc < 1 or trunc >= self.dim_out:
                raise ValueError(f"bad truncation {self.truncation}")
            return eigvecs[:, :trunc] * np.sqrt(np.clip(eigvals[:trunc], 0, None))
        raise RuntimeError(method)

    # ---------------------------------------------------------- fft factors
    @cached_property
    def _fft_factor(self) -> np.ndarray:
        """sqrt of the circulant-embedding spectrum, (2*py, 2*px) float64."""
        if self.py is None or self.px is None:
            raise ValueError("fft sampling requires a pixel grid")
        py, px = self.py, self.px
        my, mx = 2 * py, 2 * px
        # pixel widths in PHYSICAL units, derived from the stored points
        # so non-unit domains (from_image ly/lx) get the same covariance
        # as the dense paths
        # a degenerate axis (px==1 / py==1) has no point spacing to read;
        # its single pixel is centred at half the domain extent
        # (pixel_center_points), so width = 2 * centre -- NOT 1.0, which
        # would silently assume a unit domain
        wx = (float(self.X[1, 0] - self.X[0, 0]) if px > 1
              else 2.0 * float(self.X[0, 0]))
        wy = (float(self.X[px, 1] - self.X[0, 1]) if py > 1
              else 2.0 * float(self.X[0, 1]))
        # periodic distances on the embedding torus
        dy = np.minimum(np.arange(my), my - np.arange(my)) * wy
        dx = np.minimum(np.arange(mx), mx - np.arange(mx)) * wx
        r = np.sqrt(dy[:, None] ** 2 + dx[None, :] ** 2)
        row = _kernel_fn(self.kernel, self.stddev, self.corrlength)(r)
        spec = np.fft.fft2(row).real
        if spec.min() < -1e-3 * spec.max():
            # the embedding is only approximately valid: clipping these
            # modes understates the variance.  Happens for corrlength
            # comparable to the domain (where the dense paths are the
            # right tool anyway) -- surface it instead of silently biasing
            import warnings
            warnings.warn(
                f"circulant embedding has significant negative spectrum "
                f"(min {spec.min():.3e} vs max {spec.max():.3e}); sampled "
                f"covariance will be biased -- use method='kl'/'cholesky' "
                f"or a smaller corrlength", stacklevel=2)
        spec = np.clip(spec, 0.0, None)  # tiny negatives from embedding
        return np.sqrt(spec / (my * mx))

    # ------------------------------------------------------------- sampling
    @property
    def max_sample_batch(self) -> int:
        """Largest on-device sampling batch that keeps the sampler's
        intermediates bounded (~256 MB per (n, my, mx) array on the
        fft path, which holds ~6 of them live: at 512^2 the embedding
        grid is 1024^2, so an unbounded 1024-batch draw is a
        4 GB-per-array OOM).  Dense (KL/Cholesky) paths are cheap."""
        if self._resolved_method != "fft":
            return 4096
        from ..utils.backend import effective_platform
        my, mx = self._fft_factor.shape
        # bytes per element of the on-device draw: real f32/f64 on the
        # TPU matmul-DFT path, complex64/128 on the generic fft path
        fw = jnp.empty(0).dtype.itemsize          # 4, or 8 under x64
        per = fw if effective_platform() == "tpu" else 2 * fw
        cap = max(8, int(2 ** 28 // (per * my * mx)))
        # grids <= 256^2 (f32 embedding <= 512^2) ran at chunk 1024 in
        # every recorded study without OOM: keep their chunk stream --
        # and so the dataset a given seed yields -- unchanged; the
        # bound exists for 512^2 and beyond
        if per * my * mx <= 4 * 512 * 512:
            cap = max(cap, 1024)
        return cap

    def sample(self, key: jax.Array, batch_size: Optional[int] = None,
               gamma: Optional[jnp.ndarray] = None, dtype=jnp.float32) -> jnp.ndarray:
        """Draw samples.  Returns (py, px) images (or flat (n,) vectors when
        not grid-based); with ``batch_size`` a leading batch axis is added.
        """
        squeeze = batch_size is None
        n = 1 if squeeze else batch_size

        if self._resolved_method == "fft":
            if gamma is not None:
                raise ValueError(
                    "gamma (a stored latent) is only meaningful on the "
                    "dense KL/Cholesky paths; the fft sampler has no "
                    "'sample = mean + L gamma' contract")
            out = self._sample_fft(key, n, dtype)
        else:
            L = jnp.asarray(self._L, dtype=dtype)
            if gamma is None:
                gamma = jax.random.normal(key, (n, L.shape[1]), dtype=dtype)
            else:
                gamma = jnp.atleast_2d(jnp.asarray(gamma, dtype=dtype))
                # the batch comes from gamma itself; a conflicting
                # batch_size would reshape garbage downstream
                if not squeeze and gamma.shape[0] != n:
                    raise ValueError(f"gamma batch {gamma.shape[0]} != "
                                     f"batch_size {n}")
                n = gamma.shape[0]
                squeeze = squeeze and n == 1
            flat = self.mean + gamma @ L.T
            if self.py is not None:
                out = flat.reshape(n, self.py, self.px)
            else:
                out = flat
        return out[0] if squeeze else out

    def _device_const(self, name: str, host_arr):
        """Device-resident copy of a cached host constant, keyed by the
        effective platform (one upload instead of one per sample() call --
        the 512^2 spectrum alone is 8 MB over the remote tunnel)."""
        from ..utils.backend import effective_platform
        cache = self.__dict__.setdefault("_dev_cache", {})
        k = (name, effective_platform())
        if k not in cache:
            cache[k] = jax.tree_util.tree_map(jnp.asarray, host_arr)
        return cache[k]

    def _sample_fft(self, key, n, dtype):
        from ..utils.backend import effective_platform
        if effective_platform() == "tpu":
            # complex dtypes are unsupported on (some) TPU runtimes
            # (observed 2026-08-16: broadcast of complex64 raises
            # UNIMPLEMENTED via the axon tunnel) -- and the MXU prefers
            # matmuls anyway: use the real-arithmetic DFT below.
            return self._sample_fft_matmul(key, n, dtype)
        f = self._device_const("fft_factor", self._fft_factor)
        my, mx = f.shape
        kr, ki = jax.random.split(key)
        # complex white noise; real and imaginary parts give two independent
        # fields -- we keep the real part (standard circulant embedding)
        # complex white noise xi with E[xi xi^H] = 2I; for a symmetric
        # circulant C = F^H diag(lam) F / m,  Re(F (sqrt(lam/m) xi)) ~ N(0, C)
        eps = (jax.random.normal(kr, (n, my, mx)) +
               1j * jax.random.normal(ki, (n, my, mx)))
        field = jnp.fft.fft2(eps * f).real
        field = field[:, : self.py, : self.px]
        return (self.mean + field).astype(dtype)

    @cached_property
    def _dft_mats(self):
        """Truncated real/imag 2-D DFT matrices (host-side, float64):
        ``Cy (py, my), Sy, CxT (mx, px), SxT`` with
        ``C[j, k] = cos(2 pi j k / m)``, ``S[j, k] = sin(2 pi j k / m)``."""
        my, mx = self._fft_factor.shape
        jy = np.arange(self.py)[:, None] * np.arange(my)[None, :]
        jx = np.arange(mx)[:, None] * np.arange(self.px)[None, :]
        ay = 2.0 * np.pi * jy / my
        ax = 2.0 * np.pi * jx / mx
        return (np.cos(ay), np.sin(ay), np.cos(ax), np.sin(ax))

    def _sample_fft_matmul(self, key, n, dtype):
        """Same math as ``_sample_fft`` in pure real arithmetic:
        field = Re(fft2((a + i b) * f))
              = Cy @ (u @ CxT + w @ SxT) + Sy @ (w @ CxT - u @ SxT),
        u = a*f, w = b*f -- six batched MXU matmuls, no complex dtype.
        """
        # draw eps at the default float width (matches _sample_fft's draws
        # for the same key, f64 under x64 / f32 on TPU)
        f = self._device_const("fft_factor", self._fft_factor)
        my, mx = f.shape
        kr, ki = jax.random.split(key)
        a = jax.random.normal(kr, (n, my, mx))
        b = jax.random.normal(ki, (n, my, mx))
        u = a * f
        w = b * f
        Cy, Sy, CxT, SxT = self._device_const("dft_mats", self._dft_mats)
        P = u @ CxT + w @ SxT                      # (n, my, px)
        Q = w @ CxT - u @ SxT
        field = jnp.einsum("rj,njc->nrc", Cy, P) \
            + jnp.einsum("rj,njc->nrc", Sy, Q)     # (n, py, px)
        return (self.mean + field).astype(dtype)

    def sample_numpy(self, rng: np.random.Generator,
                     batch_size: int) -> np.ndarray:
        """Host-side sampling with numpy (float64): the right path for
        one-time dataset generation -- on remote-TPU runtimes even
        CPU-backend jax dispatch pays tunnel overheads.  Statistically
        identical to ``sample`` (different RNG stream)."""
        if self._resolved_method == "fft":
            f = self._fft_factor
            my, mx = f.shape
            eps = (rng.standard_normal((batch_size, my, mx))
                   + 1j * rng.standard_normal((batch_size, my, mx)))
            try:  # multithreaded fft when scipy is present
                from scipy import fft as sfft
                spec = sfft.fft2(eps * f, workers=-1)
            except ImportError:  # pragma: no cover
                spec = np.fft.fft2(eps * f)
            field = spec.real[:, : self.py, : self.px]
            return self.mean + field
        L = self._L
        gamma = rng.standard_normal((batch_size, L.shape[1]))
        flat = self.mean + gamma @ L.T
        if self.py is not None:
            return flat.reshape(batch_size, self.py, self.px)
        return flat

    def subspace(self) -> np.ndarray:
        """Truncated colouring matrix (reference: RandomField.py:151-159)."""
        L = self._L
        if L.shape[0] == L.shape[1]:
            raise RuntimeError("subspace requires a truncated factor")
        return L
