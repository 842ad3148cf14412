"""Named data presets: random-field sampler + dataset sizes + disk cache.

TPU-native re-implementation of ``DataFactory`` (reference:
factories/data.py:9-101): each preset pins a GaussianRandomField and the
labeled/unlabeled pool sizes; loaders are cached on disk ('.npz' instead of
torch '.pt').
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..data.loader import DataLoader
from ..fem.randomfield import GaussianRandomField
from ..utils.strings import ensure_file_extension

DATAPATH = "cdata/"


class DataFactory:
    """Base factory (reference: factories/data.py:9-77)."""

    _N: int
    _N_unsupervised: int
    _rfs: GaussianRandomField
    _identifier: Optional[str] = None

    def __init__(self, config=None, path: Optional[str] = None):
        self.config = config
        self._path = path
        self._forced_setup = False

    @property
    def path(self) -> str:
        path = self._path or DATAPATH
        if not path.endswith("/"):
            raise ValueError(f"path must end with a slash | path={path}")
        return path

    @property
    def identifier(self) -> str:
        return self._identifier or type(self).__name__

    @classmethod
    def FromIdentifier(cls, identifier: str, *args, **kwargs) -> "DataFactory":
        try:
            factory_class = _REGISTRY[identifier]
        except KeyError:
            raise KeyError(
                f"DataFactory cannot provide factory for identifier "
                f"{identifier!r}")
        return factory_class(*args, **kwargs)

    from_identifier = FromIdentifier

    def _cache_meta(self, N: int) -> dict:
        """Fingerprint of everything the cached dataset depends on: the
        cache is keyed by identifier only, so a preset edit (N, field
        statistics, kernel) must INVALIDATE it, not silently load stale
        data."""
        rf = self._rfs
        return {"N": int(N), "py": rf.py, "px": rf.px,
                "mean": float(rf.mean), "stddev": float(rf.stddev),
                "corrlength": float(rf.corrlength), "kernel": rf.kernel,
                "truncation": str(rf.truncation)}

    def _create_dataloader(self, N: int, identifier: str, extension: str,
                           seed: int) -> DataLoader:
        """Load from cache or sample & save (reference:
        factories/data.py:49-61).  A sidecar ``.meta.json`` fingerprint
        guards against stale caches when preset parameters change."""
        import json
        import warnings

        file = ensure_file_extension(self.path + identifier, extension)
        meta_file = file + ".meta.json"
        meta = self._cache_meta(N)
        if os.path.exists(file) and not self._forced_setup:
            stale = None
            if os.path.exists(meta_file):
                try:
                    with open(meta_file) as fh:
                        cached = json.load(fh)
                    if cached != meta:
                        stale = f"meta {cached} != {meta}"
                except (OSError, ValueError):
                    stale = "unreadable meta"
            dl = None
            if stale is None:
                dl = DataLoader.from_file(file)
                if dl.N != N or (meta["py"] is not None and
                                 dl.X.shape[1:] != (meta["py"], meta["px"])):
                    stale, dl = (f"cached N={dl.N}/shape={dl.X.shape[1:]}"
                                 f" vs preset N={N}", None)
            if dl is not None:
                if not os.path.exists(meta_file):  # adopt pre-meta caches
                    with open(meta_file, "w") as fh:
                        json.dump(meta, fh)
                return dl
            warnings.warn(f"dataset cache {file} is stale ({stale}); "
                          "resampling", RuntimeWarning)
        os.makedirs(self.path, exist_ok=True)
        dl = DataLoader.from_sampler(self._rfs, N,
                                     key=jax.random.PRNGKey(seed),
                                     dtype=jnp.float64)
        dl.save(file)
        with open(meta_file, "w") as fh:
            json.dump(meta, fh)
        return dl

    def _create_dataloaders(self):
        dl = self._create_dataloader(self._N, self.identifier,
                                     ".labeled.npz", seed=0)
        dlu = self._create_dataloader(self._N_unsupervised, self.identifier,
                                      ".unlabeled.npz", seed=1)
        dlu.lock_physics_assembly()
        return dl, dlu

    def setup(self):
        return self._create_dataloaders()

    def force_setup(self):
        self._forced_setup = True
        return self.setup()


class highres(DataFactory):
    """64x64 fields, adaptive-KL truncation (reference:
    factories/data.py:80-89)."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self._N = 2 * 1024
        self._N_unsupervised = 2048 * 10
        self._rfs = GaussianRandomField.from_image(
            64, 64, mean=0.4, stddev=0.80, corrlength=0.04,
            truncation="adaptive")


class highres32(DataFactory):
    """32x32 fields, Cholesky factorisation (reference:
    factories/data.py:91-100)."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self._N = 1024
        self._N_unsupervised = 2048 * 10
        self._rfs = GaussianRandomField.from_image(
            32, 32, mean=0.4, stddev=0.80, corrlength=0.15, truncation=None)


class highres128(DataFactory):
    """128x128 fields via the FFT circulant path (beyond the reference's
    8192-point dense cap, RandomField.py:43-44)."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self._N = 2 * 1024
        self._N_unsupervised = 2048 * 10
        self._rfs = GaussianRandomField.from_image(
            128, 128, mean=0.4, stddev=0.80, corrlength=0.04, method="fft")


_REGISTRY = {"highres": highres, "highres32": highres32,
             "highres128": highres128}
