"""Dataset management: raw random fields -> assembled training arrays,
named partitions, lazy dataset views.

TPU-native re-implementation of ``DataLoader`` / ``DataSet``
(reference: utils/data.py:8-450).  Key differences:

* label generation (the per-sample FEniCS ``solve`` loop,
  utils/data.py:96-99) becomes ONE batched on-device CG solve;
* arrays are numpy on the host until a DataSet view casts them to the
  requested dtype as jax arrays;
* partition bookkeeping (randomized_partition / grow_partition / restrict)
  keeps the reference's permutation-compatible semantics so parity runs
  can see identical splits.
"""

from __future__ import annotations

import hashlib
import time
import weakref
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..fem.bc import BoundaryConditionEnsemble
from ..fem.pixels import PixelConverter


class DataLoader:
    """Owns the raw field tensor X (N, py, px) and its assembled products.

    (reference: utils/data.py:8-331)
    """

    VALID_KEYS = ("X", "X_DG", "Y", "F_ROM_BC", "BCE")

    def __init__(self, X: np.ndarray, X_DG=None, Y=None, BCE=None,
                 F_ROM_BC=None, hash=None):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim != 3:
            raise ValueError("X must be (N, py, px)")
        if BCE is not None and len(BCE) != X.shape[0]:
            raise ValueError(
                f"BCE has {len(BCE)} boundary conditions for "
                f"{X.shape[0]} fields")
        self._X = X
        self._X_DG = X_DG
        self._Y = Y
        self._BCE = BCE
        self._F_ROM_BC = F_ROM_BC

        self._permutation: Dict[str, np.ndarray] = {}
        self._assigned_chunks: Dict[str, dict] = {}
        self._state_indicator: Dict[str, int] = {}
        self._dependent_datasets = []
        self._hash = hash
        self._lock_physics_assembly = False

    # ------------------------------------------------------------ basic
    def lock_physics_assembly(self):
        """Mark as unlabeled-only (reference: utils/data.py:47-48)."""
        self._lock_physics_assembly = True

    @property
    def hash(self) -> str:
        if self._hash is None:
            self._hash = hashlib.sha256(
                np.ascontiguousarray(self._X)).hexdigest()
        return self._hash

    @property
    def N(self) -> int:
        return self._X.shape[0]

    def __len__(self):
        return self.N

    def register_dataset(self, dataset):
        # weak refs: ablation loops create many short-lived DataSet views
        # over one loader; strong refs would pin every superseded view
        # (and its device-array cache) for the loader's lifetime
        self._dependent_datasets.append(weakref.ref(dataset))

    def _live_datasets(self):
        out = [r() for r in self._dependent_datasets]
        self._dependent_datasets = [r for r, d in
                                    zip(self._dependent_datasets, out)
                                    if d is not None]
        return [d for d in out if d is not None]

    # --------------------------------------------------------- assembly
    def assemble_BCE(self, physics, rng: Optional[np.random.Generator] = None):
        """Sample one BC per field and cache dofs for both spaces
        (reference: utils/data.py:66-70).

        Without an explicit ``rng`` the BC draw is seeded from the
        loader's content hash: rebuilding a loader from the same fields
        (same ``from_sampler`` key, or the same file) reproduces the same
        boundary conditions -- so trainer construction is deterministic
        end-to-end, which checkpoint-resume determinism relies on.  (The
        reference leaves this to torch's global RNG state.)"""
        if rng is None:
            rng = np.random.default_rng(int(self.hash[:16], 16))
        family = physics["fom"].physics_id
        self._BCE = BoundaryConditionEnsemble.from_factory(family, self.N, rng)
        self._BCE.register_function_space("rom", physics["rom"].grid)
        self._BCE.register_function_space("fom", physics["fom"].grid)

    def assemble(self, physics, BCE: Optional[BoundaryConditionEnsemble] = None,
                 rng: Optional[np.random.Generator] = None,
                 label_batch: int = 256, rows=None):
        """Assemble X_DG, labels Y (batched on-device FOM solves) and
        F_ROM_BC (reference: utils/data.py:72-103).

        ``rows``: optional row indices (or slice) to solve labels for --
        the multi-host process-local loading path: each host solves ONLY
        the labels its mesh shard consumes (its slice of each training
        chunk, ``parallel.local_shard_slice``, mapped through the
        dataset permutation, plus any replicated chunks such as
        validation).  Unsolved rows are left NaN so an ownership mistake
        surfaces as a loud non-finite loss, never a silent wrong label.
        X_DG / F_ROM_BC are cheap index ops and stay full-size.
        """
        if self._lock_physics_assembly:
            raise RuntimeError("physics assembly locked for this loader")

        if self._BCE is None:
            if BCE is not None:
                assert BCE.check_if_registered("fom")
                assert BCE.check_if_registered("rom")
                if len(BCE) != self.N:
                    raise ValueError(
                        f"BCE has {len(BCE)} boundary conditions for "
                        f"{self.N} fields -- a mismatched ensemble would "
                        "silently mislabel the dataset")
                self._BCE = BCE
            else:
                self.assemble_BCE(physics, rng)

        fom = physics["fom"]
        conv = PixelConverter(fom.grid)
        # pure index op -- run host-side (large device round-trips through
        # tunneled runtimes are slow and have crashed TPU workers)
        cell_to_pixel = np.asarray(conv._cell_to_pixel)
        self._X_DG = self._X.reshape(self.N, -1)[:, cell_to_pixel]

        vals = self._BCE.constrained_values("fom")
        if rows is None:
            row_idx = np.arange(self.N)
            Y = np.zeros((self.N, fom.dim_out), dtype=np.float64)
        else:
            if isinstance(rows, slice):
                row_idx = np.arange(self.N)[rows]
            else:
                r = np.asarray(rows)
                # a boolean mask cast to int64 would read as indices
                # {0,1} -- honor numpy mask semantics instead
                row_idx = np.flatnonzero(r) if r.dtype == np.bool_ \
                    else r.astype(np.int64)
            Y = np.full((self.N, fom.dim_out), np.nan, dtype=np.float64)
        n_rows = row_idx.size
        solve = fom.solve_batched
        # cap per-dispatch batch by grid size to bound device peak memory
        # (a 96x 256^2 MG solve has crashed a TPU worker)
        label_batch = max(8, min(label_batch, 2 ** 22 // fom.grid.n_cells))
        n_batches = -(-n_rows // label_batch)
        for k in range(n_batches):
            sl = row_idx[k * label_batch: (k + 1) * label_batch]
            # pad the tail so every dispatch reuses one compiled shape
            a = np.exp(self._X_DG[sl])
            v = vals[sl]
            pad = label_batch - a.shape[0]
            if pad:
                a = np.concatenate([a, np.ones((pad,) + a.shape[1:])])
                v = np.concatenate([v, np.zeros((pad,) + v.shape[1:])])
            # tunneled TPU workers occasionally crash-restart mid-batch;
            # the dispatch is idempotent, so retry with backoff
            for attempt in range(3):
                try:
                    out = np.asarray(solve(jnp.asarray(a), jnp.asarray(v)))
                    break
                except jax.errors.JaxRuntimeError:
                    if attempt == 2:
                        raise
                    time.sleep(30.0 * (attempt + 1))
            Y[sl] = out[: sl.size]
        self._Y = Y
        self._F_ROM_BC = self._BCE.full_f_with_applied_bc("rom")
        # re-assembly replaces the label arrays: invalidate dependent
        # DataSet caches the same way reset/grow_partition do, or views
        # keep serving the stale labels
        for ds in self._live_datasets():
            ds.trigger_update()

    # --------------------------------------------------------- accessors
    @property
    def X(self):
        return self._X

    def _need(self, attr, name):
        if attr is None:
            raise RuntimeError(f"{name}: assembly has not been called")
        return attr

    @property
    def X_DG(self):
        return self._need(self._X_DG, "X_DG")

    @property
    def Y(self):
        return self._need(self._Y, "Y")

    @property
    def F_ROM_BC(self):
        return self._need(self._F_ROM_BC, "F_ROM_BC")

    @property
    def BCE(self):
        return self._need(self._BCE, "BCE")

    # -------------------------------------------------------- partitions
    def reset_partition(self, identifier: Optional[str] = None):
        if identifier is not None:
            del self._permutation[identifier]
            del self._assigned_chunks[identifier]
            del self._state_indicator[identifier]
        else:
            self._permutation = {}
            self._assigned_chunks = {}
            self._state_indicator = {}
        for ds in self._live_datasets():
            ds.trigger_update()

    def ascending_partition(self, chunks, identifier="default",
                            ForceOverwrite=False):
        return self.randomized_partition(
            chunks, identifier=identifier, ForceOverwrite=ForceOverwrite,
            permutation=np.arange(self.N))

    def randomized_partition(self, chunks: dict, identifier: str = "default",
                             *, ForceOverwrite: bool = False,
                             permutation=None,
                             rng: Optional[np.random.Generator] = None):
        """Named disjoint chunks over a permutation
        (reference: utils/data.py:179-211)."""
        if identifier in self._permutation and not ForceOverwrite:
            raise RuntimeError(f"partition '{identifier}' exists")
        if not chunks:
            raise ValueError("empty chunks")
        if sum(chunks.values()) > self.N:
            raise ValueError("partition larger than dataset")

        if permutation is None:
            rng = rng or np.random.default_rng()
            permutation = rng.permutation(self.N)
        permutation = np.asarray(permutation, dtype=np.int64)
        # a wrong user-supplied permutation (stale checkpoint array,
        # duplicates) would silently leak samples across chunks
        if permutation.shape != (self.N,) or \
                len(np.unique(permutation)) != self.N or \
                permutation.min() < 0 or permutation.max() >= self.N:
            raise ValueError(
                f"permutation must be a permutation of range({self.N})")

        self._permutation[identifier] = permutation
        self._assigned_chunks[identifier] = {}
        ptr = 0
        for label, size in chunks.items():
            self._assigned_chunks[identifier][label] = [
                np.arange(ptr, ptr + size, dtype=np.int64)]
            ptr += size
        self._state_indicator[identifier] = ptr
        self._check_chunks(identifier)

    def _check_chunks(self, identifier):
        ids = np.concatenate([np.concatenate(sub) for sub in
                              self._assigned_chunks[identifier].values()])
        unique, counts = np.unique(ids, return_counts=True)
        assert np.all(counts == 1)
        assert unique.min() >= 0 and unique.max() < self.N

    def grow_partition(self, chunks_growth: dict, identifier="default",
                       SpecifyIncremental: bool = True):
        """Incrementally extend chunks from unassigned samples
        (reference: utils/data.py:223-258)."""
        if identifier not in self._assigned_chunks:
            raise ValueError(f"unknown identifier {identifier}")
        for key in chunks_growth:
            if key not in self._assigned_chunks[identifier]:
                raise ValueError(f"unknown chunk label {key}")
        if not chunks_growth:
            raise ValueError("empty growth dict")

        chunks_growth = dict(chunks_growth)
        if not SpecifyIncremental:
            for label in chunks_growth:
                used = sum(a.size for a in
                           self._assigned_chunks[identifier][label])
                if used >= chunks_growth[label]:
                    raise ValueError
                chunks_growth[label] -= used

        available = self.N - self._state_indicator[identifier]
        if sum(chunks_growth.values()) > available:
            raise ValueError("not enough unassigned samples")

        ptr = self._state_indicator[identifier]
        for label, size in chunks_growth.items():
            self._assigned_chunks[identifier][label].append(
                np.arange(ptr, ptr + size, dtype=np.int64))
            ptr += size
        self._state_indicator[identifier] = ptr
        self._check_chunks(identifier)
        for ds in self._live_datasets():
            ds.trigger_update()

    def construct_dataset_dictionary(self, *, identifier=None, dtype,
                                     device=None):
        """DataSet views per chunk (reference: utils/data.py:261-280)."""
        if identifier is None:
            if not self._permutation:
                raise RuntimeError("no partitions defined")
            return {
                ident: {label: DataSet(self, label=label, identifier=ident,
                                       dtype=dtype)
                        for label in self._assigned_chunks[ident]}
                for ident in self._permutation
            }
        if identifier not in self._permutation:
            raise KeyError(identifier)
        return {label: DataSet(self, label=label, identifier=identifier,
                               dtype=dtype)
                for label in self._assigned_chunks[identifier]}

    # ------------------------------------------------------------ io
    def save(self, path: str):
        """Persist raw fields + hash (reference: utils/data.py:284-290)."""
        if not path.endswith(".npz"):
            # np.savez appends '.npz' to any other name, so save() would
            # write to a different file than from_file() later reads
            raise ValueError(f"path must end with .npz, got {path!r}")
        np.savez(path, X=self._X, hash=np.bytes_(self.hash.encode()))

    @classmethod
    def from_file(cls, path: str) -> "DataLoader":
        state = np.load(path, allow_pickle=False)
        return cls(X=state["X"], hash=bytes(state["hash"]).decode())

    @classmethod
    def from_sampler(cls, sampler, N: int, key=None,
                     dtype=jnp.float64) -> "DataLoader":
        """Vectorised replacement for the per-sample loop of
        utils/data.py:312-325.

        With a TPU attached, sampling runs on-device in fixed-size chunks
        (the matmul-DFT circulant path -- this host has few cores, so
        10k+ host-side fields would take tens of minutes).  On CPU-only
        backends it runs host-side in numpy (``sample_numpy``).  ``key``
        seeds either stream for reproducibility.

        NOTE: the two streams are intentionally DIFFERENT -- the same key
        yields different (equally distributed) datasets on TPU vs CPU
        backends.  Within one backend the draw is fully reproducible.
        The device path samples at float32 regardless of ``dtype`` (f64
        is unsupported on TPU); fields are stored float64 host-side
        either way, so ``dtype`` only selects the sampling precision of
        the host/fallback paths.
        """
        if key is None:
            seed = 0
        elif hasattr(key, "dtype"):
            seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
        else:
            seed = int(key)
        from ..utils.backend import effective_platform
        if effective_platform() != "cpu" and hasattr(sampler, "sample"):
            # bucketed chunk sizes: one compiled shape for large N, but a
            # tiny request (N=24) should not sample/pay for a 1024-batch;
            # capped by the sampler's own memory bound (512^2 fields OOM
            # at chunk 1024 -- the circulant embedding is 1024^2)
            CH = next(c for c in (128, 1024) if c >= min(N, 1024))
            CH = min(CH, getattr(sampler, "max_sample_batch", CH))
            chunks = []
            base = jax.random.PRNGKey(seed)
            for i in range(0, N, CH):
                x = sampler.sample(jax.random.fold_in(base, i),
                                   batch_size=CH, dtype=jnp.float32)
                chunks.append(np.asarray(x[:min(CH, N - i)]))
            X = np.concatenate(chunks, axis=0)
        elif hasattr(sampler, "sample_numpy"):
            # chunked like the device path: one (N, nx, ny) draw at
            # 512^2 x 20k fields peaks at ~1 TB of complex intermediates
            # on the FFT path; the cap bounds host peak memory the same
            # way max_sample_batch bounds the device
            rng_np = np.random.default_rng(seed)
            CH = max(1, min(N, getattr(sampler, "max_sample_batch", 1024),
                            1024))
            parts = [sampler.sample_numpy(rng_np, min(CH, N - i))
                     for i in range(0, N, CH)]
            X = parts[0] if len(parts) == 1 else np.concatenate(parts)
        else:  # generic jax sampler fallback -- chunked like the paths
            # above (one unchunked N-sized draw would re-introduce the
            # unbounded peak memory the caps exist to prevent)
            CH = max(1, min(N, getattr(sampler, "max_sample_batch", 1024),
                            1024))
            base = jax.random.PRNGKey(seed)
            parts = [np.asarray(sampler.sample(
                jax.random.fold_in(base, i),
                batch_size=min(CH, N - i), dtype=dtype))
                for i in range(0, N, CH)]
            X = parts[0] if len(parts) == 1 else np.concatenate(parts)
        return cls(X=np.asarray(X, dtype=np.float64))

    def __repr__(self):  # pragma: no cover
        return (f"DataLoader with {self.N} random field realizations "
                f"({self._X.shape[1]},{self._X.shape[2]}) "
                f"[Assembled = {self._X_DG is not None}]")


class DataSet:
    """Lazy view over one partition chunk with dtype-cast device caching
    (reference: utils/data.py:334-450)."""

    def __init__(self, dataloader: DataLoader, label: str,
                 identifier: str = "default", *, dtype):
        self._dataloader = dataloader
        self.identifier = identifier
        self.label = label
        dataloader.register_dataset(self)
        self._cached_indices = None
        self._cache: dict = {}
        self._dtype = dtype
        self._N_target: Optional[int] = None

    @property
    def indices(self) -> np.ndarray:
        if self._cached_indices is None:
            subset = np.concatenate(
                self._dataloader._assigned_chunks[self.identifier][self.label])
            self._cached_indices = \
                self._dataloader._permutation[self.identifier][subset]
        return self._cached_indices

    def __len__(self):
        return len(self.indices) if self._N_target is None else self._N_target

    @property
    def N(self) -> int:
        return len(self)

    @property
    def N_max(self) -> int:
        return len(self.indices)

    def restrict(self, N_target: int):
        """Use only the first N_target samples (reference:
        utils/data.py:393-408; the negative-N guard is stricter than the
        reference, which would serve nonsense slices)."""
        if N_target > self.N_max or N_target < 0:
            raise ValueError(f"N_target must be in [0, {self.N_max}], "
                             f"got {N_target}")
        if N_target == self._N_target:
            return
        self._N_target = None if N_target == self.N_max else N_target
        self.trigger_update()

    def grow_in_size(self, N: int, incremental: bool = False):
        # non-incremental growth counts from the RESTRICTED length self.N,
        # not N_max -- reference parity (utils/data.py:382); growing a
        # restricted view therefore overgrows the raw chunk there too
        n_add = N if incremental else N - self.N
        if n_add <= 0:
            raise ValueError
        self._dataloader.grow_partition({self.label: n_add},
                                        identifier=self.identifier)
        self.trigger_update()

    def trigger_update(self):
        self._cached_indices = None
        self._cache = {}

    def get(self, key: str, random_subset: Optional[int] = None,
            rng: Optional[np.random.Generator] = None):
        """Fetch a cached device array for one key; ``random_subset`` draws
        a random minibatch (reference: utils/data.py:419-445)."""
        if key not in DataLoader.VALID_KEYS:
            raise ValueError(key)
        if key not in self._cache:
            if self.N == 0:
                self._cache[key] = None
            else:
                Q = getattr(self._dataloader, key)
                if key == "BCE":
                    self._cache[key] = Q[list(self.indices[: self.N])]
                else:
                    arr = np.asarray(Q)[self.indices]
                    if self._N_target is not None:
                        arr = arr[: self._N_target]
                    if key in ("X", "Y", "F_ROM_BC"):
                        arr = jnp.asarray(arr, dtype=self._dtype)
                    else:
                        arr = jnp.asarray(arr)
                    self._cache[key] = arr
        val = self._cache[key]
        if random_subset is None or val is None:
            return val
        rng = rng or np.random.default_rng()
        idx = rng.permutation(self.N)[:random_subset]
        return val[jnp.asarray(idx)]

    def __repr__(self):  # pragma: no cover
        return (f"Virtual dataset with {self.N} datapoints | {self.label} |"
                f" {self.identifier}")
