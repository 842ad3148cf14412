"""Production serving of the extracted discriminative surrogate.

The reference's end product is a deterministic ``x -> y`` surrogate
(``DiscriminativeModel``, reference generative.py:605-644) whose
deployment story is "pickle the torch module" -- there is no export,
versioning, or serving path.  This module is the TPU-native one:

* **Static batch buckets.**  TPU serving is static-shape: dynamic batch
  dimensions defeat XLA's MXU tiling and force request-time recompiles.
  A :class:`SurrogateBundle` AOT-exports ONE executable per batch bucket
  (via :mod:`jax.export` / StableHLO) and pads each request up to the
  smallest bucket that fits; requests larger than the biggest bucket are
  streamed through it in chunks.  A server process therefore never
  traces or compiles at request time.
* **Self-contained artifacts.**  ``jax.export`` bakes the trained
  parameters into the serialized module as constants, so the on-disk
  bundle (a zip of StableHLO blobs + a JSON manifest) is the complete
  deployable -- no Python model code, no param checkpoint, no Flax
  required at serving time beyond JAX itself.
* **Multi-platform.**  ``platforms=("tpu", "cpu")`` lowers each bucket
  for both targets, so the same artifact serves on TPU pods and falls
  back to CPU canaries.

Measured throughput for the exported 'highres' surrogate lives in
PARITY.md (benchmarks/serving_bench.py).
"""

from __future__ import annotations

import dataclasses
import json
import zipfile
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export


DEFAULT_BUCKETS = (8, 64, 512)


def surrogate_fn(discriminative, params, batch_stats, *,
                 use_encoder: bool = True):
    """Freeze a trained generative model into a pure ``f(x, F) -> y``.

    ``params``/``batch_stats`` are snapshotted with a REAL buffer copy
    (``jnp.array``): the trainer's jitted step donates the TrainState, so
    an identity/``asarray`` "snapshot" would hold soon-deleted buffers and
    the surrogate would raise ``Array has been deleted`` after the next
    training step (same hazard as DiscriminativeModel.extract_params).
    The returned function is jit/export-ready with exactly two runtime
    inputs.
    """
    snap_p = jax.tree_util.tree_map(jnp.array, params)
    snap_b = jax.tree_util.tree_map(jnp.array, batch_stats)

    def fn(x, F):
        return discriminative(snap_p, snap_b, x, F, use_encoder=use_encoder)

    return fn


@dataclasses.dataclass
class SurrogateBundle:
    """A deployable set of AOT-exported surrogate executables, one per
    static batch bucket.

    Build from a trained model with :meth:`build`, persist with
    :meth:`save`, reload (possibly in a paramless serving process) with
    :meth:`load`, and serve with :meth:`predict`.
    """

    buckets: Tuple[int, ...]
    image_shape: Tuple[int, ...]
    dim_F: int
    dtype: str
    exported: Dict[int, jax_export.Exported]

    # ------------------------------------------------------------ build
    @classmethod
    def build(cls, discriminative, params, batch_stats,
              image_shape: Sequence[int], dim_F: int, *,
              buckets: Sequence[int] = DEFAULT_BUCKETS,
              dtype=jnp.float32,
              platforms: Optional[Sequence[str]] = None,
              use_encoder: bool = True) -> "SurrogateBundle":
        """AOT-export the frozen surrogate at each batch bucket.

        ``platforms=None`` exports for the current default backend only;
        pass e.g. ``("tpu", "cpu")`` for a multi-target artifact.
        """
        fn = jax.jit(surrogate_fn(discriminative, params, batch_stats,
                                  use_encoder=use_encoder))
        dtype = jnp.dtype(dtype)
        image_shape = tuple(int(s) for s in image_shape)
        if not buckets:
            raise ValueError("buckets must be non-empty")
        exported: Dict[int, jax_export.Exported] = {}
        for b in sorted(set(int(b) for b in buckets)):
            x_spec = jax.ShapeDtypeStruct((b,) + image_shape, dtype)
            f_spec = jax.ShapeDtypeStruct((b, int(dim_F)), dtype)
            exported[b] = jax_export.export(
                fn, platforms=None if platforms is None else list(platforms)
            )(x_spec, f_spec)
        return cls(buckets=tuple(sorted(exported)),
                   image_shape=image_shape, dim_F=int(dim_F),
                   dtype=dtype.name, exported=exported)

    # ---------------------------------------------------------- serving
    def predict(self, x, F) -> jnp.ndarray:
        """Serve a request of any batch size.

        Pads up to the smallest bucket that fits; requests beyond the
        largest bucket are processed in largest-bucket chunks (the last
        chunk padded).  Returns exactly ``x.shape[0]`` rows.
        """
        # cast to the exported dtype (the manifest stores it exactly for
        # this: x64-enabled callers hand in f64 arrays that the StableHLO
        # executable would reject with an opaque signature error) and
        # validate shapes BEFORE any padding work
        dt = jnp.dtype(self.dtype)
        x = jnp.asarray(x, dtype=dt)
        F = jnp.asarray(F, dtype=dt)
        if x.ndim == 0 or F.ndim == 0:
            raise ValueError("x and F must be batched arrays, got a scalar")
        n = x.shape[0]
        if n == 0:
            raise ValueError("empty request")
        if F.shape[0] != n:
            raise ValueError(f"x batch {n} != F batch {F.shape[0]}")
        if tuple(x.shape[1:]) != self.image_shape:
            raise ValueError(f"x image shape {tuple(x.shape[1:])} != "
                             f"exported {self.image_shape}")
        if F.shape[1:] != (self.dim_F,):
            raise ValueError(f"F feature dim {F.shape[1:]} != "
                             f"({self.dim_F},)")
        cap = self.buckets[-1]
        if n <= cap:
            return self._call_padded(x, F, n)
        # stream through the largest bucket
        outs = []
        for i in range(0, n, cap):
            xs, fs = x[i:i + cap], F[i:i + cap]
            outs.append(self._call_padded(xs, fs, xs.shape[0]))
        return jnp.concatenate(outs, axis=0)

    def _bucket_call(self, bucket: int):
        """One jit-wrapped callable per bucket, cached: ``Exported.call``
        builds a fresh custom_vjp wrapper per invocation, so calling it
        eagerly misses the jit trace cache on function identity every
        request (measured 6x dispatch overhead on a trivial export)."""
        cache = self.__dict__.setdefault("_jitted_calls", {})
        if bucket not in cache:
            cache[bucket] = jax.jit(self.exported[bucket].call)
        return cache[bucket]

    def _call_padded(self, x, F, n: int) -> jnp.ndarray:
        bucket = next(b for b in self.buckets if b >= n)
        if n < bucket:
            pad = bucket - n
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
            F = jnp.concatenate(
                [F, jnp.zeros((pad,) + F.shape[1:], F.dtype)], axis=0)
        y = self._bucket_call(bucket)(x, F)
        return y[:n]

    # ------------------------------------------------------ persistence
    def save(self, path: str) -> str:
        """Write the bundle as one zip: ``manifest.json`` + a serialized
        StableHLO blob per bucket."""
        manifest = {"buckets": list(self.buckets),
                    "image_shape": list(self.image_shape),
                    "dim_F": self.dim_F, "dtype": self.dtype,
                    "format": "gpipde-surrogate-bundle-v1"}
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("manifest.json", json.dumps(manifest))
            for b, exp in self.exported.items():
                zf.writestr(f"bucket_{b}.stablehlo", bytes(exp.serialize()))
        return path

    @classmethod
    def load(cls, path: str) -> "SurrogateBundle":
        with zipfile.ZipFile(path, "r") as zf:
            manifest = json.loads(zf.read("manifest.json"))
            if manifest.get("format") != "gpipde-surrogate-bundle-v1":
                raise ValueError(f"not a surrogate bundle: {path}")
            exported = {
                int(b): jax_export.deserialize(
                    bytearray(zf.read(f"bucket_{b}.stablehlo")))
                for b in manifest["buckets"]}
        return cls(buckets=tuple(sorted(exported)),
                   image_shape=tuple(manifest["image_shape"]),
                   dim_F=int(manifest["dim_F"]), dtype=manifest["dtype"],
                   exported=exported)

    # ------------------------------------------------------------- info
    @property
    def platforms(self) -> Tuple[str, ...]:
        return tuple(self.exported[self.buckets[0]].platforms)

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return (f"SurrogateBundle(buckets={self.buckets}, "
                f"image={self.image_shape}, dim_F={self.dim_F}, "
                f"dtype={self.dtype}, platforms={self.platforms})")
