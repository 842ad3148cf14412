"""Batch sampling helpers.

Re-implementation of ``BatchedOverSampler`` / ``CustomTensorDataset``
(reference: lamp/data.py:4-35) in JAX form: samplers are pure functions of
PRNG keys yielding index arrays; the 'dataset' is a tuple of aligned
arrays indexed by them.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BatchedOverSampler:
    """Multinomial with-replacement batches (reference: lamp/data.py:4-21)."""

    batch_size: int
    num_batches: int
    num_data: int

    def __len__(self) -> int:
        return self.num_batches

    def batches(self, key) -> Iterator[jnp.ndarray]:
        for n in range(self.num_batches):
            k = jax.random.fold_in(key, n)
            yield jax.random.randint(k, (self.batch_size,), 0, self.num_data)


@dataclasses.dataclass(frozen=True)
class TensorDataset:
    """Aligned-array dataset (reference CustomTensorDataset,
    lamp/data.py:24-35)."""

    tensors: Tuple

    def __post_init__(self):
        n = self.tensors[0].shape[0]
        assert all(t.shape[0] == n for t in self.tensors)

    def __len__(self) -> int:
        return self.tensors[0].shape[0]

    def __getitem__(self, index):
        out = tuple(t[index] for t in self.tensors)
        return out[0] if len(out) == 1 else out


def minibatch_indices(key, num_data: int, batch_size: int,
                      replace: bool = False) -> jnp.ndarray:
    """Uniform minibatch index draw (jit-safe)."""
    if replace:
        return jax.random.randint(key, (batch_size,), 0, num_data)
    return jax.random.choice(key, num_data, (batch_size,), replace=False)
