"""Generic feed-forward networks.

Re-implementation of ``FeedforwardNeuralNetwork`` and its linear-decay
factory (reference: lamp/neuralnets.py:7-44, lamp/utils.py:39-46).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import flax.linen as nn


def architecture_from_linear_decay(dim_in: int, dim_out: int,
                                   num_hidden_layers: int) -> list:
    """Linearly interpolated hidden widths (reference: lamp/utils.py:39-46)."""
    widths = np.linspace(dim_in, dim_out, num_hidden_layers + 2).astype(int)
    return [int(w) for w in widths[1:-1]]


class FeedforwardNeuralNetwork(nn.Module):
    """MLP with ReLU hidden activations and optional output activation +
    dropout (reference: lamp/neuralnets.py:7-29)."""

    dim_out: int
    architecture: Sequence[int] = ()
    out_activation: Optional[Callable] = None
    dropout: Optional[float] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for w in self.architecture:
            x = nn.Dense(int(w))(x)
            if self.dropout is not None:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = nn.relu(x)
        x = nn.Dense(self.dim_out)(x)
        if self.dropout is not None:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.out_activation is not None:
            x = self.out_activation(x)
        return x

    @classmethod
    def from_linear_decay(cls, dim_in: int, dim_out: int,
                          num_hidden_layers: int, **kw):
        """(reference: lamp/neuralnets.py:31-44)"""
        return cls(dim_out=dim_out,
                   architecture=architecture_from_linear_decay(
                       dim_in, dim_out, num_hidden_layers), **kw)

    FromLinearDecay = from_linear_decay
