"""Encoders x -> (mu_z, logsigma_z).

TPU-native re-implementation of bottleneck/Encoder.py: ``CNNEncoder``
(:133-222, DenseNet trunk + FC + split heads), ``LinearEncoder`` (:25-75)
and ``NeuralNetworkEncoder`` (:79-129).  Input images are (batch, py, px)
(a channel axis is added internally, NHWC).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .codec import DenseBlock, TransitionDown, pad_channels


class SplitHeads(nn.Module):
    """Twin linear heads (reference SplitModule, codec.py:495-504)."""

    latent_dim: int

    @nn.compact
    def __call__(self, x):
        mean = nn.Dense(self.latent_dim)(x)
        logsigma = nn.Dense(self.latent_dim)(x)
        return mean, logsigma


class CNNEncoder(nn.Module):
    """DenseNet conv encoder (reference: bottleneck/Encoder.py:133-196).

    Trunk: In_conv k7s2 -> [DenseBlock -> TransitionDown] x len(blocks)
    (bottleneck design, bn_size=8) -> flatten -> FC(relu) -> split heads.
    ``imsize`` must be divisible by ``2**(len(blocks)+1)``.
    """

    imsize: int
    latent_dim: int
    blocks: Sequence[int] = (3, 5, 3)
    growth_rate: int = 8
    init_features: int = 32
    drop_rate: float = 0.0
    deterministic_head: bool = False  # reference 'makedeterministic'
    # conv compute dtype (None = flax default promotion); params/BN stats
    # stay f32, head runs at input precision
    compute_dtype: Optional[Any] = None
    # pad conv input channels to this multiple (math-preserving zero pad;
    # see codec.pad_channels) -- 0 disables
    pad_cin: int = 0

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dt = self.compute_dtype
        in_dtype = x.dtype
        if x.ndim == 3:
            x = x[..., None]  # (b, h, w) -> NHWC
        if dt is not None:
            x = x.astype(dt)
        x = pad_channels(x, self.pad_cin)
        x = nn.Conv(self.init_features, (7, 7), strides=(2, 2),
                    padding="SAME", use_bias=False, dtype=dt)(x)
        nf = self.init_features
        for nl in self.blocks:
            x = DenseBlock(nl, self.growth_rate, self.drop_rate, bn_size=8,
                           pad_cin=self.pad_cin,
                           bottleneck=True, dtype=dt)(x, train=train)
            nf += nl * self.growth_rate
            x = TransitionDown(nf // 2, self.drop_rate,
                               pad_cin=self.pad_cin, dtype=dt)(
                x, train=train)
            nf //= 2
        x = x.astype(in_dtype)
        imsize_new = self.imsize // (2 ** (len(self.blocks) + 1))
        assert x.shape[-2] == imsize_new and x.shape[-3] == imsize_new, \
            f"encoder trunk produced {x.shape}, expected {imsize_new}^2"
        x = x.reshape(x.shape[0], -1)
        width = nf * imsize_new * imsize_new
        x = nn.relu(nn.Dense(width)(x))
        if self.deterministic_head:
            return nn.Dense(self.latent_dim)(x)
        return SplitHeads(self.latent_dim)(x)

    @property
    def dim_in(self) -> int:
        return self.imsize ** 2


class LinearEncoder(nn.Module):
    """Affine encoder with homoscedastic logsigma (reference:
    bottleneck/Encoder.py:25-75)."""

    dim_in: int
    latent_dim: int
    binary: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = x.reshape(x.shape[0], -1)
        mean = nn.Dense(self.latent_dim)(x)
        if self.binary:
            return mean
        logsigma = self.param("logsigma", nn.initializers.zeros,
                              (self.latent_dim,))
        return mean, jnp.broadcast_to(logsigma, mean.shape)


class NeuralNetworkEncoder(nn.Module):
    """MLP encoder with linear-decay hidden widths (reference:
    bottleneck/Encoder.py:79-129 + lamp/neuralnets.py:31-44)."""

    dim_in: int
    latent_dim: int
    num_hidden_layers: int = 1
    binary: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = x.reshape(x.shape[0], -1)
        widths = np.linspace(self.dim_in, self.latent_dim,
                             self.num_hidden_layers + 2).astype(int)[1:-1]
        for w in widths:
            x = nn.relu(nn.Dense(int(w))(x))
        mean = nn.Dense(self.latent_dim)(x)
        if self.binary:
            return mean
        logsigma = self.param("logsigma", nn.initializers.zeros,
                              (self.latent_dim,))
        return mean, jnp.broadcast_to(logsigma, mean.shape)
