"""Decoders z -> random-field reconstruction ("f" in the generative model).

TPU-native re-implementation of bottleneck/Decoder.py: ``CNNDecoder``
(:163-326), ``LinearDecoder`` (:48-101) and ``NeuralNetworkDecoder``
(:104-159).  The CNN decoder returns a pair of (batch, py, px) images
(mean, logsigma) unless ``binary``/``homoscedastic`` is requested,
mirroring Decoder.py:288-305.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .codec import (DenseBlock, TransitionUp, LastDecoding,
                    pad_channels)


class CNNDecoder(nn.Module):
    """DenseNet decoder (reference: bottleneck/Decoder.py:163-241).

    z --Dense--> latent image (latent_img_features, s, s) --conv0-->
    [DenseBlock -> TransitionUp] x --LastDecoding--> 2-channel image.
    ``latent_img_size * 2**len(blocks)`` must equal ``target_img_size``
    (strict check, Decoder.py:186-199).
    """

    target_img_size: int
    dim_latent: int
    latent_img_size: int = 4
    latent_img_features: int = 16
    init_features: int = 32
    blocks: Sequence[int] = (3, 5, 3)
    growth_rate: int = 8
    drop_rate: float = 0.0
    upsample: str = "nearest"
    binary: bool = False
    homoscedastic: bool = False
    force_single_output: bool = False
    # conv compute dtype (None = flax default promotion); params/BN stats
    # stay f32, output cast back to the input dtype
    compute_dtype: Optional[Any] = None
    # pad conv input channels to this multiple (math-preserving zero pad;
    # see codec.pad_channels) -- 0 disables
    pad_cin: int = 0

    def setup(self):
        out_img = self.latent_img_size * 2 ** len(self.blocks)
        if out_img != self.target_img_size:
            raise ValueError(
                f"latent image {self.latent_img_size} with {len(self.blocks)}"
                f" blocks yields {out_img}, target is {self.target_img_size}")

    @property
    def out_channels(self) -> int:
        return 1 if (self.binary or self.force_single_output
                     or self.homoscedastic) else 2

    @nn.compact
    def __call__(self, z, *, train: bool = True, flatten: bool = False):
        b = z.shape[0]
        s = self.latent_img_size
        dt = self.compute_dtype
        x = nn.Dense(s * s * self.latent_img_features)(z)  # latent_map
        in_dtype = x.dtype
        x = x.reshape(b, s, s, self.latent_img_features)
        if dt is not None:
            x = x.astype(dt)
        x = pad_channels(x, self.pad_cin)
        x = nn.Conv(self.init_features, (3, 3), padding="SAME",
                    use_bias=False, dtype=dt)(x)
        nf = self.init_features
        for i, nl in enumerate(self.blocks):
            x = DenseBlock(nl, self.growth_rate, self.drop_rate,
                           pad_cin=self.pad_cin, dtype=dt)(x, train=train)
            nf += nl * self.growth_rate
            if i < len(self.blocks) - 1:
                x = TransitionUp(nf // 2, self.drop_rate, self.upsample,
                                 pad_cin=self.pad_cin, dtype=dt)(
                    x, train=train)
                nf //= 2
        x = LastDecoding(self.out_channels, self.drop_rate, self.upsample,
                         pad_cin=self.pad_cin, dtype=dt)(x, train=train)
        x = x.astype(in_dtype)

        if self.binary:
            out = nn.sigmoid(x[..., 0])
            return out.reshape(b, -1) if flatten else out

        if self.force_single_output:
            # reference Decoder.py:293-304: a single-channel non-binary
            # decode returns the mean alone.  (Reading x[..., 1] here
            # would NOT raise -- JAX clamps static out-of-bounds indices
            # -- it would silently return (mean, mean).)
            out = x[..., 0]
            return out.reshape(b, -1) if flatten else out

        if self.homoscedastic:
            mean = x[..., 0]
            logsigma = self.param(
                "logsigma", nn.initializers.zeros,
                (self.target_img_size, self.target_img_size))
            logsigma = jnp.broadcast_to(logsigma, mean.shape)
        else:
            mean = x[..., 0]
            logsigma = x[..., 1]
        if flatten:
            return mean.reshape(b, -1), logsigma.reshape(b, -1)
        return mean, logsigma

    @property
    def dim_in(self) -> int:
        return self.dim_latent

    @property
    def dim_out(self) -> int:
        return self.target_img_size ** 2


class LinearDecoder(nn.Module):
    """Affine decoder with homoscedastic logsigma (reference:
    bottleneck/Decoder.py:48-101)."""

    dim_latent: int
    dim_out: int
    binary: bool = False

    @nn.compact
    def __call__(self, z, *, train: bool = True, flatten: bool = True):
        mean = nn.Dense(self.dim_out)(z)
        if self.binary:
            return nn.sigmoid(mean)
        logsigma = self.param("logsigma", nn.initializers.zeros,
                              (self.dim_out,))
        return mean, jnp.broadcast_to(logsigma, mean.shape)


class NeuralNetworkDecoder(nn.Module):
    """MLP decoder with linear-decay widths (reference:
    bottleneck/Decoder.py:104-159)."""

    dim_latent: int
    dim_out: int
    num_hidden_layers: int = 1
    binary: bool = False

    @nn.compact
    def __call__(self, z, *, train: bool = True, flatten: bool = True):
        x = z
        widths = np.linspace(self.dim_latent, self.dim_out,
                             self.num_hidden_layers + 2).astype(int)[1:-1]
        for w in widths:
            x = nn.relu(nn.Dense(int(w))(x))
        mean = nn.Dense(self.dim_out)(x)
        if self.binary:
            return nn.sigmoid(mean)
        logsigma = self.param("logsigma", nn.initializers.zeros,
                              (self.dim_out,))
        return mean, jnp.broadcast_to(logsigma, mean.shape)
