"""DenseNet encoder/decoder building blocks (Flax).

TPU-native re-implementation of the reference's torch codec
(bottleneck/codec.py:150-298: ``_DenseLayer``, ``_DenseBlock``,
``_Transition``, ``last_decoding``; originally derived from
cics-nd/pde-surrogate).  Differences driven by the hardware:

* NHWC layout (TPU conv layout; torch uses NCHW),
* BatchNorm with an explicit ``train`` flag + mutable ``batch_stats``
  collection (functional state instead of in-place running stats),
* nearest upsampling as an exact x2 repeat (maps to cheap reshapes).

Channel-count arithmetic matches the reference exactly so preset
architectures ('highres', 'highres32') are parameter-for-parameter
comparable.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact nearest-neighbour x2 upsampling, NHWC."""
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


def upsample_bilinear_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2 upsampling with ``align_corners=True`` semantics,
    matching torch ``UpsamplingBilinear2d(scale_factor=2)`` exactly
    (reference bottleneck/codec.py:147,251,290).  ``jax.image.resize``
    uses half-pixel sampling, so we interpolate separably by hand:
    output index i samples input coordinate ``i*(n-1)/(2n-1)``."""

    def _interp_axis(a: jnp.ndarray, axis: int) -> jnp.ndarray:
        n_in = a.shape[axis]
        if n_in == 1:  # degenerate axis: align_corners copies the single row
            return jnp.repeat(a, 2, axis=axis)
        n_out = 2 * n_in
        coord = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))
        lo = jnp.floor(coord).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = (coord - lo).astype(a.dtype)
        shape = [1] * a.ndim
        shape[axis] = n_out
        w = w.reshape(shape)
        return jnp.take(a, lo, axis=axis) * (1 - w) + jnp.take(a, hi, axis=axis) * w

    x = _interp_axis(x, -3)  # H
    return _interp_axis(x, -2)  # W


_UPSAMPLE = {"nearest": upsample_nearest_2x, "bilinear": upsample_bilinear_2x}


def pad_channels(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Zero-pad the channel (minor) dim up to a multiple of ``multiple``.

    EXACTLY math-preserving when feeding a conv: the padded input
    channels are zero, so whatever weights the (enlarged) kernel holds
    for them contribute nothing to the output, and those weight rows
    receive identically-zero gradients -- the trained function is
    unchanged (tested: test_codec_pad_cin_math_preserving).

    Motivation: the DenseNet runs 2-28-channel convs at 128^2 -- far
    below the TPU's 128-lane tile, so the minor dim wastes most of each
    physical vector transaction.  Padding trades (cheap, MXU) FLOPs for
    regular tiling.  Whether that wins is an empirical question per
    grid; see the PARITY decode-architecture study.
    """
    if multiple <= 0:
        return x
    rem = x.shape[-1] % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, multiple - rem)]
    return jnp.pad(x, pad)


class NormReluConv(nn.Module):
    """BatchNorm -> ReLU -> Conv, the repeated motif of the codec."""

    features: int
    kernel: int = 3
    stride: int = 1
    drop_rate: float = 0.0
    pad_cin: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        # stats reduce in f32 inside flax even when dtype is bf16
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = pad_channels(x, self.pad_cin)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        if self.drop_rate > 0:
            # channel dropout (torch Dropout2d semantics)
            x = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        return x


class DenseLayer(nn.Module):
    """One dense layer: y = concat(x, conv-path(x))  (reference
    bottleneck/codec.py:150-182, incl. the bottleneck design)."""

    growth_rate: int
    drop_rate: float = 0.0
    bn_size: int = 8
    bottleneck: bool = False
    pad_cin: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        in_features = x.shape[-1]
        if self.bottleneck and in_features > self.bn_size * self.growth_rate:
            y = NormReluConv(self.bn_size * self.growth_rate, kernel=1,
                             pad_cin=self.pad_cin, dtype=self.dtype)(
                x, train=train)
            y = NormReluConv(self.growth_rate, kernel=3,
                             pad_cin=self.pad_cin, dtype=self.dtype)(
                y, train=train)
        else:
            y = NormReluConv(self.growth_rate, kernel=3,
                             pad_cin=self.pad_cin, dtype=self.dtype)(
                x, train=train)
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2),
                           deterministic=not train)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseBlock(nn.Module):
    """num_layers stacked DenseLayers (reference codec.py:185-193)."""

    num_layers: int
    growth_rate: int
    drop_rate: float = 0.0
    bn_size: int = 8
    bottleneck: bool = False
    pad_cin: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        for _ in range(self.num_layers):
            x = DenseLayer(self.growth_rate, self.drop_rate, self.bn_size,
                           self.bottleneck, pad_cin=self.pad_cin,
                           dtype=self.dtype)(x, train=train)
        return x


class TransitionDown(nn.Module):
    """Downsampling transition (reference codec.py:196-232).

    bottleneck=True (the reference default): norm-relu-conv1x1 ->
    norm-relu-conv3x3(stride 2); else a single strided conv3x3.
    """

    out_features: int
    drop_rate: float = 0.0
    bottleneck: bool = True
    pad_cin: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.bottleneck:
            x = NormReluConv(self.out_features, kernel=1,
                             drop_rate=self.drop_rate, pad_cin=self.pad_cin,
                             dtype=self.dtype)(x, train=train)
            x = NormReluConv(self.out_features, kernel=3, stride=2,
                             drop_rate=self.drop_rate, pad_cin=self.pad_cin,
                             dtype=self.dtype)(x, train=train)
        else:
            x = NormReluConv(self.out_features, kernel=3, stride=2,
                             drop_rate=self.drop_rate, pad_cin=self.pad_cin,
                             dtype=self.dtype)(x, train=train)
        return x


class TransitionUp(nn.Module):
    """Upsampling transition (reference codec.py:233-268): norm-relu-
    conv1x1 -> norm-relu -> upsample x2 -> conv3x3."""

    out_features: int
    drop_rate: float = 0.0
    upsample: str = "nearest"
    pad_cin: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = NormReluConv(self.out_features, kernel=1,
                         drop_rate=self.drop_rate, pad_cin=self.pad_cin,
                         dtype=self.dtype)(x, train=train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = _UPSAMPLE[self.upsample](x)
        x = pad_channels(x, self.pad_cin)
        x = nn.Conv(self.out_features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        return x


class LastDecoding(nn.Module):
    """Final up-transition emitting the output channels (reference
    codec.py:271-298): norm-relu-conv3x3(f/2) -> norm-relu -> upsample ->
    conv3x3(f/4) -> norm-relu -> conv5x5(out)."""

    out_channels: int
    drop_rate: float = 0.0
    upsample: str = "nearest"
    bias: bool = False
    pad_cin: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        f = x.shape[-1]
        x = NormReluConv(f // 2, kernel=3, drop_rate=self.drop_rate,
                         pad_cin=self.pad_cin, dtype=self.dtype)(
            x, train=train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = _UPSAMPLE[self.upsample](x)
        x = pad_channels(x, self.pad_cin)
        x = nn.Conv(f // 4, (3, 3), padding="SAME", use_bias=self.bias,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = pad_channels(x, self.pad_cin)
        x = nn.Conv(self.out_channels, (5, 5), padding="SAME",
                    use_bias=self.bias, dtype=self.dtype)(x)
        return x


class DenseED(nn.Module):
    """Full dense encoder-decoder (reference codec.py:320-428): In_conv
    (k7 s2) -> [DenseBlock, TransDown] x enc -> [DenseBlock, (TransUp)] x
    dec -> LastDecoding.  ``blocks`` must have odd length (>1)."""

    out_channels: int
    blocks: Sequence[int]
    growth_rate: int = 16
    init_features: int = 48
    drop_rate: float = 0.0
    bn_size: int = 8
    bottleneck: bool = False
    upsample: str = "nearest"
    out_activation: Optional[str] = None
    pad_cin: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        blocks = list(self.blocks)
        if len(blocks) > 1 and len(blocks) % 2 == 0:
            raise ValueError("length of blocks must be odd")
        enc = blocks[: len(blocks) // 2]
        dec = blocks[len(blocks) // 2:]

        # mixed precision (dtype=bf16): params and BatchNorm statistics
        # stay f32, conv compute feeds the MXU at 2x f32 rate; the output
        # is cast back to the input dtype for the likelihoods.  dtype=None
        # is flax default promotion (full precision, incl. x64).
        in_dtype = x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = pad_channels(x, self.pad_cin)
        x = nn.Conv(self.init_features, (7, 7), strides=(2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        nf = self.init_features
        for nl in enc:
            x = DenseBlock(nl, self.growth_rate, self.drop_rate, self.bn_size,
                           self.bottleneck, pad_cin=self.pad_cin,
                           dtype=self.dtype)(x, train=train)
            nf += nl * self.growth_rate
            x = TransitionDown(nf // 2, self.drop_rate, pad_cin=self.pad_cin,
                               dtype=self.dtype)(x, train=train)
            nf //= 2
        for i, nl in enumerate(dec):
            x = DenseBlock(nl, self.growth_rate, self.drop_rate, self.bn_size,
                           self.bottleneck, pad_cin=self.pad_cin,
                           dtype=self.dtype)(x, train=train)
            nf += nl * self.growth_rate
            if i < len(dec) - 1:
                x = TransitionUp(nf // 2, self.drop_rate, self.upsample,
                                 pad_cin=self.pad_cin,
                                 dtype=self.dtype)(x, train=train)
                nf //= 2
        x = LastDecoding(self.out_channels, self.drop_rate, self.upsample,
                         pad_cin=self.pad_cin, dtype=self.dtype)(
            x, train=train)
        x = x.astype(in_dtype)
        if self.out_activation is not None:
            x = _ACTIVATIONS[self.out_activation](x)
        return x


def softplus4(x):
    return nn.softplus(4.0 * x) / 4.0  # torch Softplus(beta=4)


_ACTIVATIONS = {
    "tanh": nn.tanh,
    "relu": nn.relu,
    "lrelu": nn.leaky_relu,
    "sigmoid": nn.sigmoid,
    "softplus": softplus4,
}
