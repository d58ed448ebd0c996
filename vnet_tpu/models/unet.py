"""U-Net — rank-generic (2D/3D), config-compatible with the reference
(`/root/reference/networks.py:4-150`).

Topology parity: 3^r conv blocks (conv -> norm -> act -> dropout,
`networks.py:41-61`), 2^r max-pool downsampling (`networks.py:115-122`),
channel doubling per level, transpose-conv upsampling halving channels +
norm + act + dropout (`networks.py:132-139`), decoder blocks that concat
the skip then norm + convs 2n->n (`networks.py:63-99`), and a 1^r output
conv with post-logit norm (`networks.py:143-148`).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import Activation, Norm, UpConv, conv


class UNetConvBlock(nn.Module):
    """`networks.py:41-61`: n x [3^r conv -> norm -> act -> dropout]."""

    features: int
    num_convolutions: int
    norm: str = "batch"
    activation: str = "relu"
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    conv_impl: str = "direct"

    @nn.compact
    def __call__(self, x, train: bool = True):
        rank = x.ndim - 2
        for i in range(self.num_convolutions):
            x = conv(self.features, 3, rank, dtype=self.dtype,
                     param_dtype=self.param_dtype, name=f"conv_{i + 1}",
                     impl=self.conv_impl)(x)
            x = Norm(self.norm, self.dtype, self.param_dtype,
                     name=f"norm_{i + 1}")(x, train)
            x = Activation(self.activation, self.param_dtype,
                           name=f"act_{i + 1}")(x)
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        return x


class UNetDecoderBlock(nn.Module):
    """`networks.py:63-99`: concat skip -> norm -> convs 2n->n."""

    features: int
    num_convolutions: int
    norm: str = "batch"
    activation: str = "relu"
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    conv_impl: str = "direct"

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        rank = x.ndim - 2
        x = jnp.concatenate([x, skip], axis=-1)
        x = Norm(self.norm, self.dtype, self.param_dtype,
                 name="concat_norm")(x, train)
        for i in range(self.num_convolutions):
            x = conv(self.features, 3, rank, dtype=self.dtype,
                     param_dtype=self.param_dtype, name=f"conv_{i + 1}",
                     impl=self.conv_impl)(x)
            x = Norm(self.norm, self.dtype, self.param_dtype,
                     name=f"norm_{i + 1}")(x, train)
            x = Activation(self.activation, self.param_dtype,
                           name=f"act_{i + 1}")(x)
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        return x


def max_pool(x, window: int = 2):
    """2^r max pooling, VALID (`networks.py:115-122`)."""
    rank = x.ndim - 2
    return nn.max_pool(x, window_shape=(window,) * rank,
                       strides=(window,) * rank, padding="VALID")


class UNet(nn.Module):
    """U-Net (https://arxiv.org/abs/1505.04597), config-compatible with
    `/root/reference/networks.py:4-40`."""

    num_classes: int
    num_channels: int = 4
    num_levels: int = 4
    num_convolutions: int = 2
    bottom_convolutions: int = 2
    dropout_rate: float = 0.01
    activation: str = "relu"
    norm: str = "batch"
    output_norm: bool = True
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    conv_impl: str = "direct"

    @nn.compact
    def __call__(self, x, train: bool = True):
        rank = x.ndim - 2
        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)
        impl = "auto" if self.conv_impl in ("s2d", "auto") else "direct"

        skips = []
        for level in range(self.num_levels):
            x = UNetConvBlock(self.num_channels * (2 ** level),
                              self.num_convolutions, self.norm,
                              self.activation, self.dropout_rate, self.dtype,
                              self.param_dtype, impl,
                              name=f"encoder_level_{level + 1}")(x, train)
            skips.append(x)
            x = max_pool(x)

        x = UNetConvBlock(self.num_channels * (2 ** self.num_levels),
                          self.bottom_convolutions, self.norm,
                          self.activation, self.dropout_rate, self.dtype,
                          self.param_dtype, impl, name="bottom")(x, train)

        for level in reversed(range(self.num_levels)):
            x = UpConv(2, self.norm, self.activation, self.dtype,
                       self.param_dtype, impl,
                       name=f"up_{level + 1}")(x, train)
            x = UNetDecoderBlock(self.num_channels * (2 ** level),
                                 self.num_convolutions, self.norm,
                                 self.activation, self.dropout_rate,
                                 self.dtype, self.param_dtype, impl,
                                 name=f"decoder_level_{level + 1}")(
                                     x, skips[level], train)

        logits = conv(self.num_classes, 1, rank, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="output_conv")(x)
        if self.output_norm:
            logits = Norm(self.norm, self.dtype, self.param_dtype,
                          name="output_norm")(logits, train)
        return logits.astype(jnp.float32)
