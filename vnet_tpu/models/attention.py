"""Attention-gated segmentation head — the legacy attention variant.

Re-designs `/root/reference/attention.py`, `/root/reference/OutputModule.py`
and the gating wiring of `/root/reference/train.py:281-310`:

* ``ResidualAttentionBlock`` — 3^r conv + norm + act + dropout, 3^r conv +
  norm, a 1^r-conv shortcut, add, norm (+ act) (+ dropout)
  (`attention.py:83-103`; the reference's VALID conv with manual 1-voxel pad
  is exactly a SAME conv).
* ``AttentionModule`` — three stacked residual blocks then a 1^r conv +
  norm to ``num_classes`` (`attention.py:105-114`). Trained to regress a
  distance map of the label (`train.py:383-401`).
* ``OutputModule`` — identical head applied to attention-masked logits
  (`OutputModule.py:33-114`).
* ``AttentionGatedVNet`` — composes a backbone V-Net with the gate:
  ``masked = (1 + softmax(attention)) * logits`` (`train.py:301-302`),
  refined by the OutputModule. Returns ``(logits, attention_logits)`` so
  the trainer can apply the distance-map auxiliary loss.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Activation, Dropout, Norm, conv
from .vnet import VNet

attention_kernel_init = nn.initializers.truncated_normal(stddev=0.1)


def _att_conv(features: int, kernel: int, rank: int, dtype, param_dtype,
              name: str) -> nn.Conv:
    """Truncated-normal-initialized SAME conv (`attention.py:25-27`)."""
    return nn.Conv(features, (kernel,) * rank, padding="SAME",
                   kernel_init=attention_kernel_init,
                   bias_init=nn.initializers.zeros, dtype=dtype,
                   param_dtype=param_dtype, name=name)


class ResidualAttentionBlock(nn.Module):
    """`attention.py:83-103`."""

    features: int
    output_activation: bool = True
    norm: str = "batch"
    activation: str = "relu"
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    dropout_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = True):
        rank = x.ndim - 2
        shortcut = _att_conv(self.features, 1, rank, self.dtype,
                             self.param_dtype, "shortcut_conv")(x)

        y = _att_conv(self.features, 3, rank, self.dtype, self.param_dtype,
                      "conv_1")(x)
        y = Norm(self.norm, self.dtype, self.param_dtype, name="norm_1")(y, train)
        y = Activation(self.activation, self.param_dtype, name="act_1")(y)
        y = Dropout(rate=self.dropout_rate,
                    impl=self.dropout_impl)(y, deterministic=not train)

        y = _att_conv(self.features, 3, rank, self.dtype, self.param_dtype,
                      "conv_2")(y)
        y = Norm(self.norm, self.dtype, self.param_dtype, name="norm_2")(y, train)

        out = y + shortcut
        out = Norm(self.norm, self.dtype, self.param_dtype,
                   name="norm_out")(out, train)
        if self.output_activation:
            out = Activation(self.activation, self.param_dtype,
                             name="act_out")(out)
        out = Dropout(rate=self.dropout_rate,
                      impl=self.dropout_impl)(out, deterministic=not train)
        return out


class AttentionModule(nn.Module):
    """`attention.py:33-114`: 3 residual blocks + 1^r conv head."""

    num_classes: int
    num_channels: int = 64
    num_blocks: int = 3
    norm: str = "batch"
    activation: str = "relu"
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    dropout_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = True):
        rank = x.ndim - 2
        for i in range(self.num_blocks):
            x = ResidualAttentionBlock(
                self.num_channels, True, self.norm, self.activation,
                self.dropout_rate, self.dtype, self.param_dtype,
                dropout_impl=self.dropout_impl,
                name=f"resblock_{i + 1}")(x, train)
        logits = _att_conv(self.num_classes, 1, rank, self.dtype,
                           self.param_dtype, "output_conv")(x)
        logits = Norm(self.norm, self.dtype, self.param_dtype,
                      name="output_norm")(logits, train)
        return logits.astype(jnp.float32)


class OutputModule(nn.Module):
    """`OutputModule.py:33-114` — same head shape as AttentionModule."""

    num_classes: int
    num_channels: int = 64
    num_blocks: int = 3
    norm: str = "batch"
    activation: str = "relu"
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    dropout_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = True):
        rank = x.ndim - 2
        for i in range(self.num_blocks):
            x = ResidualAttentionBlock(
                self.num_channels, True, self.norm, self.activation,
                self.dropout_rate, self.dtype, self.param_dtype,
                dropout_impl=self.dropout_impl,
                name=f"resblock_{i + 1}")(x, train)
        logits = _att_conv(self.num_classes, 1, rank, self.dtype,
                           self.param_dtype, "output_conv")(x)
        logits = Norm(self.norm, self.dtype, self.param_dtype,
                      name="output_norm")(logits, train)
        return logits.astype(jnp.float32)


class AttentionGatedVNet(nn.Module):
    """V-Net backbone + attention gate + output refinement
    (`train.py:271-310`). ``__call__`` returns ``(logits, attention_logits)``.
    """

    num_classes: int
    num_channels: int = 16
    num_levels: int = 4
    num_convolutions: Sequence[int] = (1, 2, 3, 3)
    bottom_convolutions: int = 3
    attention_channels: int = 64
    dropout_rate: float = 0.01
    activation: str = "prelu"
    norm: str = "batch"
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    conv_impl: str = "direct"
    packed_target_lanes: int = 0  # see VNet.packed_target_lanes
    # forwarded to the backbone V-Net AND the attention/output heads.
    # The heads' full-resolution 64-channel dropout masks are the largest
    # temp buffers in the b8 64^3 training graph (256 MB padded pred
    # each — the allocations that OOM a 16 GB v5e with impl="xla");
    # bits8 shrinks exactly those.
    dropout_impl: str = "xla"
    # rematerialize the attention/output heads AND the backbone's conv
    # blocks in the backward pass: the heads' full-resolution 64-channel
    # activations dominate live memory (and the remote-compile
    # footprint); remat trades them for recompute
    remat: bool = False
    # faithful legacy backbone (`/root/reference/train.py:271-279` builds
    # the gate on the LEGACY VNet.py, whose blocks double-norm around the
    # residual add — see vnet.ConvBlock.legacy_double_norm)
    legacy_double_norm: bool = False
    dw_impl: str = "xla"  # see ops/conv_vjp.py, ops/pallas/dw_conv.py

    @nn.compact
    def __call__(self, x, train: bool = True):
        backbone = VNet(
            num_classes=self.num_classes,
            num_channels=self.num_channels,
            num_levels=self.num_levels,
            num_convolutions=tuple(self.num_convolutions),
            bottom_convolutions=self.bottom_convolutions,
            dropout_rate=self.dropout_rate,
            activation=self.activation,
            norm=self.norm,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            conv_impl=self.conv_impl,
            packed_target_lanes=self.packed_target_lanes,
            dropout_impl=self.dropout_impl,
            remat=self.remat,
            legacy_double_norm=self.legacy_double_norm,
            dw_impl=self.dw_impl,
            name="vnet")
        logits_vnet = backbone(x, train)

        att_cls = AttentionModule
        out_cls = OutputModule
        if self.remat:
            att_cls = nn.remat(AttentionModule, static_argnums=(2,))
            out_cls = nn.remat(OutputModule, static_argnums=(2,))

        attention_logits = att_cls(
            self.num_classes, self.attention_channels, norm=self.norm,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            param_dtype=self.param_dtype, dropout_impl=self.dropout_impl,
            name="attention")(logits_vnet, train)

        # train.py:301-302: gate amplifies the backbone logits
        gate = 1.0 + jax.nn.softmax(attention_logits, axis=-1)
        masked = gate * logits_vnet

        logits = out_cls(
            self.num_classes, self.attention_channels, norm=self.norm,
            dropout_rate=self.dropout_rate, dtype=self.dtype,
            param_dtype=self.param_dtype, dropout_impl=self.dropout_impl,
            name="output_module")(masked, train)
        return logits, attention_logits


def attention_distance_loss(attention_logits, distance_map,
                            kind: str = "l2", scale: float = 100.0):
    """Distance-map supervision for the attention gate
    (`train.py:383-401`): L2 (x ``scale``) or L1 between the attention
    softmax (foreground channels) and a normalized distance map."""
    att = jax.nn.softmax(attention_logits.astype(jnp.float32), axis=-1)
    target = distance_map.astype(jnp.float32)
    if target.ndim == att.ndim - 1:
        target = target[..., None]
        att = att[..., 1:]  # foreground channels vs a single distance map
        target = jnp.broadcast_to(target, att.shape)
    if kind == "l2":
        return scale * jnp.mean((att - target) ** 2)
    if kind == "abs":
        return jnp.mean(jnp.abs(att - target))
    raise ValueError(f"Unknown attention loss kind: {kind!r}")
