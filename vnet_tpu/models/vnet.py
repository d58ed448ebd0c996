"""V-Net — rank-generic (2D/3D) encoder-decoder with residual conv blocks.

TPU-native re-design of the reference's modern V-Net
(`/root/reference/networks.py:209-365`): same topology —

* input layer: 1-channel inputs are tiled to ``num_channels`` + norm
  (`networks.py:253-259`); multichannel inputs get a 5^r conv + norm + act
  (`networks.py:260-266`).
* encoder level l: ``num_convolutions[l]`` x [5^r SAME conv, residual add of
  the block input at the last conv, norm, act, dropout]
  (`networks.py:307-322`), then a stride-2 down-conv doubling channels
  (`networks.py:274-280`).
* bottom: ``bottom_convolutions`` more residual convs (`networks.py:282-283`).
* decoder level l: stride-2 transpose conv halving channels + norm + act,
  concat with the skip feature, then 5^r convs reducing 2n->n channels with
  a residual connection (`networks.py:285-296, 324-365`).
* output: 1^r conv to ``num_classes`` + norm **after** the logits
  (`networks.py:298-303`).

Deliberate deviation: the reference's decoder residual adds ``norm(x)`` to
``x`` itself (`networks.py:335-336, 358-360`) — a self-add with no skip
path, almost certainly an accident. Here the decoder residual adds the
up-convolved features (the block input before concat), which is the actual
V-Net paper design and keeps gradient flow through the decoder.

All convs are channels-last and feed the MXU; set ``dtype=jnp.bfloat16``
for TPU mixed precision (params stay float32).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import Activation, DownConv, Norm, UpConv, conv


class ConvBlock(nn.Module):
    """Residual conv block (`networks.py:307-322`): n x [5^r conv ->
    (+input at last conv) -> norm -> act -> dropout]."""

    num_convolutions: int
    kernel_size: int = 5
    norm: str = "batch"
    activation: str = "prelu"
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    conv_impl: str = "direct"
    # packed-mode plumbing (decided by the caller, see VNet._level_packed):
    # when packed_mode, the block runs in the s2d domain; pack_input=False
    # means x arrives already packed; unpack_output=False returns packed.
    packed_mode: bool = False
    pack_input: bool = True
    unpack_output: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        rank = x.ndim - 2
        if self.packed_mode:
            # the whole block runs in the space-to-depth domain — at most
            # one pack/unpack pair at the edges instead of two per conv
            from ..ops.s2d import depth_to_space, space_to_depth
            groups = 2 ** rank
            if self.pack_input:
                x = space_to_depth(x)
            ch = x.shape[-1] // groups
            block_input = x
            for i in range(self.num_convolutions):
                x = conv(ch, self.kernel_size, rank, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"conv_{i + 1}",
                         packed=True)(x)
                if i == self.num_convolutions - 1:
                    x = x + block_input
                x = Norm(self.norm, self.dtype, self.param_dtype, groups,
                         name=f"norm_{i + 1}")(x, train)
                x = Activation(self.activation, self.param_dtype, groups,
                               name=f"act_{i + 1}")(x)
                x = nn.Dropout(rate=self.dropout_rate,
                               deterministic=not train)(x)
            return depth_to_space(x) if self.unpack_output else x

        ch = x.shape[-1]
        impl = "auto" if self.conv_impl == "packed" else self.conv_impl
        block_input = x
        for i in range(self.num_convolutions):
            x = conv(ch, self.kernel_size, rank, dtype=self.dtype,
                     param_dtype=self.param_dtype, name=f"conv_{i + 1}",
                     impl=impl)(x)
            if i == self.num_convolutions - 1:
                x = x + block_input
            x = Norm(self.norm, self.dtype, self.param_dtype,
                     name=f"norm_{i + 1}")(x, train)
            x = Activation(self.activation, self.param_dtype,
                           name=f"act_{i + 1}")(x)
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        return x


class DecoderConvBlock(nn.Module):
    """Decoder block (`networks.py:324-365`): concat skip, 5^r convs
    2n->n, residual from the up-convolved input (see module docstring)."""

    num_convolutions: int
    kernel_size: int = 5
    norm: str = "batch"
    activation: str = "prelu"
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    conv_impl: str = "direct"
    packed_mode: bool = False
    skip_packed: bool = False  # the stored encoder skip is already packed
    x_packed: bool = False     # the up-conv output arrives already packed
    unpack_output: bool = True

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        rank = x.ndim - 2
        if self.packed_mode:
            from ..ops.s2d import depth_to_space, space_to_depth
            groups = 2 ** rank
            ch = (x.shape[-1] // groups) if self.x_packed else x.shape[-1]
            # splice the skip in the packed domain as a FLAT channel concat
            # (no per-offset re-interleave: that 6-D reshape pattern cost
            # ~21 ms/step in layout copies at 64^3/batch-32 on v5e); the
            # first conv's packed kernel rows are permuted to match
            # (pack_kernel input_splits), later convs see standard layout
            xp_x = x if self.x_packed else space_to_depth(x)
            skip_p = skip if self.skip_packed else space_to_depth(skip)
            xp = jnp.concatenate([xp_x, skip_p], axis=-1)
            residual = xp_x
            x = xp
            for i in range(self.num_convolutions):
                x = conv(ch, self.kernel_size, rank, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"conv_{i + 1}",
                         packed=True,
                         packed_input_splits=(ch, ch) if i == 0 else None)(x)
                if i == self.num_convolutions - 1:
                    x = x + residual
                x = Norm(self.norm, self.dtype, self.param_dtype, groups,
                         name=f"norm_{i + 1}")(x, train)
                x = Activation(self.activation, self.param_dtype, groups,
                               name=f"act_{i + 1}")(x)
                x = nn.Dropout(rate=self.dropout_rate,
                               deterministic=not train)(x)
            return depth_to_space(x) if self.unpack_output else x

        ch = x.shape[-1]
        impl = "auto" if self.conv_impl == "packed" else self.conv_impl
        if self.skip_packed or self.x_packed:
            from ..ops.s2d import depth_to_space
            if self.skip_packed:
                skip = depth_to_space(skip)
            if self.x_packed:
                x = depth_to_space(x)
        residual = x  # up-convolved features, n channels
        x = jnp.concatenate([x, skip], axis=-1)
        for i in range(self.num_convolutions):
            out_ch = ch
            x = conv(out_ch, self.kernel_size, rank, dtype=self.dtype,
                     param_dtype=self.param_dtype, name=f"conv_{i + 1}",
                     impl=impl)(x)
            if i == self.num_convolutions - 1:
                x = x + residual
            x = Norm(self.norm, self.dtype, self.param_dtype,
                     name=f"norm_{i + 1}")(x, train)
            x = Activation(self.activation, self.param_dtype,
                           name=f"act_{i + 1}")(x)
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)
        return x


class VNet(nn.Module):
    """V-Net (https://arxiv.org/abs/1606.04797), config-compatible with
    `/root/reference/networks.py:209-246`."""

    num_classes: int
    num_channels: int = 16
    num_levels: int = 4
    num_convolutions: Sequence[int] = (1, 2, 3, 3)
    bottom_convolutions: int = 3
    dropout_rate: float = 0.01
    activation: str = "prelu"
    norm: str = "batch"
    output_norm: bool = True
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    # "direct" | "s2d" | "auto": see models/layers.py SpatialConv; "s2d"
    # behaves like "auto" at per-site granularity so odd-shaped tensors
    # fall back to the direct conv.
    conv_impl: str = "direct"
    # packed-mode eligibility cap on 2^rank * channels (decoder: 2x): deep
    # levels with >=64 channels already feed the MXU reasonably direct,
    # and packing costs 1.73x FLOPs — lowering the cap trades them
    packed_cap: int = 1024

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.num_levels == len(self.num_convolutions), (
            "num_convolutions must have num_levels entries")
        rank = x.ndim - 2
        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)
        # block_impl may be "packed" (whole conv blocks in the s2d domain);
        # the stride-2 down/up convs and 1^r output conv use the pointwise
        # "auto" selection in every non-direct mode.
        block_impl = "auto" if self.conv_impl == "s2d" else self.conv_impl
        impl = "auto" if block_impl in ("packed", "auto") else "direct"

        # input layer (networks.py:253-266)
        in_ch = x.shape[-1]
        if in_ch == 1:
            if self.norm in ("batch", "batch_stats"):
                # fused tile+BN: identical-channel statistics allow
                # normalizing the single channel and broadcasting through
                # the per-channel affine (see layers.TiledInputBatchNorm)
                from .layers import TiledInputBatchNorm
                x = TiledInputBatchNorm(self.num_channels, self.norm,
                                        self.dtype, self.param_dtype,
                                        name="input_norm")(x, train)
            else:
                x = jnp.tile(x, (1,) * (rank + 1) + (self.num_channels,))
                x = Norm(self.norm, self.dtype, self.param_dtype,
                         name="input_norm")(x, train)
        else:
            x = conv(self.num_channels, 5, rank, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="input_conv",
                     impl=impl)(x)
            x = Norm(self.norm, self.dtype, self.param_dtype,
                     name="input_norm")(x, train)
            x = Activation(self.activation, self.param_dtype,
                           name="input_act")(x)

        # per-level packed-mode eligibility (conv blocks + their plumbing run
        # in the s2d domain: skips stay packed, down-convs consume packed)
        def level_packed(spatial, ch, decoder=False):
            groups = 2 ** rank
            cap = 2 * self.packed_cap if decoder else self.packed_cap
            return (block_impl == "packed"
                    and self.norm in ("batch", "batch_stats")
                    and all(s % 2 == 0 for s in spatial)
                    and groups * (2 * ch if decoder else ch) <= cap)

        # encoder (networks.py:270-280). x_p tracks whether x is currently
        # in the packed layout of its own grid: down-convs emit the next
        # level's packed layout directly when both sides are packed, so
        # level boundaries cost zero s2d transposes.
        skips = []          # (tensor, is_packed)
        x_p = False
        for level in range(self.num_levels):
            if x_p:
                spatial = tuple(2 * s for s in x.shape[1:-1])
                ch = x.shape[-1] // (2 ** rank)
            else:
                spatial, ch = x.shape[1:-1], x.shape[-1]
            enc_p = level_packed(spatial, ch)
            if x_p and not enc_p:
                from ..ops.s2d import depth_to_space
                x = depth_to_space(x)
                x_p = False
            x = ConvBlock(self.num_convolutions[level], 5, self.norm,
                          self.activation, self.dropout_rate, self.dtype,
                          self.param_dtype, block_impl,
                          packed_mode=enc_p, pack_input=not x_p,
                          unpack_output=not enc_p,
                          name=f"encoder_level_{level + 1}")(x, train)
            skips.append((x, enc_p))
            # NB: DownConv(packed_output=True) — emitting the next level's
            # packed layout directly — measured SLOWER (228 vs 218 ms/step,
            # 4x compile time, BENCHMARKS.md): the wide-tensor s2d +
            # grouped matmul defeats XLA's down-conv/unpack fusion. Levels
            # re-pack narrow tensors instead.
            x = DownConv(2, self.norm, self.activation, self.dtype,
                         self.param_dtype, impl, packed_input=enc_p,
                         name=f"down_{level + 1}")(x, train)
            x_p = False

        # bottom (networks.py:282-283)
        if x_p:
            bot_spatial = tuple(2 * s for s in x.shape[1:-1])
            bot_ch = x.shape[-1] // (2 ** rank)
        else:
            bot_spatial, bot_ch = x.shape[1:-1], x.shape[-1]
        bot_p = level_packed(bot_spatial, bot_ch)
        if x_p and not bot_p:
            from ..ops.s2d import depth_to_space
            x = depth_to_space(x)
            x_p = False
        x = ConvBlock(self.bottom_convolutions, 5, self.norm,
                      self.activation, self.dropout_rate, self.dtype,
                      self.param_dtype, block_impl, packed_mode=bot_p,
                      pack_input=not x_p, name="bottom")(x, train)

        # decoder (networks.py:285-296)
        out_packed = False
        for level in reversed(range(self.num_levels)):
            # decide packedness on the up-conv OUTPUT geometry (spatial x2,
            # channels /2) so the transpose conv can emit packed directly
            up_spatial = tuple(2 * s for s in x.shape[1:-1])
            up_ch = x.shape[-1] // 2
            dec_p = level_packed(up_spatial, up_ch, decoder=True)
            x = UpConv(2, self.norm, self.activation, self.dtype,
                       self.param_dtype, impl, packed_output=dec_p,
                       name=f"up_{level + 1}")(x, train)
            skip, skip_p = skips[level]
            keep_packed = dec_p and level == 0  # feed the output conv packed
            x = DecoderConvBlock(self.num_convolutions[level], 5, self.norm,
                                 self.activation, self.dropout_rate,
                                 self.dtype, self.param_dtype, block_impl,
                                 packed_mode=dec_p, skip_packed=skip_p,
                                 x_packed=dec_p,
                                 unpack_output=not keep_packed,
                                 name=f"decoder_level_{level + 1}")(
                                     x, skip, train)
            if level == 0:
                out_packed = keep_packed

        # output layer (networks.py:298-303): 1^r conv (+ post-logit norm,
        # reproduced behind a flag since it is unusual but affects parity);
        # the pointwise conv and norm run packed when the decoder ends packed
        logits = conv(self.num_classes, 1, rank, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="output_conv",
                      packed=out_packed)(x)
        if self.output_norm:
            logits = Norm(self.norm, self.dtype, self.param_dtype,
                          (2 ** rank) if out_packed else 1,
                          name="output_norm")(logits, train)
        if out_packed:
            from ..ops.s2d import depth_to_space
            logits = depth_to_space(logits)
        return logits.astype(jnp.float32)
