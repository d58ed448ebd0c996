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

from .layers import Activation, DownConv, Dropout, Norm, UpConv, conv


def adaptive_factors(spatial, ch, target_lanes):
    """Per-axis space-to-depth factors for a level: pack just enough axes
    (factor 2) that ``packed_channels >= target_lanes`` fills the MXU
    lanes. Axes are chosen among the EVEN-sized ones, leading first and
    deterministically — encoder and decoder levels see the same
    ``(spatial, ch)`` so their factors always match; an odd leading dim
    does not disable packing when enough trailing dims are even.

    Returns ``(ok, factors)`` — ``(False, None)`` when no packing applies.
    """
    rank = len(spatial)
    n = 0
    while n < rank and (2 ** n) * ch < target_lanes:
        n += 1
    even_axes = [i for i, s in enumerate(spatial) if s % 2 == 0]
    if n < 1 or len(even_axes) < n:
        return False, None
    chosen = set(even_axes[:n])
    return True, tuple(2 if i in chosen else 1 for i in range(rank))


class ConvBlock(nn.Module):
    """Residual conv block (`networks.py:307-322`): n x [5^r conv ->
    (+input at last conv) -> norm -> act -> dropout].

    ``legacy_double_norm`` reproduces the legacy topology
    (`/root/reference/VNet.py:26-39`): every conv is normalized once right
    after the conv (before the residual add) and AGAIN after it — two
    distinct norm layers per conv."""

    num_convolutions: int
    kernel_size: int = 5
    norm: str = "batch"
    activation: str = "prelu"
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    conv_impl: str = "direct"
    dropout_impl: str = "xla"  # see layers.Dropout
    # packed-mode plumbing (decided by the caller, see VNet._level_packed):
    # when packed_mode, the block runs in the s2d domain; pack_input=False
    # means x arrives already packed; unpack_output=False returns packed.
    # packed_factors: the level's per-axis packing (None = all axes x2).
    packed_mode: bool = False
    pack_input: bool = True
    unpack_output: bool = True
    packed_factors: Optional[tuple] = None
    legacy_double_norm: bool = False
    dw_impl: str = "xla"  # see ops/conv_vjp.py, ops/pallas/dw_conv.py

    @nn.compact
    def __call__(self, x, train: bool = True):
        rank = x.ndim - 2
        if self.packed_mode:
            # the whole block runs in the space-to-depth domain — at most
            # one pack/unpack pair at the edges instead of two per conv
            from ..ops.s2d import (depth_to_space, prod_factors,
                                   space_to_depth)
            factors = self.packed_factors
            groups = prod_factors(factors) if factors else 2 ** rank
            if self.pack_input:
                x = space_to_depth(x, factors=factors)
            ch = x.shape[-1] // groups
            block_input = x
            for i in range(self.num_convolutions):
                x = conv(ch, self.kernel_size, rank, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"conv_{i + 1}",
                         packed=True, packed_factors=factors,
                         dw_impl=self.dw_impl)(x)
                if self.legacy_double_norm:
                    x = Norm(self.norm, self.dtype, self.param_dtype, groups,
                             name=f"pre_norm_{i + 1}")(x, train)
                if i == self.num_convolutions - 1:
                    x = x + block_input
                x = Norm(self.norm, self.dtype, self.param_dtype, groups,
                         name=f"norm_{i + 1}")(x, train)
                x = Activation(self.activation, self.param_dtype, groups,
                               name=f"act_{i + 1}")(x)
                x = Dropout(self.dropout_rate, self.dropout_impl,
                            name=f"dropout_{i + 1}")(x, not train)
            return (depth_to_space(x, factors=factors)
                    if self.unpack_output else x)

        ch = x.shape[-1]
        impl = "auto" if self.conv_impl == "packed" else self.conv_impl
        block_input = x
        for i in range(self.num_convolutions):
            x = conv(ch, self.kernel_size, rank, dtype=self.dtype,
                     param_dtype=self.param_dtype, name=f"conv_{i + 1}",
                     impl=impl, dw_impl=self.dw_impl)(x)
            if self.legacy_double_norm:
                x = Norm(self.norm, self.dtype, self.param_dtype,
                         name=f"pre_norm_{i + 1}")(x, train)
            if i == self.num_convolutions - 1:
                x = x + block_input
            x = Norm(self.norm, self.dtype, self.param_dtype,
                     name=f"norm_{i + 1}")(x, train)
            x = Activation(self.activation, self.param_dtype,
                           name=f"act_{i + 1}")(x)
            x = Dropout(self.dropout_rate, self.dropout_impl,
                        name=f"dropout_{i + 1}")(x, not train)
        return x


class DecoderConvBlock(nn.Module):
    """Decoder block (`networks.py:324-365`): concat skip, 5^r convs
    2n->n, residual from the up-convolved input (see module docstring).

    ``legacy_double_norm`` reproduces `/root/reference/VNet.py:42-74`:
    double norm around the residual add on every conv EXCEPT the first
    conv of a multi-conv block, which is normalized once (no residual,
    VNet.py:57-61)."""

    num_convolutions: int
    kernel_size: int = 5
    norm: str = "batch"
    activation: str = "prelu"
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    conv_impl: str = "direct"
    dropout_impl: str = "xla"
    packed_mode: bool = False
    skip_packed: bool = False  # the stored encoder skip is already packed
    x_packed: bool = False     # the up-conv output arrives already packed
    unpack_output: bool = True
    packed_factors: Optional[tuple] = None
    legacy_double_norm: bool = False
    dw_impl: str = "xla"  # see ops/conv_vjp.py, ops/pallas/dw_conv.py

    def _pre_norm(self, i: int) -> bool:
        # legacy applies the extra pre-residual norm on every conv except
        # the first conv of a multi-conv block (VNet.py:57-61 vs :63-73)
        return self.legacy_double_norm and (
            i > 0 or self.num_convolutions == 1)

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        rank = x.ndim - 2
        if self.packed_mode:
            from ..ops.s2d import (depth_to_space, prod_factors,
                                   space_to_depth)
            factors = self.packed_factors
            groups = prod_factors(factors) if factors else 2 ** rank
            ch = (x.shape[-1] // groups) if self.x_packed else x.shape[-1]
            # splice the skip in the packed domain as a FLAT channel concat
            # (no per-offset re-interleave: that 6-D reshape pattern cost
            # ~21 ms/step in layout copies at 64^3/batch-32 on v5e); the
            # first conv's packed kernel rows are permuted to match
            # (pack_kernel input_splits), later convs see standard layout
            xp_x = x if self.x_packed else space_to_depth(x, factors=factors)
            skip_p = (skip if self.skip_packed
                      else space_to_depth(skip, factors=factors))
            xp = jnp.concatenate([xp_x, skip_p], axis=-1)
            residual = xp_x
            x = xp
            for i in range(self.num_convolutions):
                x = conv(ch, self.kernel_size, rank, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"conv_{i + 1}",
                         packed=True, packed_factors=factors,
                         packed_input_splits=(ch, ch) if i == 0 else None,
                         dw_impl=self.dw_impl)(x)
                if self._pre_norm(i):
                    x = Norm(self.norm, self.dtype, self.param_dtype, groups,
                             name=f"pre_norm_{i + 1}")(x, train)
                if i == self.num_convolutions - 1:
                    x = x + residual
                x = Norm(self.norm, self.dtype, self.param_dtype, groups,
                         name=f"norm_{i + 1}")(x, train)
                x = Activation(self.activation, self.param_dtype, groups,
                               name=f"act_{i + 1}")(x)
                x = Dropout(self.dropout_rate, self.dropout_impl,
                            name=f"dropout_{i + 1}")(x, not train)
            return (depth_to_space(x, factors=factors)
                    if self.unpack_output else x)

        ch = x.shape[-1]
        impl = "auto" if self.conv_impl == "packed" else self.conv_impl
        if self.skip_packed or self.x_packed:
            from ..ops.s2d import depth_to_space
            if self.skip_packed:
                skip = depth_to_space(skip, factors=self.packed_factors)
            if self.x_packed:
                x = depth_to_space(x, factors=self.packed_factors)
        residual = x  # up-convolved features, n channels
        x = jnp.concatenate([x, skip], axis=-1)
        for i in range(self.num_convolutions):
            out_ch = ch
            x = conv(out_ch, self.kernel_size, rank, dtype=self.dtype,
                     param_dtype=self.param_dtype, name=f"conv_{i + 1}",
                     impl=impl, dw_impl=self.dw_impl)(x)
            if self._pre_norm(i):
                x = Norm(self.norm, self.dtype, self.param_dtype,
                         name=f"pre_norm_{i + 1}")(x, train)
            if i == self.num_convolutions - 1:
                x = x + residual
            x = Norm(self.norm, self.dtype, self.param_dtype,
                     name=f"norm_{i + 1}")(x, train)
            x = Activation(self.activation, self.param_dtype,
                           name=f"act_{i + 1}")(x)
            x = Dropout(self.dropout_rate, self.dropout_impl,
                        name=f"dropout_{i + 1}")(x, not train)
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
    dropout_impl: str = "xla"  # "xla" | "pallas" (layers.Dropout)
    # >0 enables per-level ADAPTIVE packing: each level packs only as many
    # axes (factor 2, leading axes first) as needed to reach this many
    # packed channels — e.g. 128 (the MXU lane width) gives 16ch -> pack
    # all 3 axes (tax 1.73x), 32ch -> 2 axes (1.44x), 64ch -> 1 axis
    # (1.20x), 128ch+ -> direct 5^r conv (1.0x). Measured 1.14-1.45x
    # faster per conv at L2-L4 (BENCHMARKS.md exp9). 0 = legacy full
    # packing at every level under packed_cap.
    packed_target_lanes: int = 0
    # Faithful legacy topology (`/root/reference/VNet.py`): double norm
    # around each residual add — see ConvBlock/DecoderConvBlock. Exposed
    # as network name "VNetLegacy" (models/build_network) and the legacy
    # CLI's --legacy_topology flag.
    legacy_double_norm: bool = False
    # stride-1 block convs: custom weight-gradient formulation avoiding
    # conv_backprop_filter layout copies (ops/conv_vjp.py); identical math
    dw_impl: str = "xla"
    # rematerialize conv blocks in the backward pass: activations inside a
    # block are recomputed instead of saved, trading FLOPs for memory
    # (large patches / deep configs) and shrinking the autodiff graph.
    # Identical math and parameter pytree (nn.remat is a lifted transform).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.num_levels == len(self.num_convolutions), (
            "num_convolutions must have num_levels entries")
        conv_block_cls = (nn.remat(ConvBlock, static_argnums=(2,))
                          if self.remat else ConvBlock)
        dec_block_cls = (nn.remat(DecoderConvBlock, static_argnums=(3,))
                         if self.remat else DecoderConvBlock)
        rank = x.ndim - 2
        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)
        # block_impl may be "packed" (whole conv blocks in the s2d domain);
        # the stride-2 down/up convs and 1^r output conv use the pointwise
        # "auto" selection in every non-direct mode.
        block_impl = "auto" if self.conv_impl == "s2d" else self.conv_impl
        impl = "auto" if block_impl in ("packed", "auto") else "direct"
        # adaptive mode: a level that is NOT packed has enough channels to
        # fill the MXU lanes directly — its 5^r convs must stay direct,
        # not fall back to the per-site "auto" (which would re-pack x8)
        fallback_impl = ("direct" if self.packed_target_lanes > 0
                         else block_impl)

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
        # in the s2d domain: skips stay packed, down-convs consume packed).
        # Returns (packed?, factors) — factors None means all axes x2;
        # adaptive mode (packed_target_lanes > 0) packs only enough leading
        # axes to reach the target lane count.
        def level_packed(spatial, ch, decoder=False):
            if (block_impl != "packed"
                    or self.norm not in ("batch", "batch_stats")):
                return False, None
            if self.packed_target_lanes > 0:
                return adaptive_factors(spatial, ch,
                                        self.packed_target_lanes)
            groups = 2 ** rank
            cap = 2 * self.packed_cap if decoder else self.packed_cap
            ok = (all(s % 2 == 0 for s in spatial)
                  and groups * (2 * ch if decoder else ch) <= cap)
            return ok, None

        # encoder (networks.py:270-280). Each packed block packs/unpacks at
        # its own edges; down-convs consume packed inputs directly.
        # NB: DownConv(packed_output=True) — emitting the next level's
        # packed layout directly so blocks could skip their own pack —
        # measured SLOWER (228 vs 218 ms/step, 4x compile time,
        # BENCHMARKS.md): the wide-tensor s2d + grouped matmul defeats
        # XLA's down-conv/unpack fusion. Levels re-pack narrow tensors.
        skips = []          # (tensor, is_packed, factors)
        for level in range(self.num_levels):
            spatial, ch = x.shape[1:-1], x.shape[-1]
            enc_p, enc_f = level_packed(spatial, ch)
            x = conv_block_cls(self.num_convolutions[level], 5, self.norm,
                          self.activation, self.dropout_rate, self.dtype,
                          self.param_dtype,
                          block_impl if enc_p else fallback_impl,
                          dropout_impl=self.dropout_impl,
                          packed_mode=enc_p,
                          unpack_output=not enc_p, packed_factors=enc_f,
                          legacy_double_norm=self.legacy_double_norm,
                          dw_impl=self.dw_impl,
                          name=f"encoder_level_{level + 1}")(x, train)
            skips.append((x, enc_p, enc_f))
            x = DownConv(2, self.norm, self.activation, self.dtype,
                         self.param_dtype, impl, packed_input=enc_p,
                         packed_factors=enc_f,
                         name=f"down_{level + 1}")(x, train)

        # bottom (networks.py:282-283)
        bot_p, bot_f = level_packed(x.shape[1:-1], x.shape[-1])
        x = conv_block_cls(self.bottom_convolutions, 5, self.norm,
                      self.activation, self.dropout_rate, self.dtype,
                      self.param_dtype,
                      block_impl if bot_p else fallback_impl,
                      dropout_impl=self.dropout_impl,
                      packed_mode=bot_p, packed_factors=bot_f,
                      legacy_double_norm=self.legacy_double_norm,
                      dw_impl=self.dw_impl,
                      name="bottom")(x, train)

        # decoder (networks.py:285-296)
        out_packed = False
        out_factors = None
        for level in reversed(range(self.num_levels)):
            # decide packedness on the up-conv OUTPUT geometry (spatial x2,
            # channels /2) so the transpose conv can emit packed directly
            up_spatial = tuple(2 * s for s in x.shape[1:-1])
            up_ch = x.shape[-1] // 2
            dec_p, dec_f = level_packed(up_spatial, up_ch, decoder=True)
            skip, skip_p, skip_f = skips[level]
            if skip_p and dec_p:
                # same channels + spatial => identical per-level factors;
                # the flat packed concat relies on it
                assert skip_f == dec_f, (skip_f, dec_f)
            x = UpConv(2, self.norm, self.activation, self.dtype,
                       self.param_dtype, impl, packed_output=dec_p,
                       packed_factors=dec_f,
                       name=f"up_{level + 1}")(x, train)
            keep_packed = dec_p and level == 0  # feed the output conv packed
            x = dec_block_cls(self.num_convolutions[level], 5, self.norm,
                                 self.activation, self.dropout_rate,
                                 self.dtype, self.param_dtype,
                                 block_impl if dec_p else fallback_impl,
                                 dropout_impl=self.dropout_impl,
                                 packed_mode=dec_p, skip_packed=skip_p,
                                 x_packed=dec_p,
                                 unpack_output=not keep_packed,
                                 packed_factors=dec_f if dec_p else skip_f,
                                 legacy_double_norm=self.legacy_double_norm,
                                 dw_impl=self.dw_impl,
                                 name=f"decoder_level_{level + 1}")(
                                     x, skip, train)
            if level == 0:
                out_packed = keep_packed
                out_factors = dec_f

        # output layer (networks.py:298-303): 1^r conv (+ post-logit norm,
        # reproduced behind a flag since it is unusual but affects parity);
        # the pointwise conv and norm run packed when the decoder ends packed
        from ..ops.s2d import prod_factors
        out_groups = (prod_factors(out_factors) if out_factors
                      else 2 ** rank) if out_packed else 1
        logits = conv(self.num_classes, 1, rank, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="output_conv",
                      packed=out_packed, packed_factors=out_factors)(x)
        if self.output_norm:
            logits = Norm(self.norm, self.dtype, self.param_dtype,
                          out_groups, name="output_norm")(logits, train)
        if out_packed:
            from ..ops.s2d import depth_to_space
            logits = depth_to_space(logits, factors=out_factors)
        return logits.astype(jnp.float32)
