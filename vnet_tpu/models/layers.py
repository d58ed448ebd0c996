"""Rank-generic layer primitives for the model zoo.

TPU-native re-design of the reference's layer library
(`/root/reference/layers2.py`): convolutions run through
``lax.conv_general_dilated`` via flax in channels-last layout
(``N *spatial C``) so XLA tiles them onto the MXU; compute dtype is
configurable (bfloat16 on TPU) with float32 parameters and accumulation.

Parity notes:
* Xavier-uniform conv init (`layers2.py:4-30`): the reference's
  ``lim = sqrt(6/(patch_volume*(in+out)))`` is exactly
  ``glorot_uniform`` with fan = patch_volume * channels.
* ``prelu`` (`layers2.py:97-99`): per-channel alpha, init 0.1.
* Down-convolution (`layers2.py:78-84`): stride-2 conv, channels x2.
* Up-convolution (`layers2.py:88-94`): stride-2 transpose conv, channels /2.
* BatchNorm: momentum 0.99, epsilon 0.001 (`networks.py:58` etc.). The
  reference always feeds ``train_phase=True`` — even during inference
  (`model.py:917`) — i.e. batch statistics at eval. ``norm="batch_stats"``
  reproduces that (the config default — eval through ``models.eval_apply``);
  ``norm="batch"`` is the flax-style EMA behavior (measured: EMA eval
  diverges catastrophically on this deep BN net, BENCHMARKS.md "Quality");
  ``norm="group"`` / ``"instance"`` are the TPU-friendly batch-size-robust
  options.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

conv_kernel_init = nn.initializers.glorot_uniform()


def _partition():
    """Active spatial partition (axis_name, spatial_axis) or None — set by
    `vnet_tpu/parallel/spatial.py` when the layer executes on a local shard
    inside ``shard_map`` (whole-volume halo-sharded forward)."""
    from ..parallel.spatial import current_partition
    return current_partition()

NORM_KINDS = ("batch", "batch_stats", "group", "instance", "none")
ACTIVATIONS = ("relu", "prelu", "lrelu")


class PReLU(nn.Module):
    """Per-channel parametric ReLU, alpha init 0.1 (`layers2.py:97-99`).

    ``packed_groups > 1`` means the input is in the space-to-depth packed
    domain with ``packed_groups * features`` channels (offset-major); the
    per-channel alpha is tiled across offsets, keeping semantics exact.
    """

    negative_slope_init: float = 0.1
    param_dtype: Dtype = jnp.float32
    packed_groups: int = 1

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1] // self.packed_groups
        alpha = self.param(
            "alpha",
            nn.initializers.constant(self.negative_slope_init),
            (features,),
            self.param_dtype,
        ).astype(x.dtype)
        if self.packed_groups > 1:
            alpha = jnp.tile(alpha, self.packed_groups)
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


class Activation(nn.Module):
    """String-dispatched activation (`networks.py:239-244`)."""

    kind: str = "relu"
    param_dtype: Dtype = jnp.float32
    packed_groups: int = 1

    @nn.compact
    def __call__(self, x):
        if self.kind == "relu":
            return nn.relu(x)
        if self.kind == "prelu":
            return PReLU(param_dtype=self.param_dtype,
                         packed_groups=self.packed_groups, name="prelu")(x)
        if self.kind == "lrelu":
            return nn.leaky_relu(x)
        raise ValueError(f"Unknown activation: {self.kind!r}")


class PackedBatchNorm(nn.Module):
    """BatchNorm over space-to-depth packed activations.

    The input has ``groups * features`` channels (offset-major packed
    layout); statistics are reduced over batch, packed-spatial AND offset
    groups, which equals the unpacked per-channel statistics exactly.
    Parameter/variable names and shapes match ``nn.BatchNorm`` (scale,
    bias, mean, var of shape ``(features,)``), so checkpoints interchange
    with the unpacked path.
    """

    features: int
    groups: int
    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))

        # NB: stats stay as plain jnp reductions — XLA fuses them into the
        # preceding convolution's output fusion (conv + epilogue + both
        # moments in ONE kOutput fusion at MXU roofline, see BENCHMARKS.md
        # "BN statistics"). Routing them through the Pallas kernels in
        # ops/pallas/batchnorm.py breaks that fusion and measured 14%
        # SLOWER end-to-end; the custom-VJP path is kept for workloads
        # where the producer is not a convolution.
        part = _partition()
        xg = x.reshape(x.shape[:-1] + (self.groups, c))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(xg.ndim - 1))
            xf = xg.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            msq = jnp.mean(jnp.square(xf), axis=axes)
            if part is not None:
                # equal-sized spatial shards: pmean of the moments equals
                # the unsharded statistics exactly
                mean = jax.lax.pmean(mean, part[0])
                msq = jax.lax.pmean(msq, part[0])
            var = msq - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)

        compute = x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        y = (xg.astype(jnp.float32) - mean) * inv + bias.astype(jnp.float32)
        return y.astype(compute).reshape(x.shape)


class _TiledBNCore(nn.Module):
    """Variable container + math for :class:`TiledInputBatchNorm`; named
    "bn" by its parent so variable paths match ``Norm``'s ``nn.BatchNorm``.
    """

    features: int
    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))

        xf = x1.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mu = jnp.mean(xf)
            msq = jnp.mean(jnp.square(xf))
            part = _partition()
            if part is not None:
                mu = jax.lax.pmean(mu, part[0])
                msq = jax.lax.pmean(msq, part[0])
            var_s = msq - jnp.square(mu)
            mean = jnp.full((c,), mu.astype(jnp.float32))
            var = jnp.full((c,), var_s.astype(jnp.float32))
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)

        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        shift = bias.astype(jnp.float32) - mean * inv
        # broadcast the single channel through the per-channel affine IN THE
        # COMPUTE DTYPE: the C-wide tensor materializes exactly once, in
        # bf16 — an f32 broadcast here costs ~0.5 GB/step of extra HBM
        # traffic at 64^3 and drags the following conv's backward into f32
        # (measured 15 ms/step on v5e, BENCHMARKS.md)
        compute = x1.dtype
        return x1 * inv.astype(compute) + shift.astype(compute)


class TiledInputBatchNorm(nn.Module):
    """Fused replacement for the V-Net input layer's ``tile(1->C) + BN``
    (`networks.py:253-259`): every tiled channel holds identical data, so
    per-channel batch statistics equal the 1-channel statistics — normalize
    once and broadcast through the per-channel scale/bias. Variable
    names/shapes match ``Norm(kind)(tile(x))`` exactly (checkpoints
    interchange; equality tested in tests/test_models.py).
    """

    features: int
    kind: str = "batch"  # "batch" | "batch_stats"
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert x.shape[-1] == 1
        use_ra = self.kind == "batch" and not train
        return _TiledBNCore(self.features, use_running_average=use_ra,
                            param_dtype=self.param_dtype, name="bn")(x)


class Norm(nn.Module):
    """Normalization selected by ``kind`` — see module docstring.

    ``packed_groups > 1`` signals packed-domain input (batch kinds only).
    """

    kind: str = "batch"
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    packed_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind == "none":
            return x
        if self.packed_groups > 1:
            if self.kind not in ("batch", "batch_stats"):
                raise ValueError(
                    f"packed norm only supports batch kinds, got {self.kind}")
            return PackedBatchNorm(
                features=x.shape[-1] // self.packed_groups,
                groups=self.packed_groups,
                use_running_average=(self.kind == "batch" and not train),
                dtype=self.dtype, param_dtype=self.param_dtype, name="bn")(x)
        part = _partition()
        part_axis = part[0] if part is not None else None
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, param_dtype=self.param_dtype,
                axis_name=part_axis if train else None, name="bn")(x)
        if self.kind == "batch_stats":
            # reference quirk: batch statistics in every phase (model.py:917)
            return nn.BatchNorm(
                use_running_average=False, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, param_dtype=self.param_dtype,
                axis_name=part_axis, name="bn")(x)
        if self.kind == "group":
            groups = min(8, x.shape[-1])
            while x.shape[-1] % groups:
                groups -= 1
            return nn.GroupNorm(num_groups=groups, epsilon=1e-3,
                                dtype=self.dtype, param_dtype=self.param_dtype,
                                axis_name=part_axis, name="gn")(x)
        if self.kind == "instance":
            # normalize over spatial dims only
            reduction = tuple(range(1, x.ndim - 1))
            xf32 = x.astype(jnp.float32)
            mean = jnp.mean(xf32, axis=reduction, keepdims=True)
            msq = jnp.mean(jnp.square(xf32), axis=reduction, keepdims=True)
            if part_axis is not None:
                mean = jax.lax.pmean(mean, part_axis)
                msq = jax.lax.pmean(msq, part_axis)
            var = msq - jnp.square(mean)
            y = ((xf32 - mean) * jax.lax.rsqrt(var + 1e-3)).astype(x.dtype)
            scale = self.param("scale", nn.initializers.ones,
                               (x.shape[-1],), self.param_dtype).astype(x.dtype)
            bias = self.param("bias", nn.initializers.zeros,
                              (x.shape[-1],), self.param_dtype).astype(x.dtype)
            return y * scale + bias
        raise ValueError(f"Unknown norm kind: {self.kind!r}")


class SpatialConv(nn.Module):
    """SAME conv with a selectable TPU implementation.

    ``impl``:
      * ``"direct"`` — ``lax.conv_general_dilated`` (XLA's native conv).
      * ``"s2d"`` — space-to-depth packed conv (`vnet_tpu/ops/s2d.py`),
        mathematically identical, ~8x better MXU utilization for the
        V-Net's small-channel 5^3 convs.
      * ``"auto"`` — s2d whenever legal (stride 1, odd kernel >= 3, even
        spatial dims, packed channels within MXU-friendly range).

    Parameter names/shapes match ``nn.Conv`` (``kernel``/``bias``), so
    checkpoints are interchangeable across implementations.
    """

    features: int
    kernel_size: tuple
    strides: Optional[tuple] = None
    impl: str = "direct"
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    # packed=True: input AND output live in the space-to-depth domain
    # (offset-major channels); the kernel parameter keeps its original
    # (k..., Cin, Cout) shape — packing happens at apply time.
    packed: bool = False
    # packed_down=True: stride-2 2^r conv whose input is ALREADY packed —
    # one matmul, output unpacked on the half-resolution grid.
    packed_down: bool = False
    # with packed_down: emit the NEXT level's packed layout directly
    # (s2d on the wide packed tensor + grouped matmul, ops/s2d.py)
    packed_down_keep: bool = False
    # packed input is a flat channel concat of separately-packed tensors
    # (decoder skip splice); see ops/s2d.py::pack_kernel
    packed_input_splits: Optional[tuple] = None
    # per-axis packing of the packed domain (None = all axes factor 2);
    # see ops/s2d.py module docstring on the per-level FLOP-tax tradeoff
    packed_factors: Optional[tuple] = None
    # stride-1 convs' weight-gradient formulation: "xla" | "custom"
    # (explicit dot dW, ops/conv_vjp.py) | "pallas" (VMEM-transposing
    # kernel, ops/pallas/dw_conv.py); identical math
    dw_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        rank = x.ndim - 2
        k = tuple(self.kernel_size)
        from ..ops.s2d import prod_factors
        groups = (prod_factors(self.packed_factors)
                  if self.packed_factors is not None else 2 ** rank)
        in_features = (x.shape[-1] // groups
                       if (self.packed or self.packed_down)
                       else x.shape[-1])
        kernel = self.param("kernel", conv_kernel_init,
                            k + (in_features, self.features),
                            self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype) if self.use_bias else None)

        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)
        kernel_c = kernel.astype(compute_dtype)

        if self.packed_down:
            assert k == (2,) * rank and tuple(self.strides) == (2,) * rank
            from ..ops.s2d import packed_down_conv
            y = packed_down_conv(x, kernel_c,
                                 keep_packed=self.packed_down_keep,
                                 factors=self.packed_factors)
            if bias is not None:
                b = bias.astype(compute_dtype)
                y = y + (jnp.tile(b, 2 ** rank)
                         if self.packed_down_keep else b)
            return y

        if self.packed:
            if k == (1,) * rank:
                # pointwise conv in the packed domain: shared weights per
                # offset group — a grouped einsum, no repacking needed
                xg = x.reshape(x.shape[:-1] + (groups, in_features))
                y = jnp.einsum("...gc,co->...go", xg,
                               kernel_c.reshape(in_features, self.features))
                y = y.astype(compute_dtype).reshape(
                    x.shape[:-1] + (groups * self.features,))
            else:
                from ..ops.s2d import packed_conv
                y = packed_conv(x, kernel_c, halo=_partition(),
                                input_splits=self.packed_input_splits,
                                factors=self.packed_factors,
                                dw_impl=self.dw_impl)
            if bias is not None:
                y = y + jnp.tile(bias.astype(compute_dtype), groups)
            return y

        strides = tuple(self.strides) if self.strides else (1,) * rank
        uniform_k = len(set(k)) == 1
        even_spatial = all(s % 2 == 0 for s in x.shape[1:-1])
        # auto-s2d only for k >= 5: the packed rewrite of a 3^r kernel
        # still needs 3^r packed taps, an 8x FLOP tax (vs 1.73x for 5^r)
        # that the ~8x lane-utilization gain merely breaks even on at
        # best — a net loss for >=32-channel 3^r convs (UNet blocks)
        can_s2d = (
            uniform_k and k[0] % 2 == 1 and k[0] >= 5
            and strides == (1,) * rank
            and even_spatial
            and (2 ** rank) * max(in_features, self.features) <= 1024
        )
        # stride-2 2^r conv: exactly one packed matmul (s2d_down_conv)
        can_down = (uniform_k and k[0] == 2 and strides == (2,) * rank
                    and even_spatial)
        use_s2d = (self.impl == "s2d" or (self.impl == "auto" and can_s2d))
        use_down = self.impl in ("s2d", "auto") and can_down
        if use_s2d and not can_s2d:
            raise ValueError(
                f"s2d conv not applicable: kernel={k}, strides={strides}, "
                f"spatial={x.shape[1:-1]}")

        if use_down:
            from ..ops.s2d import s2d_down_conv
            y = s2d_down_conv(x, kernel_c)
        elif use_s2d:
            from ..ops.s2d import s2d_conv
            y = s2d_conv(x, kernel_c, halo=_partition())
        else:
            dims = (("NHWC", "HWIO", "NHWC") if rank == 2
                    else ("NDHWC", "DHWIO", "NDHWC"))
            # NB: no f32 preferred_element_type here — the conv VJP would
            # then mix bf16 operands with f32 cotangents, which
            # lax.conv_general_dilated rejects. The MXU accumulates bf16
            # inputs in f32 internally regardless.
            part = _partition()
            if part is not None and any(kk > 1 for kk in k):
                # local shard of a spatially-partitioned volume: exchange
                # conv halos along the sharded axis, convolve VALID there
                axis_name, sp = part
                if strides != (1,) * rank:
                    # stride-2 2^r convs on even shards touch each voxel
                    # once — purely local, no halo needed
                    if not (k[sp] <= strides[sp]
                            and x.shape[1 + sp] % strides[sp] == 0):
                        raise NotImplementedError(
                            f"spatial partition: strided conv k={k} "
                            f"s={strides} needs halos")
                    y = jax.lax.conv_general_dilated(
                        x, kernel_c, strides, "SAME",
                        dimension_numbers=dims)
                else:
                    from ..parallel.spatial import halo_exchange_asym
                    lo, hi = (k[sp] - 1) // 2, k[sp] // 2
                    xh = halo_exchange_asym(x, lo, hi, axis_name, 1 + sp)
                    pads = [((kk - 1) // 2, kk // 2) for kk in k]
                    pads[sp] = (0, 0)
                    y = jax.lax.conv_general_dilated(
                        xh, kernel_c, strides, pads,
                        dimension_numbers=dims)
            elif self.dw_impl == "pallas" and strides == (1,) * rank:
                from ..ops.conv_vjp import same_pads
                from ..ops.pallas.dw_conv import conv_pallas_dw
                y = conv_pallas_dw(x, kernel_c, same_pads(k))
            elif self.dw_impl == "custom" and strides == (1,) * rank:
                from ..ops.conv_vjp import conv_custom_dw, same_pads
                y = conv_custom_dw(x, kernel_c, same_pads(k))
            else:
                y = jax.lax.conv_general_dilated(
                    x, kernel_c, strides, "SAME", dimension_numbers=dims)
        if bias is not None:
            y = y + bias.astype(compute_dtype)
        return y


def conv(features: int, kernel: Sequence[int] | int, spatial_rank: int,
         strides=None, dtype=None, param_dtype=jnp.float32,
         name: Optional[str] = None, use_bias: bool = True,
         impl: str = "direct", packed: bool = False,
         packed_input_splits=None, packed_factors=None,
         dw_impl: str = "xla") -> SpatialConv:
    """SAME ``spatial_rank``-D convolution with Xavier-uniform init and zero
    bias (`layers2.py:59-63`)."""
    if isinstance(kernel, int):
        kernel = (kernel,) * spatial_rank
    return SpatialConv(
        features=features,
        kernel_size=tuple(kernel),
        strides=tuple(strides) if strides else None,
        impl=impl,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=param_dtype,
        packed=packed,
        packed_input_splits=packed_input_splits,
        packed_factors=packed_factors,
        dw_impl=dw_impl,
        name=name,
    )


class SpatialConvTranspose(nn.Module):
    """SAME transpose conv with a selectable implementation; the
    stride-2 2^r case lowers to matmul + depth-to-space
    (`vnet_tpu/ops/s2d.py::s2d_up_conv`). Param names/shapes match
    ``nn.ConvTranspose``."""

    features: int
    kernel_size: tuple
    strides: tuple
    impl: str = "direct"
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    # packed_output=True: return the result in the space-to-depth domain
    # (skip the depth_to_space; the consumer's space_to_depth cancels it);
    # packed_factors selects which axes stay packed (None = all)
    packed_output: bool = False
    packed_factors: Optional[tuple] = None

    @nn.compact
    def __call__(self, x):
        rank = x.ndim - 2
        k = tuple(self.kernel_size)
        in_features = x.shape[-1]
        kernel = self.param("kernel", conv_kernel_init,
                            k + (in_features, self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)
        kernel_c = kernel.astype(compute_dtype)

        can_up = (k == (2,) * rank and tuple(self.strides) == (2,) * rank)
        if self.packed_output:
            assert can_up and self.impl in ("s2d", "auto")
            from ..ops.s2d import prod_factors, s2d_up_conv
            y = s2d_up_conv(x, kernel_c, keep_packed=True,
                            out_factors=self.packed_factors)
            groups = (prod_factors(self.packed_factors)
                      if self.packed_factors is not None else 2 ** rank)
            return y + jnp.tile(bias.astype(compute_dtype), groups)
        if self.impl in ("s2d", "auto") and can_up:
            from ..ops.s2d import s2d_up_conv
            y = s2d_up_conv(x, kernel_c)
        else:
            dims = (("NHWC", "HWIO", "NHWC") if rank == 2
                    else ("NDHWC", "DHWIO", "NDHWC"))
            y = jax.lax.conv_transpose(x, kernel_c, tuple(self.strides),
                                       "SAME", dimension_numbers=dims)
        return y + bias.astype(compute_dtype)


def deconv(features: int, kernel: Sequence[int] | int, spatial_rank: int,
           strides, dtype=None, param_dtype=jnp.float32,
           name: Optional[str] = None,
           impl: str = "direct") -> SpatialConvTranspose:
    """SAME transpose convolution (`layers2.py:65-74`)."""
    if isinstance(kernel, int):
        kernel = (kernel,) * spatial_rank
    return SpatialConvTranspose(
        features=features,
        kernel_size=tuple(kernel),
        strides=tuple(strides),
        impl=impl,
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


class DownConv(nn.Module):
    """Stride-``factor`` conv doubling channels (`layers2.py:78-84`),
    followed by norm + activation as in `networks.py:274-280`."""

    factor: int = 2
    norm: str = "batch"
    activation: str = "prelu"
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    impl: str = "direct"
    # packed_input=True: x is already in the s2d domain — the stride-2
    # conv is then a single matmul over packed channels (no repacking);
    # packed_factors: the input's per-axis packing (None = all axes)
    packed_input: bool = False
    packed_factors: Optional[tuple] = None
    # packed_output=True (requires packed_input): emit the next level's
    # packed layout; norm/activation run offset-aware in the packed domain
    packed_output: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        rank = x.ndim - 2
        if self.packed_input:
            assert self.factor == 2
            from ..ops.s2d import prod_factors
            groups_in = (prod_factors(self.packed_factors)
                         if self.packed_factors is not None else 2 ** rank)
            ch = x.shape[-1] // groups_in
            x = SpatialConv(ch * self.factor, (2,) * rank,
                            strides=(2,) * rank, packed_down=True,
                            packed_down_keep=self.packed_output,
                            packed_factors=self.packed_factors,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name="conv")(x)
            if self.packed_output:
                groups = 2 ** rank
                x = Norm(self.norm, self.dtype, self.param_dtype, groups,
                         name="norm")(x, train)
                x = Activation(self.activation, self.param_dtype, groups,
                               name="act")(x)
                return x
        else:
            assert not self.packed_output
            ch = x.shape[-1]
            x = conv(ch * self.factor, self.factor, rank,
                     strides=(self.factor,) * rank, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="conv",
                     impl=self.impl)(x)
        x = Norm(self.norm, self.dtype, self.param_dtype, name="norm")(x, train)
        x = Activation(self.activation, self.param_dtype, name="act")(x)
        return x


class UpConv(nn.Module):
    """Stride-``factor`` transpose conv halving channels
    (`layers2.py:88-94`) + norm + activation (`networks.py:288-294`)."""

    factor: int = 2
    norm: str = "batch"
    activation: str = "prelu"
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    impl: str = "direct"
    # packed_output: stay in the s2d domain (norm/act offset-aware); the
    # consuming decoder block skips its own pack — the two transposes
    # cancel. packed_factors: which axes of the OUTPUT grid stay packed.
    packed_output: bool = False
    packed_factors: Optional[tuple] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        rank = x.ndim - 2
        ch = x.shape[-1]
        if self.packed_output:
            assert self.factor == 2
            from ..ops.s2d import prod_factors
            groups = (prod_factors(self.packed_factors)
                      if self.packed_factors is not None else 2 ** rank)
            x = SpatialConvTranspose(ch // self.factor, (2,) * rank,
                                     (2,) * rank, impl="auto",
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     packed_output=True,
                                     packed_factors=self.packed_factors,
                                     name="deconv")(x)
            x = Norm(self.norm, self.dtype, self.param_dtype, groups,
                     name="norm")(x, train)
            x = Activation(self.activation, self.param_dtype, groups,
                           name="act")(x)
            return x
        x = deconv(ch // self.factor, self.factor, rank,
                   strides=(self.factor,) * rank, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="deconv",
                   impl=self.impl)(x)
        x = Norm(self.norm, self.dtype, self.param_dtype, name="norm")(x, train)
        x = Activation(self.activation, self.param_dtype, name="act")(x)
        return x


class Dropout(nn.Module):
    """Dropout with selectable implementation.

    * ``impl="xla"`` — flax ``nn.Dropout`` (rng-bit-generator writes a
      full random tensor to HBM; the select fusion reads it back).
    * ``impl="bits8"`` — same XLA lowering shape as ``"xla"`` (an
      ``rng_bit_generator`` fusion writes the mask to HBM, the select
      fusion reads it back) but the mask tensor is ``uint8`` instead of
      the ``uint32`` the float-uniform path materializes: 4x less HBM
      traffic on both sides of the dropout. Keep probability is
      quantized to ``round((1-rate)*256)/256`` (exact to 2^-8) and the
      survivor scale uses the quantized value, so E[out] == x exactly.
    * ``impl="pallas"`` — fused kernel with in-VMEM PRNG
      (`vnet_tpu/ops/pallas/dropout.py`): the mask never touches HBM and
      the backward regenerates it from the seed instead of materializing
      a pred tensor. Same keep probability (exact to 2^-32), different
      random stream than flax's threefry/rbg. Measured STRONGLY NEGATIVE
      at b96 (BENCHMARKS.md round-3 A/B) — each pallas_call is a fusion
      barrier; kept as a tested knob, not the default.

    On a non-TPU backend ``impl="pallas"`` falls back to the XLA path
    (with a one-time warning): the TPU-flavoured Pallas interpreter stubs
    ``prng_random_bits`` to zeros, which would silently turn dropout into
    a uniform ``x / keep`` scale.
    """

    rate: float
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        if self.impl not in ("xla", "bits8", "pallas"):
            raise ValueError(
                f"Unknown dropout impl {self.impl!r}; expected 'xla', "
                "'bits8' or 'pallas'")
        if deterministic or self.rate == 0.0:
            return x
        if self.impl == "bits8":
            key = self.make_rng("dropout")
            # keep iff u8 < t: P = t/256, t = round(keep*256) clamped to
            # [1, 255] so neither branch degenerates for rate in (0, 1).
            t = int(round((1.0 - float(self.rate)) * 256.0))
            t = min(max(t, 1), 255)
            u = jax.random.bits(key, x.shape, jnp.uint8)
            scale = jnp.asarray(256.0 / t, x.dtype)
            return jnp.where(u < jnp.uint8(t), x * scale,
                             jnp.zeros_like(x))
        if self.impl == "pallas":
            from ..ops.pallas import is_tpu_backend
            if is_tpu_backend():
                from ..ops.pallas.dropout import pallas_dropout
                key = self.make_rng("dropout")
                seed = jax.random.bits(key, (), jnp.uint32).astype(jnp.int32)
                return pallas_dropout(x, seed, float(self.rate),
                                      interpret=False)
            _warn_pallas_dropout_fallback()
        return nn.Dropout(rate=self.rate, deterministic=False)(x)


_PALLAS_DROPOUT_WARNED = False


def _warn_pallas_dropout_fallback():
    global _PALLAS_DROPOUT_WARNED
    if not _PALLAS_DROPOUT_WARNED:
        _PALLAS_DROPOUT_WARNED = True
        import warnings
        warnings.warn(
            "DropoutImpl='pallas' requires a TPU backend (the interpreter "
            "stubs the PRNG); using the XLA dropout path", stacklevel=3)
