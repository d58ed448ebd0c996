"""Model zoo + name-dispatched factory.

``build_network`` mirrors the reference's network dispatch
(`/root/reference/model.py:414-440`): names ``VNet``, ``UNet``, ``Dense``
(and the attention-gated variant ``AttentionVNet`` from the legacy path,
`train.py:281-310`). ``FCN`` raises, as in `model.py:415-416`.
"""

from __future__ import annotations

from .attention import (AttentionGatedVNet, AttentionModule, OutputModule,
                        attention_distance_loss)
from .dense import Dense
from .unet import UNet
from .vnet import VNet

_NETWORKS = {
    "VNet": VNet,
    # faithful legacy topology (`/root/reference/VNet.py`): double norm
    # around each residual add; otherwise identical to VNet
    "VNetLegacy": VNet,
    "UNet": UNet,
    "Dense": Dense,
    "AttentionVNet": AttentionGatedVNet,
}


def eval_apply(network, variables, x):
    """Inference-mode ``network.apply`` honoring the norm kind.

    The reference always feeds ``train_phase=True`` — even at inference
    (`/root/reference/model.py:917`) — i.e. BatchNorm uses the statistics
    of the evaluation batch itself. ``norm="batch_stats"`` reproduces
    that, but flax only permits the (discarded) EMA write when the
    ``batch_stats`` collection is mutable; every inference surface must
    therefore route through this helper rather than calling
    ``apply(..., train=False)`` directly.
    """
    if getattr(network, "norm", "batch") == "batch_stats":
        out, _ = network.apply(variables, x, train=False,
                               mutable=["batch_stats"])
        return out
    return network.apply(variables, x, train=False)


def build_network(name: str, *, num_classes: int, dropout_rate: float = 0.01,
                  num_channels: int = 16, num_levels: int = 4,
                  num_convolutions=(1, 2, 3, 3), bottom_convolutions: int = 3,
                  activation: str = None, norm: str = "batch", dtype=None,
                  conv_impl: str = "packed", packed_target_lanes: int = 128,
                  dropout_impl: str = "xla", remat: bool = False,
                  legacy_double_norm: bool = False,
                  dw_impl: str = "xla"):
    """Instantiate a network module from config values
    (`model.py:417-438`). The reference hardcodes relu for UNet and prelu
    for VNet — kept as defaults when ``activation`` is None."""
    if name == "FCN":
        raise NotImplementedError("Network to be developed")  # model.py:415-416
    if name not in _NETWORKS:
        raise ValueError(f"Invalid network: {name!r}")

    if name in ("UNet", "Dense"):
        # these use flax dropout and plain convs; requesting a VNet-only
        # perf knob must not silently no-op
        unsupported = [k for k, on in (("DropoutImpl", dropout_impl != "xla"),
                                       ("DwImpl", dw_impl != "xla"),
                                       ("Remat", remat)) if on]
        if unsupported:
            import warnings
            warnings.warn(f"{name} does not implement "
                          f"{', '.join(unsupported)}; ignoring", stacklevel=2)
    if name == "UNet":
        return UNet(num_classes=num_classes, num_channels=num_channels,
                    num_levels=num_levels,
                    num_convolutions=(num_convolutions[0]
                                      if isinstance(num_convolutions, (list, tuple))
                                      else num_convolutions),
                    bottom_convolutions=bottom_convolutions,
                    dropout_rate=dropout_rate,
                    activation=activation or "relu", norm=norm, dtype=dtype,
                    conv_impl=conv_impl)
    if name == "Dense":
        return Dense(num_classes=num_classes, num_levels=num_levels,
                     dropout_rate=dropout_rate,
                     activation=activation or "relu", norm=norm, dtype=dtype)
    if name == "AttentionVNet":
        return AttentionGatedVNet(
            num_classes=num_classes, num_channels=num_channels,
            num_levels=num_levels, num_convolutions=tuple(num_convolutions),
            bottom_convolutions=bottom_convolutions,
            dropout_rate=dropout_rate, activation=activation or "prelu",
            norm=norm, dtype=dtype, conv_impl=conv_impl,
            packed_target_lanes=packed_target_lanes,
            dropout_impl=dropout_impl, remat=remat,
            legacy_double_norm=legacy_double_norm, dw_impl=dw_impl)
    return VNet(num_classes=num_classes, num_channels=num_channels,
                num_levels=num_levels,
                num_convolutions=tuple(num_convolutions),
                bottom_convolutions=bottom_convolutions,
                dropout_rate=dropout_rate, activation=activation or "prelu",
                norm=norm, dtype=dtype, conv_impl=conv_impl,
                packed_target_lanes=packed_target_lanes,
                dropout_impl=dropout_impl, remat=remat,
                legacy_double_norm=(legacy_double_norm
                                    or name == "VNetLegacy"),
                dw_impl=dw_impl)


__all__ = [
    "VNet", "UNet", "Dense", "AttentionGatedVNet", "AttentionModule",
    "OutputModule", "attention_distance_loss", "build_network", "eval_apply",
]
