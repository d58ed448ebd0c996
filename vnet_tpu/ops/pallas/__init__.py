from .fused import (blend_accumulate_patches, blend_accumulate_rows,
                    fused_bias_prelu_residual)


def is_tpu_backend() -> bool:
    """True when the default JAX backend executes on TPU hardware.

    ``jax.default_backend() == "tpu"`` is NOT sufficient: remote-TPU
    plugins can register under a different platform name (this
    environment's tunnel registers as ``"axon"`` with device_kind
    ``"TPU v5 lite"`` and canonicalizes to TPU only for MLIR lowering).
    Checking the device identity keeps the compiled (non-interpret)
    Pallas path active on such backends.
    """
    import jax

    if jax.default_backend() == "tpu":
        return True
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    ident = " ".join((getattr(dev, "platform", "") or "",
                      getattr(dev, "device_kind", "") or "")).lower()
    return "tpu" in ident


__all__ = ["blend_accumulate_patches", "blend_accumulate_rows",
           "fused_bias_prelu_residual", "is_tpu_backend"]
