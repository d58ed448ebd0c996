"""Model export — the TPU-native analog of the reference's graph freezer.

`/root/reference/meta_to_pb.py:8-28` bakes checkpoint weights into a frozen
``graph.pb`` consumed by the C++ app. Here the equivalent artifact is a
serialized **StableHLO** module with the weights baked as constants,
produced by ``jax.export`` from the jitted eval-mode forward — loadable by
any PJRT runtime (the C++ client's TPU executor) or re-imported in JAX via
``jax.export.deserialize``.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def export_forward(network, variables, input_shape: Tuple[int, ...],
                   path: Optional[str] = None, is_attention: bool = False):
    """Serialize the frozen forward function.

    Args:
      network: flax module with ``apply(variables, x, train=False)``.
      variables: trained ``{"params", "batch_stats"}`` (baked as constants).
      input_shape: full input shape incl. batch, e.g. ``(B, X, Y, Z, C)``.
    Returns the serialized bytes; writes to ``path`` if given.
    """

    def forward(x):
        from .models import eval_apply
        out = eval_apply(network, variables, x)
        logits = out[0] if is_attention else out
        return jax.nn.softmax(logits, axis=-1)

    exported = jax.export.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(input_shape, jnp.float32))
    blob = exported.serialize()
    if path:
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".",
                    exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_stablehlo_bytecode(network, variables, input_shape: Tuple[int, ...],
                              path: Optional[str] = None,
                              is_attention: bool = False) -> bytes:
    """Raw StableHLO module bytecode (weights baked as constants) — the
    artifact the native PJRT executor compiles (csrc/pjrt_executor.cc).
    Unlike :func:`export_forward`'s jax.export container, this is plain
    MLIR bytecode consumable by ``PJRT_Client_Compile`` (format "mlir")."""

    def forward(x):
        from .models import eval_apply
        out = eval_apply(network, variables, x)
        logits = out[0] if is_attention else out
        return jax.nn.softmax(logits, axis=-1)

    exported = jax.export.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(input_shape, jnp.float32))
    blob = exported.mlir_module_serialized
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Deserialize an exported forward; returns a callable ``f(x)``."""
    blob = path_or_bytes
    if isinstance(path_or_bytes, (str, os.PathLike)):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jax.export.deserialize(bytearray(blob))
    return exported.call


def stablehlo_text(network, variables, input_shape: Tuple[int, ...],
                   is_attention: bool = False) -> str:
    """Human-readable StableHLO for inspection/debugging."""

    def forward(x):
        from .models import eval_apply
        out = eval_apply(network, variables, x)
        logits = out[0] if is_attention else out
        return jax.nn.softmax(logits, axis=-1)

    exported = jax.export.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(input_shape, jnp.float32))
    return exported.mlir_module()
