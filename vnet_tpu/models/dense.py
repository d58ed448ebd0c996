"""Dense (MLP) segmentation head — experimental family from the reference
(`/root/reference/networks.py:152-207`): flatten -> norm -> N x
[dense(128) + act + norm] -> dense(voxels * classes) -> reshape to logits.

The reference's 2D reshape branch is broken (indexes a tensor with an int,
`networks.py:201`); this implementation handles both ranks correctly.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import Activation, Norm


class Dense(nn.Module):
    num_classes: int
    num_levels: int = 2
    hidden_units: int = 128
    dropout_rate: float = 0.01
    activation: str = "relu"
    norm: str = "batch"
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        compute_dtype = self.dtype or x.dtype
        x = x.astype(compute_dtype)
        spatial = x.shape[1:-1]
        batch = x.shape[0]

        x = x.reshape(batch, -1)
        x = Norm(self.norm, self.dtype, self.param_dtype,
                 name="input_norm")(x, train)
        for i in range(self.num_levels):
            x = nn.Dense(self.hidden_units, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"dense_{i + 1}")(x)
            x = Activation(self.activation, self.param_dtype,
                           name=f"act_{i + 1}")(x)
            x = Norm(self.norm, self.dtype, self.param_dtype,
                     name=f"norm_{i + 1}")(x, train)
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not train)(x)

        out_units = int(np.prod(spatial)) * self.num_classes
        x = nn.Dense(out_units, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="output_dense")(x)
        logits = x.reshape((batch,) + spatial + (self.num_classes,))
        return logits.astype(jnp.float32)
