from .fused import (blend_accumulate_patches, blend_accumulate_rows,
                    fused_bias_prelu_residual)

__all__ = ["blend_accumulate_patches", "blend_accumulate_rows",
           "fused_bias_prelu_residual"]
