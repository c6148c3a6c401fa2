from efficientsam3_tpu.models.sam.heads import (
    MaskDecoder,
    PromptEncoder,
    TwoWayTransformer,
)

__all__ = ["MaskDecoder", "PromptEncoder", "TwoWayTransformer"]
