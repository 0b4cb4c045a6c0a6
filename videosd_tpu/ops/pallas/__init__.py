from videosd_tpu.ops.pallas.flash_attention import flash_attention, mha_flash
from videosd_tpu.ops.pallas.preprocess_kernel import (
    fused_preprocess,
    sobel_magnitude_pallas,
)

__all__ = [
    "flash_attention",
    "mha_flash",
    "fused_preprocess",
    "sobel_magnitude_pallas",
]
