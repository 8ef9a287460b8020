"""Weight-only quantization (INT8/INT4 blockwise) + QLoRA adaptors."""

from metalchat_tpu.quant.quantize import (  # noqa: F401
    LoraLinear,
    QuantizedTensor,
    dequantize,
    linear,
    lookup_embedding,
    quant_matmul,
    quantize,
    quantize_params,
)
