"""flash_attention_from_scratch_tpu: a TPU-native flash-attention framework.

Brand-new JAX/Pallas/pjit re-design with the capabilities of
``sonnyli/flash_attention_from_scratch`` (CUDA): a from-scratch Flash
Attention 2 forward kernel built as an optimization ladder, a typed
kernel-config system with autotuning, an adaptive-tolerance numerics suite,
a hermetic benchmarking harness, and kernel-introspection tooling — extended
with quantized attention (FP8/INT8/INT4 KV), decode kernels, and multi-chip
sharding, which the single-GPU reference does not have.

Public API (analogue of ``flash_attention/__init__.py:7-17``):

    import flash_attention_from_scratch_tpu as fa
    out = fa.forward(q, k, v)                      # default config
    out = fa.forward(q, k, v, cfg)                 # explicit config
    out, seconds = fa.forward_timed(q, k, v, cfg)  # hermetic timing
"""

from .ops.configs import (
    DType,
    KernelConfig,
    KVLoop,
    calc_self_attn_flop,
    calc_total_flop,
    get_autotuning_kernel_configs,
    get_kernel_configs,
    get_kernel_progression_configs,
    get_kernels_to_build,
    parse_short_form,
)
from .ops.flash_forward import flash_forward as forward
from .ops.flash_forward import flash_forward_with_lse, make_flash_forward
from .ops.flash_backward import flash_backward
from .ops.autodiff import flash_attention
from .ops.flash_quant import flash_forward_quantized
from .ops.paged_attention import paged_decode_attention
from .ops.quant import QTensor, dequantize, quantize_kv
from .ops.quant_matmul import QuantizedWeight, quant_matmul, quantize_weight
from .ops.reference import block_flash_attention, reference_attention, reference_pair
from .dispatch import forward_timed

__version__ = "0.1.0"

__all__ = [
    "DType",
    "KernelConfig",
    "KVLoop",
    "QTensor",
    "QuantizedWeight",
    "forward",
    "forward_timed",
    "flash_attention",
    "flash_backward",
    "flash_forward_with_lse",
    "flash_forward_quantized",
    "paged_decode_attention",
    "quantize_kv",
    "dequantize",
    "quantize_weight",
    "quant_matmul",
    "make_flash_forward",
    "reference_attention",
    "reference_pair",
    "block_flash_attention",
    "calc_self_attn_flop",
    "calc_total_flop",
    "get_autotuning_kernel_configs",
    "get_kernel_configs",
    "get_kernel_progression_configs",
    "get_kernels_to_build",
    "parse_short_form",
]
