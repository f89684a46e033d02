#!/usr/bin/env python
"""Headline benchmark: flash-attention TFLOP/s at seq 4096, d_head 128, bf16.

Prints ONE JSON line. ``value`` is attention TFLOP/s (algorithmic FLOPs,
``4 s^2 d + 6 s^2`` per head — same model as the reference, so numbers are
comparable to its README table). ``vs_baseline`` is the fraction of the
chip's bf16 matmul speed-of-light divided by the 0.95 target from
BASELINE.md — 1.0 means "95% of MXU SoL" is met (the TPU analogue of the
reference's 99.2%-of-FA2 headline, ``README.md:58``).
"""

import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flash_attention_from_scratch_tpu as fa
from flash_attention_from_scratch_tpu.dispatch import median_runtime
from flash_attention_from_scratch_tpu.utils.testing import (
    BATCH_SIZE_FOR_SEQ_LEN,
    generate_qkv,
)

# Nominal bf16 MXU peaks (TFLOP/s) by device kind substring.
SOL_TFLOPS = {
    "v5 lite": 197.0,  # v5e
    "v5e": 197.0,
    "v5p": 459.0,
    "v5": 459.0,
    "v4": 275.0,
    "v6 lite": 918.0,
    "v6e": 918.0,
}
TARGET_FRACTION = 0.95  # BASELINE.md: >=95% of MXU SoL


def chip_sol() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, sol in SOL_TFLOPS.items():
        if key in kind:
            return sol
    return 197.0


def main():
    seq, d_head, heads = 4096, 128, 16
    batch = BATCH_SIZE_FOR_SEQ_LEN[seq]
    q, k, v = generate_qkv(seq, d_head=d_head, n_heads=heads, batch=batch,
                           dtype=jnp.bfloat16)
    cfg = fa.KernelConfig.for_shape(seq, seq)
    secs = median_runtime(lambda: fa.forward(q, k, v, cfg), warmup=3, iters=5)
    flops = fa.calc_self_attn_flop(seq, d_head, heads, batch)
    tflops = flops / secs / 1e12
    sol = chip_sol()
    print(json.dumps({
        "metric": "attn_tflops_seq4096_d128_bf16",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / sol / TARGET_FRACTION, 4),
        "pct_of_sol": round(100.0 * tflops / sol, 2),
        "sol_tflops": sol,
        "config": cfg.short_form(),
        "ms_per_call": round(secs * 1e3, 4),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    sys.exit(main())
