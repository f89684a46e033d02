"""Quantized K/V attention tests: pack/unpack round trip, fused-dequant numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_from_scratch_tpu.ops.configs import KernelConfig
from flash_attention_from_scratch_tpu.ops.flash_quant import flash_forward_quantized
from flash_attention_from_scratch_tpu.ops.quant import (
    dequantize, quantize_kv, unpack_int4,
)
from flash_attention_from_scratch_tpu.ops.reference import reference_attention
from flash_attention_from_scratch_tpu.utils.testing import generate_qkv

CFG = KernelConfig(block_q=128, block_kv=128)

# Max tolerated output error vs the *dequantized* oracle is small (the kernel
# must match its own quantization); vs the unquantized oracle it is bounded
# by the quantization noise itself.
ERR_VS_DEQUANT_ORACLE = {"int8": 6e-3, "fp8": 6e-3, "int4": 1.2e-2}


@pytest.mark.parametrize("mode", ["int8", "fp8", "int4"])
def test_quantize_round_trip(mode):
    _, k, _ = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16)
    qt = quantize_kv(k, mode)
    deq = dequantize(qt)
    rel = float(jnp.max(jnp.abs(deq.astype(jnp.float32) - k.astype(jnp.float32))))
    scale = float(qt.scales.max())
    # Round-trip error: half a quantization step plus the bf16 rounding of
    # the dequantized value (dequantize() returns the original dtype).
    bf16_ulp = 0.0079 * float(jnp.max(jnp.abs(k.astype(jnp.float32))))
    # int4/int8: half a quantization step. fp8 e4m3: 3 mantissa bits ->
    # half-ulp relative error 2^-4, i.e. absmax/16 = 28*scale at the max.
    step = scale * (28.0 if mode == "fp8" else 0.51)
    assert rel <= step + bf16_ulp, (mode, rel, scale)
    if mode == "int4":
        assert qt.values.shape[-1] == k.shape[-1] // 2


def test_unpack_int4_exact():
    rng = np.random.RandomState(0)
    vals = rng.randint(-7, 8, size=(4, 8)).astype(np.int8)
    lo = vals[:, :4] & 0x0F
    hi = vals[:, 4:] & 0x0F
    packed = jnp.asarray((lo | (hi << 4)).astype(np.int8))
    out = unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(out), vals.astype(np.float32))


@pytest.mark.parametrize("mode", ["int8", "fp8", "int4"])
def test_quantized_attention_matches_dequant_oracle(mode):
    q, k, v = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16)
    kq, vq = quantize_kv(k, mode), quantize_kv(v, mode)
    out = flash_forward_quantized(q, kq, vq, CFG)
    # Oracle: plain attention on the dequantized values — isolates kernel
    # error from quantization error.
    ref = reference_attention(q, dequantize(kq), dequantize(vq))
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert err <= ERR_VS_DEQUANT_ORACLE[mode], f"{mode}: {err}"


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quantized_attention_vs_unquantized(mode):
    """End-to-end quantization noise stays within the expected band."""
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    kq, vq = quantize_kv(k, mode), quantize_kv(v, mode)
    out = flash_forward_quantized(q, kq, vq, CFG)
    ref = reference_attention(q, k, v)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    # int8 KV is near-lossless for attention; int4 noticeably noisier.
    bound = 0.06 if mode == "int8" else 0.5
    assert err <= bound, f"{mode}: {err}"


def test_causal_quantized():
    cfg = KernelConfig(block_q=128, block_kv=128, causal=True)
    q, k, v = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16)
    kq, vq = quantize_kv(k, "int8"), quantize_kv(v, "int8")
    out = flash_forward_quantized(q, kq, vq, cfg)
    ref = reference_attention(q, dequantize(kq), dequantize(vq), causal=True)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    # Early causal rows average few keys -> outputs near 1.0, so 1-2 bf16
    # ulps at that magnitude.
    assert err <= 2e-2, err


def test_fp8_qkv():
    """Full FP8-QKV path: Q's scale folds into the softmax scale."""
    q, k, v = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16)
    qq = quantize_kv(q, "fp8")
    kq, vq = quantize_kv(k, "fp8"), quantize_kv(v, "fp8")
    out = flash_forward_quantized(qq, kq, vq, CFG)
    ref = reference_attention(dequantize(qq), dequantize(kq), dequantize(vq))
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert err <= 8e-3, err
    # And vs the unquantized oracle the fp8 noise band holds.
    ref_full = reference_attention(q, k, v)
    err2 = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref_full.astype(jnp.float32))))
    assert err2 <= 0.08, err2


@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_gqa_quantized(mode):
    """GQA: quantized K/V with fewer heads, indexed via h // group."""
    q, _, _ = generate_qkv(256, n_heads=8, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16, seed=1)
    kq, vq = quantize_kv(k, mode), quantize_kv(v, mode)
    out = flash_forward_quantized(q, kq, vq, CFG)
    ref = reference_attention(q, dequantize(kq), dequantize(vq))
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert err <= 1e-2, f"{mode}: {err}"


def test_gqa_quantized_invalid_heads():
    q, _, _ = generate_qkv(256, n_heads=6, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(256, n_heads=4, batch=1, dtype=jnp.bfloat16)
    with pytest.raises(ValueError):
        flash_forward_quantized(q, quantize_kv(k, "int8"),
                                quantize_kv(v, "int8"), CFG)


def test_mode_mismatch_rejected():
    q, k, v = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16)
    with pytest.raises(ValueError):
        flash_forward_quantized(q, quantize_kv(k, "int8"), quantize_kv(v, "int4"), CFG)


@pytest.mark.parametrize("causal", [False, True])
def test_int8_compute_attention(causal):
    """Round-4 quantized-COMPUTE path: both dots run int8 x int8 -> int32
    on the MXU (2x rate); P is quantized at the constant 127 row scale.
    Error vs the dequantized oracle is bounded by the P-quantization step
    (~1/254 of each row's max weight, integrated over the row)."""
    cfg = KernelConfig(block_q=128, block_kv=128, causal=causal)
    q, k, v = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16)
    qq, kq, vq = (quantize_kv(t, "int8") for t in (q, k, v))
    out = flash_forward_quantized(qq, kq, vq, cfg)  # int8_compute auto-on
    ref = reference_attention(dequantize(qq), dequantize(kq), dequantize(vq),
                              causal=causal)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    # P rounds to 1/254 of the row max. Non-causal 256-long rows integrate
    # that noise to ~6e-3; causal EARLY rows see only a handful of keys, so
    # the same per-weight step is divided by a much smaller denominator —
    # measured 3.1e-2 max (at the short-row corner), mean ~1e-3.
    bound = 4e-2 if causal else 2.5e-2
    assert err <= bound, f"int8_compute causal={causal}: {err}"
    # and it must agree with the upcast path to the same order
    up = flash_forward_quantized(qq, kq, vq, cfg, int8_compute=False)
    derr = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                 - up.astype(jnp.float32))))
    assert derr <= bound, derr


def test_int8_compute_kv_splits():
    """The int8 attend sub-tiles by cfg.kv_splits (VPU/MXU overlap lever)."""
    cfg = KernelConfig(block_q=128, block_kv=256, kv_splits=2)
    q, k, v = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16)
    qq, kq, vq = (quantize_kv(t, "int8") for t in (q, k, v))
    out = flash_forward_quantized(qq, kq, vq, cfg)
    base = flash_forward_quantized(
        qq, kq, vq, KernelConfig(block_q=128, block_kv=256))
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - base.astype(jnp.float32))))
    # Sub-tiles quantize P against their LOCAL max, so split and unsplit
    # differ by one extra rounding of the smaller partials (~2 bf16 ulps).
    assert err <= 2e-2, err


def test_int8_compute_requires_full_int8():
    q, k, v = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16)
    kq, vq = quantize_kv(k, "int8"), quantize_kv(v, "int8")
    with pytest.raises(ValueError):
        flash_forward_quantized(q, kq, vq, CFG, int8_compute=True)
