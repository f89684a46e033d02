"""Weight-only quantized matmul vs dequantized jnp oracle."""

import jax
import jax.numpy as jnp
import pytest

from flash_attention_from_scratch_tpu.ops.quant_matmul import (
    QuantizedWeight, quant_matmul, quantize_weight,
)


def _mk(m, k, n, seed=0):
    kx, kw = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (m, k), jnp.float32).astype(jnp.bfloat16)
    w = (jax.random.normal(kw, (k, n), jnp.float32) / jnp.sqrt(k)).astype(jnp.bfloat16)
    return x, w


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quantize_roundtrip(mode):
    _, w = _mk(8, 256, 256)
    wq = quantize_weight(w, mode)
    err = jnp.max(jnp.abs(wq.dequantize().astype(jnp.float32) - w.astype(jnp.float32)))
    # Half a quantization step per channel, plus one bf16 ulp of the values
    # (dequantize() rounds back to the original dtype).
    bound = 0.5 * wq.scales.max() + 0.008 * jnp.max(jnp.abs(w).astype(jnp.float32))
    assert err <= bound, (float(err), float(bound))


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quant_matmul_kernel(mode):
    m, k, n = 256, 1024, 512
    x, w = _mk(m, k, n)
    wq = quantize_weight(w, mode)
    got = quant_matmul(x, wq, block_m=128, block_k=256, block_n=256)
    want = x.astype(jnp.float32) @ wq.dequantize().astype(jnp.float32)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - want))
    assert err < 0.15 * jnp.max(jnp.abs(want)) + 0.1, float(err)
    # Tight check vs the same math in fp32.
    rel = err / (jnp.max(jnp.abs(want)) + 1e-9)
    assert rel < 0.05, float(rel)


def test_quant_matmul_n_inner_matches_n_outer():
    """The K-outer/N-inner walk is numerically identical to the default."""
    m, k, n = 8, 1024, 512
    x, w = _mk(m, k, n, seed=3)
    wq = quantize_weight(w, "int8")
    base = quant_matmul(x, wq, block_m=8, block_k=256, block_n=256)
    swept = quant_matmul(x, wq, block_m=8, block_k=256, block_n=256,
                         n_inner=True)
    assert jnp.array_equal(base.astype(jnp.float32),
                           swept.astype(jnp.float32))


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quant_matmul_fallback_ragged(mode):
    """Non-MXU-aligned M takes the fused XLA path and stays correct."""
    x, w = _mk(3, 256, 256, seed=1)
    wq = quantize_weight(w, mode)
    got = quant_matmul(x, wq)
    want = x.astype(jnp.float32) @ wq.dequantize().astype(jnp.float32)
    assert jnp.max(jnp.abs(got.astype(jnp.float32) - want)) < 0.05


def test_quant_matmul_batched_input():
    x, w = _mk(8, 256, 384, seed=2)
    x3 = x.reshape(2, 4, 256)
    wq = quantize_weight(w, "int8")
    got = quant_matmul(x3, wq)
    assert got.shape == (2, 4, 384)
    want = quant_matmul(x, wq).reshape(2, 4, 384)
    assert jnp.allclose(got.astype(jnp.float32), want.astype(jnp.float32))
