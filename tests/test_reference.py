"""Oracle self-consistency: block recurrence must match plain softmax."""

import jax.numpy as jnp
import pytest

from flash_attention_from_scratch_tpu.ops.reference import (
    block_flash_attention,
    reference_attention,
    reference_pair,
)
from flash_attention_from_scratch_tpu.utils.testing import (
    adaptive_tolerance_check,
    error_stats,
    generate_qkv,
)


@pytest.mark.parametrize("use_exp2", [False, True])
@pytest.mark.parametrize("reverse_kv", [False, True])
def test_block_recurrence_matches_reference(use_exp2, reverse_kv):
    q, k, v = generate_qkv(256, d_head=128, n_heads=2, batch=1, dtype=jnp.float32)
    ref = reference_attention(q, k, v)
    blk = block_flash_attention(
        q, k, v, block_q=128, block_kv=128, use_exp2=use_exp2, reverse_kv=reverse_kv
    )
    stats = error_stats(blk, ref)
    assert stats.max_abs_diff < 1e-5, stats


def test_block_recurrence_bf16_adaptive_tolerance():
    q, k, v = generate_qkv(256, d_head=128, n_heads=2, batch=1, dtype=jnp.bfloat16)
    ref16, ref32 = reference_pair(q, k, v)
    blk = block_flash_attention(q, k, v, block_q=128, block_kv=128)
    ok, kerr, berr = adaptive_tolerance_check(blk, ref16, ref32)
    assert ok, f"kernel err {kerr} > 2x baseline err {berr}"


def test_trace_collection():
    q, k, v = generate_qkv(256, d_head=128, n_heads=1, batch=1, dtype=jnp.float32)
    out, trace = block_flash_attention(
        q, k, v, block_q=128, block_kv=128, collect_trace=True
    )
    # 2 q blocks x 2 kv blocks.
    assert len(trace) == 4
    assert trace[0]["S"].shape == (1, 1, 128, 128)


def test_causal_reference():
    q, k, v = generate_qkv(256, d_head=128, n_heads=2, batch=1, dtype=jnp.float32)
    out = reference_attention(q, k, v, causal=True)
    # Row 0 attends only to key 0: output must equal v[..., 0, :].
    assert jnp.allclose(out[:, :, 0, :], v[:, :, 0, :], atol=1e-5)
