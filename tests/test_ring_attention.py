"""Ring attention on an 8-device CPU mesh vs the dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from flash_attention_from_scratch_tpu.ops.configs import KernelConfig
from flash_attention_from_scratch_tpu.ops.reference import reference_pair
from flash_attention_from_scratch_tpu.parallel.ring_attention import (
    ring_flash_attention,
)
from flash_attention_from_scratch_tpu.utils.testing import (
    adaptive_tolerance_check,
    generate_qkv,
)


@pytest.fixture(scope="module")
def sp_mesh(cpu_mesh_devices):
    return Mesh(np.asarray(cpu_mesh_devices[:4]), ("sp",))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_reference(sp_mesh, causal):
    cfg = KernelConfig(block_q=128, block_kv=128, causal=causal)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = ring_flash_attention(q, k, v, cfg, sp_mesh, interpret=True)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=causal)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"ring causal={causal}: {kerr:.3e} vs baseline {berr:.3e}"


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.slow
def test_ring_backward(sp_mesh, causal):
    """Ring attention gradients vs jax.grad of the dense reference."""
    from flash_attention_from_scratch_tpu.ops.reference import reference_attention
    from flash_attention_from_scratch_tpu.utils.testing import (
        adaptive_tolerance_check as check,
    )

    cfg = KernelConfig(block_q=128, block_kv=128, causal=causal)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    do = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16, seed=3)[0]

    def loss(q, k, v):
        return jnp.sum(
            ring_flash_attention(q, k, v, cfg, sp_mesh, interpret=True) * do)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def ref_loss(q, k, v):
        return jnp.sum(reference_attention(q, k, v, causal=causal) * do)

    ref_g = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    ref32 = jax.grad(
        lambda q, k, v: jnp.sum(
            reference_attention(q, k, v, causal=causal) * do.astype(jnp.float32)),
        argnums=(0, 1, 2),
    )(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    for name, got, r16, r32 in zip("qkv", grads, ref_g, ref32):
        ok, kerr, berr = check(got, r16, r32)
        assert ok, f"ring d{name} causal={causal}: {kerr:.3e} vs {berr:.3e}"


@pytest.mark.parametrize("window", [100, 300])
def test_ring_sliding_window(sp_mesh, window):
    """Windowed ring (4 shards of 128): hops re-align via q_offset; hops
    below the window never run. Must match the single-chip windowed kernel
    AND the dense reference (VERDICT r2 #7)."""
    from flash_attention_from_scratch_tpu.ops.flash_forward import flash_forward

    cfg = KernelConfig(block_q=128, block_kv=128, causal=True, window=window,
                       optimized_softmax=False)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = ring_flash_attention(q, k, v, cfg, sp_mesh, interpret=True)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=True, window=window)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"ring window={window}: {kerr:.3e} vs baseline {berr:.3e}"
    single = flash_forward(q, k, v, cfg, interpret=True)
    drift = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                  - single.astype(jnp.float32))))
    assert drift < 0.03, f"ring vs single-chip windowed kernel: {drift}"


@pytest.mark.slow
def test_ring_window_backward(sp_mesh):
    """Windowed ring gradients vs jax.grad of the dense reference."""
    from flash_attention_from_scratch_tpu.ops.reference import reference_attention

    window = 200
    cfg = KernelConfig(block_q=128, block_kv=128, causal=True, window=window,
                       optimized_softmax=False)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    do = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16, seed=3)[0]

    def loss(q, k, v):
        return jnp.sum(
            ring_flash_attention(q, k, v, cfg, sp_mesh, interpret=True) * do)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def ref_loss(q, k, v):
        return jnp.sum(
            reference_attention(q, k, v, causal=True, window=window) * do)

    ref_g = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    ref32 = jax.grad(
        lambda q, k, v: jnp.sum(
            reference_attention(q, k, v, causal=True, window=window)
            * do.astype(jnp.float32)),
        argnums=(0, 1, 2),
    )(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    for name, got, r16, r32 in zip("qkv", grads, ref_g, ref32):
        ok, kerr, berr = adaptive_tolerance_check(got, r16, r32)
        assert ok, f"windowed ring d{name}: {kerr:.3e} vs {berr:.3e}"


def test_ring_window_hop_count():
    """The ring stops rotating once every later hop is below the window."""
    from flash_attention_from_scratch_tpu.parallel.ring_attention import _max_hop

    assert _max_hop(0, 128, 8) == 8          # no window: full ring
    assert _max_hop(128, 128, 8) == 2        # window == shard: diag + 1 hop
    assert _max_hop(129, 128, 8) == 3
    assert _max_hop(4096, 4096, 32) == 2     # Mistral window over a 128K ring
    assert _max_hop(10**9, 128, 8) == 8      # huge window: clamped


def test_ring_sinks(sp_mesh):
    """GPT-OSS sinks fold into the ring's merged LSE once (round 5 — lifts
    the r4 'attn_sinks under mesh sharding' NotImplementedError)."""
    cfg = KernelConfig(block_q=128, block_kv=128, causal=True)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    z = jnp.array([0.5, -0.25], jnp.float32)
    out = ring_flash_attention(q, k, v, cfg, sp_mesh, interpret=True, sinks=z)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=True, sinks=z)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"ring sinks: {kerr:.3e} vs baseline {berr:.3e}"


@pytest.mark.slow
def test_ring_sinks_backward(sp_mesh):
    """Ring gradients with sinks — including d(sinks) psummed over the
    ring — vs jax.grad of the dense sink-enabled reference."""
    from flash_attention_from_scratch_tpu.ops.reference import reference_attention

    cfg = KernelConfig(block_q=128, block_kv=128, causal=True)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    do = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16, seed=3)[0]
    z = jnp.array([0.4, -0.3], jnp.float32)

    def loss(q, k, v, z):
        return jnp.sum(ring_flash_attention(q, k, v, cfg, sp_mesh,
                                            interpret=True, sinks=z) * do)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, z)

    def ref_loss(q, k, v, z):
        return jnp.sum(
            reference_attention(q, k, v, causal=True, sinks=z) * do)

    ref_g = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(q, k, v, z)
    ref32 = jax.grad(
        lambda q, k, v, z: jnp.sum(
            reference_attention(q, k, v, causal=True, sinks=z)
            * do.astype(jnp.float32)),
        argnums=(0, 1, 2, 3),
    )(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), z)
    # Same acceptance as the single-chip sink test: d(sink) reconstructs D
    # from the SAVED bf16 O, so it carries O's rounding (here additionally
    # the ring merge's) on top of the oracle baseline.
    from tests.test_backward import _check_sink_grads

    _check_sink_grads(grads, ref_g, ref32)


@pytest.mark.slow
def test_ring_gqa(sp_mesh):
    cfg = KernelConfig(block_q=128, block_kv=128)
    q, _, _ = generate_qkv(512, n_heads=4, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16, seed=1)
    out = ring_flash_attention(q, k, v, cfg, sp_mesh, interpret=True)
    ref_native, ref_fp32 = reference_pair(q, k, v)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"ring gqa: {kerr:.3e} vs {berr:.3e}"
