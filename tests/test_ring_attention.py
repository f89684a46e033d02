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


def test_ring_gqa(sp_mesh):
    cfg = KernelConfig(block_q=128, block_kv=128)
    q, _, _ = generate_qkv(512, n_heads=4, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16, seed=1)
    out = ring_flash_attention(q, k, v, cfg, sp_mesh, interpret=True)
    ref_native, ref_fp32 = reference_pair(q, k, v)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"ring gqa: {kerr:.3e} vs {berr:.3e}"
