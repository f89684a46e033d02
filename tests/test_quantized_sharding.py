"""Quantized tensor-parallel params: shard_params handles QuantizedWeight."""

import jax
import jax.numpy as jnp
import pytest

from flash_attention_from_scratch_tpu.models.llama import (
    LlamaConfig, init_params, init_quantized_params, quantize_params,
)
from flash_attention_from_scratch_tpu.parallel.mesh import make_mesh, shard_params

CFG = LlamaConfig(vocab_size=128, dim=512, n_layers=1, n_heads=4,
                  n_kv_heads=2, d_head=128, hidden_dim=256)


def test_shard_quantized_params(cpu_mesh_devices):
    mesh = make_mesh(1, 2, devices=cpu_mesh_devices[:2])
    params = quantize_params(init_params(CFG, jax.random.PRNGKey(0)), "int8")
    sharded = shard_params(params, mesh)
    wq = sharded["layers"][0]["wq"]
    assert wq.mode == "int8"
    # Column-parallel: values sharded over N, scales over N too.
    assert wq.values.sharding.is_fully_replicated is False
    assert wq.scales.sharding.is_fully_replicated is False
    # Row-parallel wo: scales replicated.
    wo = sharded["layers"][0]["wo"]
    assert wo.scales.sharding.is_fully_replicated


def test_shard_int4_row_parallel_rejected(cpu_mesh_devices):
    mesh = make_mesh(1, 2, devices=cpu_mesh_devices[:2])
    params = init_quantized_params(CFG, jax.random.PRNGKey(0), "int4")
    with pytest.raises(NotImplementedError):
        shard_params(params, mesh)


def test_int4_init_scale_matches_dequant_range():
    """Regression: int4 random init used the int8 qmax, collapsing scale 18x."""
    params = init_quantized_params(CFG, jax.random.PRNGKey(0), "int4")
    w = params["layers"][0]["wq"]
    deq = w.dequantize().astype(jnp.float32)
    # Dequantized std should be in the ballpark of dense init (1/sqrt(fan_in)).
    std = float(deq.std())
    expect = 1.0 / (512 ** 0.5)
    assert 0.2 * expect < std < 5 * expect, (std, expect)
