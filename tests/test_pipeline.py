"""Pipeline parallelism: staged forward == sequential forward, grads flow."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh

from flash_attention_from_scratch_tpu.models.llama import (
    LlamaConfig, forward, init_params, loss_fn,
)
from flash_attention_from_scratch_tpu.ops.configs import DType
from flash_attention_from_scratch_tpu.parallel.pipeline import (
    pipeline_forward,
    pipeline_loss_fn,
    shard_pipeline_params,
    stack_pipeline_params,
)

CFG = LlamaConfig(vocab_size=128, dim=256, n_layers=4, n_heads=2,
                  n_kv_heads=1, d_head=128, hidden_dim=256,
                  block_q=128, block_kv=128, dtype=DType.FP32)


@pytest.fixture(scope="module")
def setup(cpu_mesh_devices):
    mesh = Mesh(np.asarray(cpu_mesh_devices[:4]).reshape(4), ("pp",))
    params = init_params(CFG, jax.random.PRNGKey(0))
    cpu0 = cpu_mesh_devices[0]
    params = jax.device_put(params, cpu0)
    tokens = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(1), (4, 128), 0,
                           CFG.vocab_size), cpu0)
    return mesh, params, tokens


def test_stack_shapes(setup):
    _, params, _ = setup
    stacked = stack_pipeline_params(params, 4)
    assert stacked["stages"]["wq"].shape[:2] == (4, 1)
    stacked2 = stack_pipeline_params(params, 2)
    assert stacked2["stages"]["wq"].shape[:2] == (2, 2)
    with pytest.raises(ValueError):
        stack_pipeline_params(params, 3)


def test_pipeline_matches_sequential(setup):
    """4-stage pipeline over 4 microbatches == plain layer-by-layer forward."""
    mesh, params, tokens = setup
    logits_ref = forward(params, tokens, CFG, interpret=True)

    staged = shard_pipeline_params(stack_pipeline_params(params, 4), mesh)
    with mesh:
        tokens_m = jax.device_put(
            tokens, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        logits = pipeline_forward(staged, tokens_m, CFG, mesh, n_micro=4,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=2e-3, rtol=2e-3)


def test_pipeline_two_stages_microbatch_2(setup):
    mesh8, params, tokens = setup
    mesh = Mesh(mesh8.devices.reshape(-1)[:2], ("pp",))
    logits_ref = forward(params, tokens, CFG, interpret=True)
    staged = shard_pipeline_params(stack_pipeline_params(params, 2), mesh)
    with mesh:
        tokens_m = jax.device_put(
            tokens, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        logits = pipeline_forward(staged, tokens_m, CFG, mesh, n_micro=2,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               atol=2e-3, rtol=2e-3)


@pytest.mark.slow
def test_pipeline_loss_and_grad(setup):
    """Backward through ppermute: grads finite and match sequential grads."""
    mesh, params, _ = setup
    # 129 so the next-token loss slice is a kernel-tileable 128; pinned to
    # the CPU devices like the params fixture.
    tokens = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(2), (4, 129), 0,
                           CFG.vocab_size),
        mesh.devices.flat[0])
    staged = shard_pipeline_params(stack_pipeline_params(params, 4), mesh)
    with mesh:
        tokens_m = jax.device_put(
            tokens, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        loss, grads = jax.value_and_grad(pipeline_loss_fn)(
            staged, tokens_m, CFG, mesh, 4, interpret=True)
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        params, tokens, CFG, interpret=True)
    assert abs(float(loss) - float(loss_ref)) < 1e-3

    # Per-layer grads: unstack stage grads and compare one early + one late
    # layer against the sequential model's grads.
    g_stage = np.asarray(grads["stages"]["wq"])  # (4, 1, dim, q_dim)
    for li in (0, 3):
        g_ref = np.asarray(grads_ref["layers"][li]["wq"])
        np.testing.assert_allclose(g_stage[li, 0], g_ref, atol=2e-3, rtol=2e-2)


def test_pipeline_validates_microbatch(setup):
    mesh, params, tokens = setup
    staged = stack_pipeline_params(params, 4)
    with pytest.raises(ValueError):
        pipeline_forward(staged, tokens, CFG, mesh, n_micro=3)
