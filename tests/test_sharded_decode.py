"""Tensor-parallel paged decode on a CPU mesh vs the single-device path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attention_from_scratch_tpu.models.decode import (
    decode_step, init_cache, prefill,
)
from flash_attention_from_scratch_tpu.models.llama import LlamaConfig, init_params
from flash_attention_from_scratch_tpu.parallel.mesh import (
    MODEL_AXIS, make_mesh, shard_params,
)

CFG = LlamaConfig(vocab_size=128, dim=512, n_layers=1, n_heads=4,
                  n_kv_heads=2, d_head=128, hidden_dim=256,
                  block_q=128, block_kv=128)


def _shard_cache(cache, mesh):
    pool = NamedSharding(mesh, P(MODEL_AXIS, None, None, None))
    sc = NamedSharding(mesh, P(MODEL_AXIS, None))
    return dataclasses.replace(
        cache,
        k_pages=[jax.device_put(x, pool) for x in cache.k_pages],
        v_pages=[jax.device_put(x, pool) for x in cache.v_pages],
        k_scales=[jax.device_put(x, sc) for x in cache.k_scales],
        v_scales=[jax.device_put(x, sc) for x in cache.v_scales],
    )


def test_tp_decode_matches_single(cpu_mesh_devices):
    mesh = make_mesh(1, 2, devices=cpu_mesh_devices[:2])
    params = init_params(CFG, jax.random.PRNGKey(0))
    cache = init_cache(CFG, num_pages=8, page_size=64)

    prompt = np.zeros((1, 128), np.int32)
    prompt[0, :20] = np.arange(20) % 128
    pt = np.full(4, -1, np.int32)
    pt[:2] = [0, 1]
    logits0, cache = prefill(params, jnp.asarray(prompt), CFG, cache,
                             jnp.asarray(pt), prompt_len=20, interpret=True)

    tokens = jnp.asarray([int(jnp.argmax(logits0))], jnp.int32)
    lengths = jnp.asarray([21], jnp.int32)
    tables = jnp.asarray(pt)[None, :]

    # decode_step donates its cache: keep an undonated copy for the TP run.
    cache_copy = jax.tree_util.tree_map(lambda x: x.copy(), cache)

    # Single-device decode.
    logits_single, _ = decode_step(params, tokens, CFG, cache,
                                   lengths, tables, interpret=True)

    # Tensor-parallel decode on the 2-device mesh.
    sharded_params = shard_params(params, mesh)
    sharded_cache = _shard_cache(cache_copy, mesh)
    with mesh:
        logits_tp, cache_tp = decode_step(
            sharded_params, tokens, CFG, sharded_cache, lengths, tables,
            interpret=True, mesh=mesh)

    # TP splits every matmul's reduction (partial products all-reduce after),
    # so logits differ by bf16 accumulation-order noise, not semantics.
    err = float(jnp.max(jnp.abs(logits_tp - logits_single)))
    assert err < 6e-2, err
    # The sharded cache must have recorded the same new K/V rows.
    for a, b in zip(cache_tp.k_pages, cache.k_pages):
        assert a.shape == b.shape


def test_tp_prefill_matches_single(cpu_mesh_devices):
    """prefill(mesh=...): TP prompt pass fills the same pages and logits."""
    mesh = make_mesh(1, 2, devices=cpu_mesh_devices[:2])
    params = init_params(CFG, jax.random.PRNGKey(0))

    prompt = np.zeros((1, 128), np.int32)
    prompt[0, :20] = np.arange(20) % 128
    pt = np.full(4, -1, np.int32)
    pt[:2] = [0, 1]

    cache = init_cache(CFG, num_pages=8, page_size=64)
    logits0, cache0 = prefill(params, jnp.asarray(prompt), CFG, cache,
                              jnp.asarray(pt), prompt_len=20, interpret=True)

    sharded_params = shard_params(params, mesh)
    cache_tp = _shard_cache(init_cache(CFG, num_pages=8, page_size=64), mesh)
    with mesh:
        logits_tp, cache_tp = prefill(
            sharded_params, jnp.asarray(prompt), CFG, cache_tp,
            jnp.asarray(pt), prompt_len=20, interpret=True, mesh=mesh)

    err = float(jnp.max(jnp.abs(logits_tp - logits0)))
    assert err < 6e-2, err
    # The written K rows (pages 0-1, first 20 slots) must match.
    k_tp = np.asarray(jax.device_get(cache_tp.k_pages[0]), np.float32)
    k0 = np.asarray(cache0.k_pages[0], np.float32)
    assert np.max(np.abs(k_tp[:, :2] - k0[:, :2])) < 3e-2
    # TP decode continues from the TP-prefilled cache.
    tokens = jnp.asarray([int(jnp.argmax(logits_tp))], jnp.int32)
    with mesh:
        logits_d, _ = decode_step(sharded_params, tokens, CFG, cache_tp,
                                  jnp.asarray([21], jnp.int32),
                                  jnp.asarray(pt)[None, :], interpret=True,
                                  mesh=mesh)
    assert np.isfinite(np.asarray(logits_d, np.float32)).all()
