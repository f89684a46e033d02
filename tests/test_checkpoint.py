"""Checkpoint round trip: save -> restore -> identical training trajectory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_from_scratch_tpu.models.llama import (
    LlamaConfig, init_params, quantize_params,
)
from flash_attention_from_scratch_tpu.models.train import (
    make_optimizer, make_train_step,
)
from flash_attention_from_scratch_tpu.utils.checkpoint import (
    latest_step, restore_checkpoint, save_checkpoint,
)

CFG = LlamaConfig(vocab_size=128, dim=256, n_layers=1, n_heads=2,
                  n_kv_heads=1, d_head=128, hidden_dim=256,
                  block_q=128, block_kv=128)


def test_roundtrip_and_resume(tmp_path):
    params = init_params(CFG, jax.random.PRNGKey(0))
    opt = make_optimizer(lr=1e-2)
    opt_state = opt.init(params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 129), 0, 128)
    step = jax.jit(make_train_step(CFG, opt))

    params, opt_state, _ = step(params, opt_state, tokens)
    save_checkpoint(str(tmp_path), {"params": params, "opt": opt_state}, 1)
    assert latest_step(str(tmp_path)) == 1

    # Diverge in memory, then restore and re-run: trajectories must match.
    p2, o2, loss_a = step(params, opt_state, tokens)
    restored = restore_checkpoint(str(tmp_path),
                                  {"params": params, "opt": opt_state})
    p3, o3, loss_b = step(restored["params"], restored["opt"], tokens)
    assert float(loss_a) == float(loss_b)
    for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_params_roundtrip(tmp_path):
    params = quantize_params(init_params(CFG, jax.random.PRNGKey(0)), "int8")
    save_checkpoint(str(tmp_path), params, 0)
    restored = restore_checkpoint(str(tmp_path), params)
    w0 = params["layers"][0]["wq"]
    w1 = restored["layers"][0]["wq"]
    assert w1.mode == "int8"
    np.testing.assert_array_equal(np.asarray(w0.values), np.asarray(w1.values))
    np.testing.assert_array_equal(np.asarray(w0.scales), np.asarray(w1.scales))
