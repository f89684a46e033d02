"""Llama model tests: shapes, numerics vs naive attention, gradient flow."""

import jax
import jax.numpy as jnp
import pytest

from flash_attention_from_scratch_tpu.models.llama import (
    LlamaConfig, forward, init_params, loss_fn,
)

CFG = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=2, n_kv_heads=1,
                  d_head=128, hidden_dim=512, block_q=128, block_kv=128)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def tokens():
    return jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, CFG.vocab_size)


def test_forward_shape_dtype(params, tokens):
    logits = forward(params, tokens, CFG)
    assert logits.shape == (2, 128, CFG.vocab_size)
    assert logits.dtype == jnp.float32


def test_forward_matches_reference_attention(params, tokens):
    """Swapping the kernel for the jnp oracle must not change the logits
    beyond bf16 noise — catches wiring bugs (RoPE, GQA repeat, causal)."""
    from flash_attention_from_scratch_tpu.models import llama as llama_mod
    from flash_attention_from_scratch_tpu.ops.reference import reference_attention

    logits_kernel = forward(params, tokens, CFG)

    orig = llama_mod.flash_attention
    llama_mod.flash_attention = (
        lambda q, k, v, cfg, interpret=None: reference_attention(
            q, k, v, causal=cfg.causal
        )
    )
    try:
        logits_ref = forward(params, tokens, CFG)
    finally:
        llama_mod.flash_attention = orig

    diff = jnp.max(jnp.abs(logits_kernel - logits_ref))
    assert diff < 0.1, f"kernel vs reference logits max diff {diff}"


def test_loss_and_grad(params):
    # 129 tokens -> model seq 128 after the next-token shift.
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 129), 0, CFG.vocab_size)
    loss, grads = jax.value_and_grad(lambda p: loss_fn(p, tokens, CFG))(params)
    assert jnp.isfinite(loss)
    g = grads["layers"][0]["wq"]
    assert jnp.isfinite(g).all()
    assert float(jnp.abs(g).max()) > 0.0  # gradient actually flows through attention
