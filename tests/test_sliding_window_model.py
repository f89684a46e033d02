"""Sliding-window attention end to end: prefill, decode, serving.

Cross-checks two independent kernel paths: the flash prefill kernel
(window masking + block skipping) against the paged decode kernel
(window masking + page-DMA skipping) — the served greedy tokens must be
near-argmax of the full windowed forward pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_from_scratch_tpu.models.llama import (
    LlamaConfig, forward, init_params,
)
from flash_attention_from_scratch_tpu.serving.generate import GenerationServer

CFG = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=2,
                  n_kv_heads=1, d_head=128, hidden_dim=256,
                  block_q=128, block_kv=128, sliding_window=128)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


def _naive_logits(params, tokens):
    s = len(tokens)
    pad = s + (-s) % 128
    arr = np.zeros((1, pad), np.int32)
    arr[0, :s] = tokens
    return forward(params, jnp.asarray(arr), CFG)[0, s - 1]


def test_windowed_serving_matches_forward(params):
    """Greedy serving with a 128-token window vs the windowed dense pass.

    The prompt is longer than the window, so the window genuinely masks —
    and the full-causal model would pick different tokens (checked below).
    """
    prompt = [(i * 11 + 2) % 256 for i in range(200)]
    server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                              max_batch=1, pages_per_seq=8)
    server.submit(1, prompt, 6)
    got = server.run()
    toks = list(prompt)
    for g in got[1]:
        logits = _naive_logits(params, toks)
        gap = float(logits.max() - logits[g])
        assert gap <= 0.07, (len(toks), g, int(jnp.argmax(logits)), gap)
        toks.append(g)

    # Sanity: the window changes the distribution vs full causal attention.
    full_cfg = LlamaConfig(**{**CFG.__dict__, "sliding_window": 0})
    pad = len(prompt) + (-len(prompt)) % 128
    arr = np.zeros((1, pad), np.int32)
    arr[0, :len(prompt)] = prompt
    lw = forward(params, jnp.asarray(arr), CFG)[0, len(prompt) - 1]
    lf = forward(params, jnp.asarray(arr), full_cfg)[0, len(prompt) - 1]
    assert float(jnp.max(jnp.abs(lw - lf))) > 0.01


def test_windowed_speculative(params):
    """Window composes with multi-token speculative verification."""
    server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                              max_batch=1, pages_per_seq=8, spec_k=3)
    prompt = [10, 11, 12, 13] * 40  # 160 tokens > window
    server.submit(1, prompt, 6)
    got = server.run()
    assert len(got[1]) == 6
    toks = list(prompt)
    for g in got[1]:
        logits = _naive_logits(params, toks)
        assert float(logits.max() - logits[g]) <= 0.07, (len(toks), g)
        toks.append(g)


def test_window_training(params):
    """Mistral trains: windowed grads flow and two steps lower the loss.

    (Round 2 this raised NotImplementedError; the backward kernels now
    thread the window mask — see ops/flash_backward.py.)
    """
    from flash_attention_from_scratch_tpu.models.llama import loss_fn
    from flash_attention_from_scratch_tpu.models.train import (
        make_optimizer, make_train_step,
    )

    p = params
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 257), 0, 256)
    opt = make_optimizer(lr=1e-2)
    opt_state = opt.init(p)
    step = jax.jit(make_train_step(CFG, opt))
    l0 = float(loss_fn(p, tokens, CFG))
    for _ in range(2):
        p, opt_state, _ = step(p, opt_state, tokens)
    l1 = float(loss_fn(p, tokens, CFG))
    assert l1 < l0, (l0, l1)
    # The windowed loss differs from full causal (the mask reaches the loss).
    full_cfg = LlamaConfig(**{**CFG.__dict__, "sliding_window": 0})
    assert abs(float(loss_fn(params, tokens, full_cfg)) -
               float(loss_fn(params, tokens, CFG))) > 1e-4


def test_alternating_window_pattern(params):
    """Gemma-2-style local/global alternation: layer 0 windowed, layer 1
    global — served tokens match the same pattern's dense forward."""
    cfg = LlamaConfig(**{**CFG.__dict__, "sliding_window": 0,
                         "window_pattern": (128, 0)})
    assert cfg.layer_window(0) == 128 and cfg.layer_window(1) == 0
    server = GenerationServer(params, cfg, num_pages=32, page_size=64,
                              max_batch=1, pages_per_seq=8)
    prompt = [(i * 11 + 2) % 256 for i in range(200)]
    server.submit(1, prompt, 5)
    got = server.run()
    toks = list(prompt)
    for g in got[1]:
        s = len(toks)
        pad = s + (-s) % 128
        arr = np.zeros((1, pad), np.int32)
        arr[0, :s] = toks
        logits = forward(params, jnp.asarray(arr), cfg)[0, s - 1]
        assert float(logits.max() - logits[g]) <= 0.07, (s, g)
        toks.append(g)
    # The pattern differs from both all-global and all-local.
    pad = len(prompt) + (-len(prompt)) % 128
    arr = np.zeros((1, pad), np.int32)
    arr[0, :len(prompt)] = prompt
    lp = forward(params, jnp.asarray(arr), cfg)[0, len(prompt) - 1]
    lg_all = forward(params, jnp.asarray(arr), CFG)[0, len(prompt) - 1]
    assert float(jnp.max(jnp.abs(lp - lg_all))) > 0.005
