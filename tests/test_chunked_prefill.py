"""Chunked prefill: offset-causal chunks over the paged cache vs one-shot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_from_scratch_tpu.models.decode import (
    decode_step, init_cache, prefill, prefill_chunked,
)
from flash_attention_from_scratch_tpu.models.llama import (
    LlamaConfig, init_params,
)

CFG = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=2,
                  n_kv_heads=1, d_head=128, hidden_dim=256,
                  block_q=128, block_kv=128)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


def _prompt(prompt_len, pad_to):
    arr = np.zeros((1, pad_to), np.int32)
    arr[0, :prompt_len] = (np.arange(prompt_len) * 7 + 3) % 256
    return jnp.asarray(arr)


@pytest.mark.parametrize("prompt_len", [300, 384])
def test_chunked_matches_one_shot_dense(params, prompt_len):
    tokens = _prompt(prompt_len, 384)
    pt = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)

    logits0, cache0 = prefill(params, tokens, CFG,
                              init_cache(CFG, 8, 64), pt,
                              prompt_len=prompt_len, interpret=True)
    logits1, cache1 = prefill_chunked(params, tokens, CFG,
                                      init_cache(CFG, 8, 64), pt,
                                      prompt_len=prompt_len,
                                      chunk_tokens=128, interpret=True)
    # Same math, different block boundaries: bf16 reorder noise only.
    err = float(jnp.max(jnp.abs(logits1 - logits0)))
    assert err < 0.05, err
    # Cache entries are bf16 activations of the previous layer; the two
    # paths run different (but equivalent) kernel split configs, so values
    # may differ by a rounding step at magnitude ~8 (1 ulp = 0.0625).
    for a, b in zip(cache1.k_pages, cache0.k_pages):
        diff = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))
        assert diff < 0.05, diff


@pytest.mark.slow
def test_chunked_prefill_int8_decode_continues(params):
    """Quantized cache: chunked prefill + decode stays near the dense path.

    Chunk-0 scale calibration differs from whole-prompt calibration, so
    compare the *decode logits* (the end-to-end quantity) with int8 slack.
    """
    prompt_len = 300
    tokens = _prompt(prompt_len, 384)
    pt = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)

    logits0, cache0 = prefill(params, tokens, CFG,
                              init_cache(CFG, 8, 64, "int8"), pt,
                              prompt_len=prompt_len, interpret=True)
    logits1, cache1 = prefill_chunked(params, tokens, CFG,
                                      init_cache(CFG, 8, 64, "int8"), pt,
                                      prompt_len=prompt_len,
                                      chunk_tokens=128, interpret=True)
    assert float(jnp.max(jnp.abs(logits1 - logits0))) < 0.35

    nxt = jnp.asarray([int(jnp.argmax(logits1))], jnp.int32)
    lengths = jnp.asarray([prompt_len + 1], jnp.int32)
    d0, _ = decode_step(params, nxt, CFG, cache0, lengths, pt[None, :],
                        interpret=True)
    d1, _ = decode_step(params, nxt, CFG, cache1, lengths, pt[None, :],
                        interpret=True)
    assert float(jnp.max(jnp.abs(d1 - d0))) < 0.35


def test_chunk_tokens_validation(params):
    tokens = _prompt(100, 128)
    with pytest.raises(ValueError, match="chunk_tokens"):
        prefill_chunked(params, tokens, CFG, init_cache(CFG, 8, 64),
                        jnp.asarray([0, 1], jnp.int32), prompt_len=100,
                        chunk_tokens=96, interpret=True)


@pytest.mark.slow
def test_server_with_chunked_prefill(params):
    """The serving loop routes admissions through prefill_chunked."""
    from flash_attention_from_scratch_tpu.serving.generate import (
        GenerationServer)

    prompts = {1: list(range(10, 180)), 2: list(range(40, 45))}
    runs = {}
    for pct in (0, 128):
        server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                                  max_batch=2, pages_per_seq=8,
                                  prefill_chunk_tokens=pct)
        for sid, p in prompts.items():
            server.submit(sid, p, 4)
        runs[pct] = server.run()
    # Dense cache: chunked and one-shot prefill are the same math modulo
    # bf16 block-boundary reorder; greedy trajectories should agree.
    assert runs[0] == runs[128], runs


def test_chunked_int4_cache(params):
    """INT4 packed pages: the prefix gather unpacks nibbles in token order."""
    prompt_len = 300
    tokens = _prompt(prompt_len, 384)
    pt = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)
    logits0, _ = prefill(params, tokens, CFG,
                         init_cache(CFG, 8, 64, "int4"), pt,
                         prompt_len=prompt_len, interpret=True)
    logits1, _ = prefill_chunked(params, tokens, CFG,
                                 init_cache(CFG, 8, 64, "int4"), pt,
                                 prompt_len=prompt_len,
                                 chunk_tokens=128, interpret=True)
    assert float(jnp.max(jnp.abs(logits1 - logits0))) < 1.0
