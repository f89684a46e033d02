"""Prefix caching: refcounted shared prompt pages + suffix-only prefill."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_from_scratch_tpu.models.llama import (
    LlamaConfig, forward, init_params,
)
from flash_attention_from_scratch_tpu.serving.generate import (
    GenerationServer, _page_hashes,
)
from flash_attention_from_scratch_tpu.serving.runtime import PagedEngine

CFG = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=2,
                  n_kv_heads=1, d_head=128, hidden_dim=256,
                  block_q=128, block_kv=128)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


def test_engine_prefix_claim_publish_release():
    """Pure engine mechanics: claim, publish, refcount, retire, evict."""
    eng = PagedEngine(8, 64, 4, max_pages_per_seq=4)
    h = _page_hashes(list(range(128)), 64)  # 2 full pages

    eng.add_request_cached(1, 130, 4, h)
    eng.step()
    assert eng.cached_pages(1) == 0  # nothing published yet
    eng.publish(1)

    eng.add_request_cached(2, 130, 4, h)  # identical prompt
    eng.step()
    assert eng.cached_pages(2) == 2
    assert eng.prefix_hits == 2

    # Shared pages: finishing seq 1 must keep them alive for seq 2.
    eng.finish(1)
    eng.step()
    b = eng.step()
    assert 2 in b.ids.tolist()

    # Retire: finishing seq 2 moves the published pages to the LRU, where a
    # NEW identical request can still claim them.
    eng.finish(2)
    eng.add_request_cached(3, 130, 4, h)
    eng.step()
    assert eng.cached_pages(3) == 2
    eng.finish(3)

    # Eviction: a big un-cacheable request must be able to consume retired
    # pages (LRU eviction), after which the hashes no longer match.
    eng.add_request(4, 250, 2)  # 4 pages: forces eviction from the pool of 8
    eng.step()
    eng.finish(4)
    # depending on LIFO order some cached pages may survive; claim count is
    # whatever chain prefix survived — only assert it doesn't crash.
    eng.add_request_cached(5, 130, 4, h)
    eng.step()
    assert 0 <= eng.cached_pages(5) <= 2


def _naive_logits(params, tokens):
    s = len(tokens)
    pad = s + (-s) % 128
    arr = np.zeros((1, pad), np.int32)
    arr[0, :s] = tokens
    return forward(params, jnp.asarray(arr), CFG)[0, s - 1]


def _check_greedy_path(params, prompt, generated, slack):
    tokens = list(prompt)
    for g in generated:
        logits = _naive_logits(params, tokens)
        gap = float(logits.max() - logits[g])
        assert gap <= slack, (tokens, g, int(jnp.argmax(logits)), gap)
        tokens.append(g)


@pytest.mark.parametrize("mode", ["dense", "int8"])
def test_prefix_cached_serving(params, mode):
    """Identical prompts served back-to-back: the second reuses pages and
    still produces a (near-)greedy trajectory."""
    prompt = [(i * 5 + 3) % 256 for i in range(200)]  # 3 full 64-pages
    server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                              max_batch=1, pages_per_seq=8, mode=mode,
                              prefix_cache=True)
    server.submit(1, prompt, 4)
    got1 = server.run()
    assert server.engine.prefix_hits == 0
    server.submit(2, prompt, 4)
    got2 = server.run()
    assert server.engine.prefix_hits > 0, "second request reused no pages"
    assert got1[1] == got2[2], (got1, got2)

    slack = {"dense": 0.07, "int8": 0.4}[mode]
    _check_greedy_path(params, prompt, got2[2], slack)


def test_prefix_cache_divergent_tail(params):
    """Common 128-token prefix, different tails: partial reuse, correct
    per-sequence generations."""
    base = [(i * 7 + 1) % 256 for i in range(128)]
    p1 = base + [5, 6, 7, 8] * 8
    p2 = base + [9, 10, 11, 12] * 8
    server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                              max_batch=2, pages_per_seq=8,
                              prefix_cache=True)
    server.submit(1, p1, 4)
    server.run()
    hits0 = server.engine.prefix_hits
    server.submit(2, p2, 4)
    got = server.run()
    assert server.engine.prefix_hits > hits0  # the shared 2 pages
    _check_greedy_path(params, p2, got[2], 0.07)
