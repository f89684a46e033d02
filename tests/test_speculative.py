"""Speculative decoding: multi-token verify + prompt-lookup drafting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_from_scratch_tpu.models.llama import (
    LlamaConfig, forward, init_params,
)
from flash_attention_from_scratch_tpu.serving.generate import (
    GenerationServer, _prompt_lookup_draft,
)

CFG = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=2,
                  n_kv_heads=1, d_head=128, hidden_dim=256,
                  block_q=128, block_kv=128)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0))


def test_prompt_lookup_draft():
    ctx = [1, 2, 3, 4, 9, 9, 1, 2]
    assert _prompt_lookup_draft(ctx, 3) == [3, 4, 9]
    assert _prompt_lookup_draft([5, 6, 7], 3) == []          # no recurrence
    assert _prompt_lookup_draft([1, 2], 3) == []             # too short
    assert _prompt_lookup_draft([7, 8, 9, 7, 8], 5) == [9, 7, 8]


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
def test_speculative_server(params, mode):
    """spec_k serving produces (near-)greedy trajectories of full length.

    Repetitive prompts make prompt-lookup drafts hit, so acceptance > 0 is
    asserted — the speculation must actually speculate, not just fall back.
    """
    prompts = {
        1: [10, 11, 12, 13] * 6,          # strongly repetitive
        2: list(range(40, 60)),
    }
    server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                              max_batch=2, pages_per_seq=8, mode=mode,
                              spec_k=3)
    for sid, p in prompts.items():
        server.submit(sid, p, 8)
    got = server.run()

    slack = {"dense": 0.07, "int8": 0.4}[mode]
    for sid, p in prompts.items():
        assert len(got[sid]) == 8, (sid, got[sid])
        _check_greedy_path(params, p, got[sid], slack)
    assert server.spec_proposed > 0
    # Greedy continuations of a tiny random model are near-degenerate
    # repetition, so lookup drafts should land at least sometimes.
    assert server.spec_accepted > 0, (server.spec_proposed,
                                      server.spec_accepted)


def test_speculative_matches_plain_greedy(params):
    """Token-for-token equality with plain serving on the dense cache."""
    prompts = {1: [10, 11, 12, 13] * 6}
    runs = {}
    for k in (0, 3):
        server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                                  max_batch=1, pages_per_seq=8, spec_k=k)
        for sid, p in prompts.items():
            server.submit(sid, p, 10)
        runs[k] = server.run()
    # verify_step and decode_step agree to ~1e-2 logits on bf16; a tiny
    # random model can tie near argmax, so allow trajectory divergence only
    # if both remain near-greedy — but start with strict equality, which
    # holds on this fixture.
    assert runs[0] == runs[3], runs


def test_speculative_stop_tokens(params):
    """A stop token inside an accepted draft ends the sequence there."""
    server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                              max_batch=1, pages_per_seq=8, spec_k=3)
    # Discover the greedy continuation first.
    probe = GenerationServer(params, CFG, num_pages=32, page_size=64,
                             max_batch=1, pages_per_seq=8)
    probe.submit(1, [10, 11, 12, 13] * 6, 6)
    greedy = probe.run()[1]
    stop = greedy[3]
    server.submit(1, [10, 11, 12, 13] * 6, 6, stop=(stop,))
    got = server.run()[1]
    assert got[-1] == stop
    assert len(got) <= 4, got


def test_speculative_tensor_parallel():
    """spec_k through the TP serving path on a 2-device mesh."""
    from flash_attention_from_scratch_tpu.parallel.mesh import make_mesh

    cfg2 = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=2,
                       n_kv_heads=2, d_head=128, hidden_dim=256,
                       block_q=128, block_kv=128)
    params2 = init_params(cfg2, jax.random.PRNGKey(1))
    mesh = make_mesh(1, 2, devices=jax.devices("cpu")[:2])
    server = GenerationServer(params2, cfg2, num_pages=32, page_size=64,
                              max_batch=1, pages_per_seq=8, spec_k=3,
                              mesh=mesh)
    server.submit(1, [10, 11, 12, 13] * 6, 6)
    got = server.run()
    assert len(got[1]) == 6

    def naive2(tokens):
        s = len(tokens)
        pad = s + (-s) % 128
        arr = np.zeros((1, pad), np.int32)
        arr[0, :s] = tokens
        return forward(params2, jnp.asarray(arr), cfg2)[0, s - 1]

    toks = [10, 11, 12, 13] * 6
    for g in got[1]:
        logits = naive2(toks)
        assert float(logits.max() - logits[g]) <= 0.1, (toks, g)
        toks.append(g)


def test_spec_k_validation(params):
    with pytest.raises(ValueError, match="exclusive"):
        GenerationServer(params, CFG, num_pages=16, page_size=64,
                         max_batch=1, spec_k=2, chunk=4)


def test_spec_accept_sample_exact_distribution():
    """Delta-proposal speculative sampling reproduces softmax(p) exactly.

    For ONE drafted token d: P(emit d) must be p(d) and P(emit x != d)
    must be p(x) — accept-with-p(d) plus the renormalized residual. Checked
    empirically over 20k keys on an 8-token vocab.
    """
    from flash_attention_from_scratch_tpu.models.decode import (
        spec_accept_sample)

    vocab, n = 8, 20000
    logits = jnp.asarray(
        [[0.5, -0.2, 1.3, 0.0, -1.0, 0.7, 0.1, -0.4]], jnp.float32)
    p = np.asarray(jax.nn.softmax(logits[0]))
    draft = 2  # the highest-probability token (stressing acceptance)
    lg = jnp.broadcast_to(logits[:, None, :], (1, 2, vocab))

    def one(key):
        toks, n_emit = spec_accept_sample(
            lg, jnp.asarray([[draft]], jnp.int32),
            jnp.asarray([1], jnp.int32), key[None], temperature=1.0)
        return toks[0, 0]

    keys = jax.random.split(jax.random.PRNGKey(0), n)
    first = np.asarray(jax.vmap(one)(keys))
    emp = np.bincount(first, minlength=vocab) / n
    # Multinomial std ~ sqrt(p(1-p)/n) < 0.004; allow 4 sigma.
    assert np.max(np.abs(emp - p)) < 0.016, (emp, p)

    # EMPTY draft (draft_lens = 0, the common no-lookup-match case): the
    # bonus token must come from plain p — in particular token id 0 (the
    # pad value) must NOT be masked out (regression: `n_acc < k` treated
    # the accepted empty draft as a rejection of pad token 0).
    def one_empty(key):
        toks, n_emit = spec_accept_sample(
            lg, jnp.asarray([[0]], jnp.int32),
            jnp.asarray([0], jnp.int32), key[None], temperature=1.0)
        return toks[0, 0]

    first0 = np.asarray(jax.vmap(one_empty)(keys))
    emp0 = np.bincount(first0, minlength=vocab) / n
    assert np.max(np.abs(emp0 - p)) < 0.016, (emp0, p)
    assert emp0[0] > 0.5 * p[0]  # token 0 must be reachable


def test_speculative_sampled_serving(params):
    """Temperature spec serving: correct lengths, deterministic with seed."""
    runs = []
    for _ in range(2):
        server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                                  max_batch=2, pages_per_seq=8, spec_k=3,
                                  temperature=0.8, top_k=20, seed=11)
        server.submit(1, [10, 11, 12, 13] * 6, 8)
        server.submit(2, list(range(40, 60)), 8)
        runs.append(server.run())
    assert runs[0] == runs[1], runs  # same seed, same trajectory
    for sid in (1, 2):
        assert len(runs[0][sid]) == 8
        assert all(0 <= t < CFG.vocab_size for t in runs[0][sid])
