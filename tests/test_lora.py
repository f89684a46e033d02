"""Multi-LoRA serving: per-row adapters vs dense merged-weight models."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_from_scratch_tpu.models.llama import (
    LlamaConfig, forward, init_params,
)
from flash_attention_from_scratch_tpu.models.lora import (
    LORA_KEYS, init_lora_adapters,
)
from flash_attention_from_scratch_tpu.serving.generate import GenerationServer

CFG = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=2,
                  n_kv_heads=1, d_head=128, hidden_dim=256,
                  block_q=128, block_kv=128)


@pytest.fixture(scope="module")
def setup():
    params = init_params(CFG, jax.random.PRNGKey(0))
    lora = init_lora_adapters(CFG, n_adapters=2, rank=8,
                              key=jax.random.PRNGKey(7), zero_b=False)
    # Scale the deltas so they matter but don't destabilize a random model.
    lora["layers"] = jax.tree_util.tree_map(
        lambda x: x * 0.3, lora["layers"])
    return params, lora


def _merged_params(params, lora, adapter: int):
    """Dense model with W + alpha * A_a @ B_a folded in (the oracle)."""
    merged = {k: v for k, v in params.items() if k != "layers"}
    merged["layers"] = []
    alpha = float(lora["alpha"])
    for li, layer in enumerate(params["layers"]):
        new = dict(layer)
        for k in LORA_KEYS:
            a, b = lora["layers"][li][k]
            delta = (np.asarray(a[adapter], np.float32)
                     @ np.asarray(b[adapter], np.float32)) * alpha
            new[k] = (np.asarray(layer[k], np.float32) + delta).astype(
                layer[k].dtype)
        merged["layers"].append(new)
    return merged


def _naive_logits(params, tokens):
    s = len(tokens)
    pad = s + (-s) % 128
    arr = np.zeros((1, pad), np.int32)
    arr[0, :s] = tokens
    return forward(params, jnp.asarray(arr), CFG)[0, s - 1]


def test_multi_lora_serving(setup):
    """Three requests — adapter 0, adapter 1, base — batched in ONE server;
    each trajectory teacher-forces against its own merged dense model."""
    params, lora = setup
    server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                              max_batch=3, pages_per_seq=8, lora=lora)
    prompts = {1: (list(range(10, 30)), 0),
               2: (list(range(40, 60)), 1),
               3: (list(range(70, 90)), -1)}
    for sid, (p, ad) in prompts.items():
        server.submit(sid, p, 4, adapter=ad)
    got = server.run()

    oracles = {0: _merged_params(params, lora, 0),
               1: _merged_params(params, lora, 1),
               -1: params}
    for sid, (p, ad) in prompts.items():
        assert len(got[sid]) == 4, (sid, got[sid])
        toks = list(p)
        for g in got[sid]:
            logits = _naive_logits(oracles[ad], toks)
            gap = float(logits.max() - logits[g])
            assert gap <= 0.1, (sid, ad, len(toks), g, gap)
            toks.append(g)

    # Adapters must actually change behavior vs base on these prompts.
    assert got[1] != got[3] or got[2] != got[3]


def test_lora_validation(setup):
    params, lora = setup
    with pytest.raises(ValueError, match="LoRA"):
        GenerationServer(params, CFG, num_pages=16, page_size=64,
                         max_batch=1, lora=lora, spec_k=2)
    server = GenerationServer(params, CFG, num_pages=16, page_size=64,
                              max_batch=1)
    with pytest.raises(ValueError, match="lora"):
        server.submit(1, [1, 2, 3], 2, adapter=0)


@pytest.mark.slow
def test_zero_b_is_identity(setup):
    """Freshly initialized adapters (B = 0) must not change the model."""
    params, _ = setup
    lora0 = init_lora_adapters(CFG, n_adapters=1, rank=4,
                               key=jax.random.PRNGKey(3))
    s1 = GenerationServer(params, CFG, num_pages=16, page_size=64,
                          max_batch=1, lora=lora0)
    s1.submit(1, list(range(10, 30)), 4, adapter=0)
    got1 = s1.run()[1]
    s2 = GenerationServer(params, CFG, num_pages=16, page_size=64,
                          max_batch=1)
    s2.submit(1, list(range(10, 30)), 4)
    assert got1 == s2.run()[1]


def test_from_peft_checkpoint():
    """A real HF PEFT adapter converts and matches peft's own merged model."""
    transformers = pytest.importorskip("transformers")
    peft = pytest.importorskip("peft")
    torch = pytest.importorskip("torch")

    from flash_attention_from_scratch_tpu.models.convert import (
        config_from_hf, from_hf_llama)
    from flash_attention_from_scratch_tpu.models.lora import (
        from_peft_state_dicts)

    torch.manual_seed(0)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=128, max_position_embeddings=512, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        attention_bias=False, mlp_bias=False)
    base = transformers.LlamaForCausalLM(hf_cfg).eval()

    lcfg = peft.LoraConfig(r=8, lora_alpha=16,
                           target_modules=["q_proj", "v_proj"],
                           lora_dropout=0.0, bias="none")
    pmodel = peft.get_peft_model(transformers.LlamaForCausalLM(hf_cfg), lcfg)
    pmodel.base_model.model.load_state_dict(base.state_dict(), strict=False)
    with torch.no_grad():  # non-trivial factors (B inits to zero in peft)
        for n, p in pmodel.named_parameters():
            if "lora_" in n:
                p.normal_(std=0.1)
    pmodel.eval()

    cfg = config_from_hf(hf_cfg, block_q=128, block_kv=128)
    params, cfg = from_hf_llama(base, cfg, dtype=jnp.float32)
    lora = from_peft_state_dicts(
        cfg, [pmodel.state_dict()], rank=8, alpha=16, dtype=jnp.float32)

    server = GenerationServer(params, cfg, num_pages=16, page_size=64,
                              max_batch=1, pages_per_seq=8, lora=lora)
    prompt = list(range(10, 40))
    server.submit(1, prompt, 4, adapter=0)
    got = server.run()[1]

    merged = pmodel.merge_and_unload().eval()
    toks = list(prompt)
    for g in got:
        with torch.no_grad():
            logits = merged(torch.tensor([toks])).logits[0, -1].float()
        gap = float(logits.max() - logits[g])
        assert gap <= 0.1, (len(toks), g, int(logits.argmax()), gap)
        toks.append(g)


def test_lora_chunked_matches_stepwise(setup):
    """chunk=4 with adapters replays the stepwise LoRA trajectory exactly."""
    params, lora = setup
    runs = {}
    for chunk in (1, 4):
        server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                                  max_batch=2, pages_per_seq=8, lora=lora,
                                  chunk=chunk)
        server.submit(1, list(range(10, 30)), 6, adapter=0)
        server.submit(2, list(range(40, 60)), 6, adapter=1)
        runs[chunk] = server.run()
    assert runs[1] == runs[4], runs
