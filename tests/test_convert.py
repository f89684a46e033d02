"""HF Llama conversion: our forward must match transformers' forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from flash_attention_from_scratch_tpu.models.convert import (  # noqa: E402
    config_from_hf, from_hf_llama,
)
from flash_attention_from_scratch_tpu.models.llama import forward  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=128, max_position_embeddings=512, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        attention_bias=False, mlp_bias=False,
    )
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    return model


def test_config_from_hf(hf_model):
    cfg = config_from_hf(hf_model.config, block_q=128, block_kv=128)
    assert (cfg.dim, cfg.n_layers, cfg.n_heads, cfg.n_kv_heads, cfg.d_head) \
        == (256, 2, 2, 1, 128)
    assert cfg.hidden_dim == 512 and cfg.vocab_size == 256


def test_hf_forward_parity(hf_model):
    """Converted weights reproduce HF's logits through our flash kernel."""
    cfg = config_from_hf(hf_model.config, block_q=128, block_kv=128)
    params, cfg = from_hf_llama(hf_model, cfg, dtype=jnp.float32)

    tokens = np.arange(128)[None, :] % 256
    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens)).logits.float().numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens), cfg,
                             interpret=True), np.float32)
    err = np.max(np.abs(got - ref))
    # fp32 weights, bf16-free path; differences are kernel-order only.
    assert err < 2e-2, err
    # Not vacuous: logits have real dynamic range.
    assert np.max(np.abs(ref)) > 1.0


def test_hf_conversion_quantized_decode(hf_model):
    """Quantized conversion serves tokens near HF's greedy trajectory."""
    from flash_attention_from_scratch_tpu.serving.generate import (
        GenerationServer)

    cfg = config_from_hf(hf_model.config, block_q=128, block_kv=128)
    params, cfg = from_hf_llama(hf_model, cfg, dtype=jnp.float32,
                                quantize="int8")
    server = GenerationServer(params, cfg, num_pages=16, page_size=64,
                              max_batch=1, pages_per_seq=8)
    prompt = list(range(10, 40))
    server.submit(1, prompt, 4)
    got = server.run()[1]
    assert len(got) == 4

    toks = list(prompt)
    for g in got:
        with torch.no_grad():
            logits = hf_model(torch.tensor([toks])).logits[0, -1].float()
        gap = float(logits.max() - logits[g])
        assert gap <= 0.6, (toks, g, gap)  # int8 weight rounding slack
        toks.append(g)


def test_raw_state_dict_and_tied_embeddings(hf_model):
    sd = {k: v for k, v in hf_model.state_dict().items()
          if k != "lm_head.weight"}  # simulate tied embeddings
    cfg = config_from_hf(hf_model.config, block_q=128, block_kv=128)
    params, _ = from_hf_llama(sd, cfg, dtype=jnp.float32)
    assert params["lm_head"].shape == (cfg.dim, cfg.vocab_size)
    np.testing.assert_array_equal(np.asarray(params["lm_head"]),
                                  np.asarray(params["embed"]).T)
    with pytest.raises(ValueError, match="cfg"):
        from_hf_llama(sd)


def test_qwen2_style_attention_biases():
    """attention_bias=True checkpoints convert and match HF's forward."""
    torch.manual_seed(1)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=128, max_position_embeddings=512, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        attention_bias=True, mlp_bias=False,
    )
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    # HF inits biases to zero; give them real values so the test bites.
    with torch.no_grad():
        for layer in model.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(std=0.5)
    cfg = config_from_hf(model.config, block_q=128, block_kv=128)
    params, cfg = from_hf_llama(model, cfg, dtype=jnp.float32)
    assert "bq" in params["layers"][0]

    tokens = (np.arange(128)[None, :] * 3 + 1) % 256
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.float().numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens), cfg,
                             interpret=True), np.float32)
    assert np.max(np.abs(got - ref)) < 2e-2

    # Unsupported leftovers (e.g. o_proj bias) must be refused, not dropped.
    from flash_attention_from_scratch_tpu.models.llama import fuse_projections
    with pytest.raises(NotImplementedError, match="fuse"):
        fuse_projections(params)


def test_load_hf_checkpoint_safetensors(hf_model, tmp_path):
    """Directory-of-safetensors loading (no torch module instantiation)."""
    from flash_attention_from_scratch_tpu.models.convert import (
        load_hf_checkpoint)

    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert cfg.dim == 256 and cfg.n_layers == 2

    tokens = np.arange(128)[None, :] % 256
    with torch.no_grad():
        ref = hf_model(torch.tensor(tokens)).logits.float().numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens), cfg,
                             interpret=True), np.float32)
    assert np.max(np.abs(got - ref)) < 2e-2


@pytest.mark.slow
def test_gemma2_forward_parity():
    """Gemma-2: GeGLU + sandwich norms + softcaps + scaled embeddings +
    alternating windows — our forward must match transformers' Gemma2."""
    from flash_attention_from_scratch_tpu.models.convert import (
        from_hf_gemma2)

    torch.manual_seed(2)
    hf_cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=128, max_position_embeddings=512, rope_theta=10000.0,
        rms_norm_eps=1e-6, query_pre_attn_scalar=144,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sliding_window=64, attention_dropout=0.0,
    )
    model = transformers.Gemma2ForCausalLM(hf_cfg)
    model.eval()
    params, cfg = from_hf_gemma2(model, dtype=jnp.float32)
    cfg = __import__("dataclasses").replace(cfg, block_q=128, block_kv=128)
    assert cfg.mlp_act == "gelu" and cfg.post_norms and cfg.embed_scale
    assert cfg.window_pattern == (64, 0)
    assert abs(cfg.attn_scale - 144 ** -0.5) < 1e-9

    tokens = (np.arange(192)[None, :] * 5 + 3) % 256  # > window, 2 layers
    with torch.no_grad():
        ref = model(torch.tensor(tokens)).logits.float().numpy()
    # seq must be a block multiple for the kernel: pad and compare real rows.
    pad = np.zeros((1, 256), np.int64)
    pad[0, :192] = tokens
    got = np.asarray(forward(params, jnp.asarray(pad), cfg,
                             interpret=True), np.float32)[:, :192]
    err = np.max(np.abs(got - ref))
    assert err < 3e-2, err
    assert np.max(np.abs(ref)) > 1.0


def test_gemma2_serving():
    """Gemma-2 through the full continuous-batching loop (paged decode with
    softcap + alternating windows + sandwich norms) vs HF greedy."""
    from flash_attention_from_scratch_tpu.models.convert import (
        from_hf_gemma2)
    from flash_attention_from_scratch_tpu.serving.generate import (
        GenerationServer)

    torch.manual_seed(2)
    hf_cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=128, max_position_embeddings=512, rope_theta=10000.0,
        rms_norm_eps=1e-6, query_pre_attn_scalar=144,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sliding_window=64, attention_dropout=0.0,
    )
    model = transformers.Gemma2ForCausalLM(hf_cfg)
    model.eval()
    params, cfg = from_hf_gemma2(model, dtype=jnp.float32)
    cfg = __import__("dataclasses").replace(cfg, block_q=128, block_kv=128)

    server = GenerationServer(params, cfg, num_pages=16, page_size=64,
                              max_batch=1, pages_per_seq=8)
    prompt = [(i * 7 + 1) % 256 for i in range(100)]
    server.submit(1, prompt, 4)
    got = server.run()[1]
    assert len(got) == 4

    toks = list(prompt)
    for g in got:
        with torch.no_grad():
            logits = model(torch.tensor([toks])).logits[0, -1].float()
        gap = float(logits.max() - logits[g])
        assert gap <= 0.1, (len(toks), g, int(logits.argmax()), gap)
        toks.append(g)


def test_gemma2_chunked_prefill():
    """Chunked prefill must carry Gemma-2's softcap/window/post-norm math:
    chunked == one-shot prefill on the converted model."""
    from flash_attention_from_scratch_tpu.models.convert import (
        from_hf_gemma2)
    from flash_attention_from_scratch_tpu.models.decode import (
        init_cache, prefill, prefill_chunked)

    torch.manual_seed(2)
    hf_cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=128, max_position_embeddings=512, rope_theta=10000.0,
        rms_norm_eps=1e-6, query_pre_attn_scalar=144,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        sliding_window=64, attention_dropout=0.0,
    )
    model = transformers.Gemma2ForCausalLM(hf_cfg).eval()
    params, cfg = from_hf_gemma2(model, dtype=jnp.float32)
    cfg = __import__("dataclasses").replace(cfg, block_q=128, block_kv=128)

    prompt = np.zeros((1, 256), np.int32)
    prompt[0, :200] = (np.arange(200) * 3 + 5) % 256
    pt = jnp.asarray([0, 1, 2, 3, 4, -1], jnp.int32)
    logits0, _ = prefill(params, jnp.asarray(prompt), cfg,
                         init_cache(cfg, 8, 64), pt, prompt_len=200,
                         interpret=True)
    logits1, _ = prefill_chunked(params, jnp.asarray(prompt), cfg,
                                 init_cache(cfg, 8, 64), pt, prompt_len=200,
                                 chunk_tokens=128, interpret=True)
    assert float(jnp.max(jnp.abs(logits1 - logits0))) < 0.02
