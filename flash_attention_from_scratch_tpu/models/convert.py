"""HuggingFace checkpoint conversion: real Llama weights into this framework.

A user switching from a torch serving stack needs their weights to come
along: ``from_hf_llama`` maps a ``transformers`` Llama(-compatible) model or
state dict onto this repo's param pytree and ``LlamaConfig``, optionally
quantizing the projections on the way in (weight-only INT8/INT4 or W8A8 —
the same recipes ``models.llama.quantize_params`` applies to random init).

Layout notes (verified against transformers' modeling_llama):
- HF ``nn.Linear`` weights are (out_features, in_features); this framework
  right-multiplies, so every projection transposes to (in, out).
- HF rotary embedding uses the half-split rotate_half convention — exactly
  ``models.llama.apply_rope`` — and the same inverse-frequency table, so
  positions line up with no permutation.
- ``lm_head`` may be tied to the embedding (``tie_word_embeddings``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.configs import DType
from .llama import LlamaConfig, quantize_params

__all__ = ["from_hf_llama", "from_hf_gemma2", "config_from_hf",
           "load_hf_checkpoint"]


def config_from_hf_gemma2(hf_config, **overrides) -> LlamaConfig:
    """LlamaConfig for a transformers Gemma2Config.

    Gemma-2 deltas captured by the generic decoder knobs: GeGLU MLP,
    sandwich norms, sqrt(dim)-scaled embeddings, attention/final logit
    softcaps, query_pre_attn_scalar attention scale, and the alternating
    local/global window pattern (layer_types: even layers sliding).
    """
    fields = dict(
        vocab_size=hf_config.vocab_size,
        dim=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=hf_config.num_key_value_heads,
        d_head=hf_config.head_dim,
        hidden_dim=hf_config.intermediate_size,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        norm_eps=hf_config.rms_norm_eps,
        mlp_act="gelu",
        post_norms=True,
        embed_scale=True,
        attn_softcap=getattr(hf_config, "attn_logit_softcapping", 0.0) or 0.0,
        final_softcap=getattr(hf_config, "final_logit_softcapping", 0.0) or 0.0,
        attn_scale=hf_config.query_pre_attn_scalar ** -0.5,
        window_pattern=(hf_config.sliding_window, 0),
    )
    fields.update(overrides)
    return LlamaConfig(**fields)


def from_hf_gemma2(model, cfg: LlamaConfig | None = None, *,
                   dtype=jnp.float32):
    """Convert a transformers Gemma2ForCausalLM to params.

    Gemma RMSNorm scales by (1 + weight); the converter folds the +1 into
    the stored weight so the framework's plain RMSNorm applies unchanged.
    Embeddings are always tied (lm_head = embed^T).
    """
    if cfg is None:
        cfg = config_from_hf_gemma2(model.config)
    cfg_dtype = DType.from_jnp(dtype)
    if cfg.dtype != cfg_dtype:
        import dataclasses

        cfg = dataclasses.replace(cfg, dtype=cfg_dtype)
    sd = {k[len("model."):] if k.startswith("model.") else k: v
          for k, v in model.state_dict().items()}
    dt = dtype

    def w(name, transpose=True):
        arr = _to_np(sd.pop(name))
        return jnp.asarray(arr.T if transpose else arr, dt)

    def norm(name):
        return jnp.asarray(1.0 + _to_np(sd.pop(name)), dt)

    embed = w("embed_tokens.weight", transpose=False)
    params = {
        "embed": embed,
        "final_norm": norm("norm.weight"),
        "lm_head": embed.T,
        "layers": [],
    }
    sd.pop("lm_head.weight", None)  # tied
    for i in range(cfg.n_layers):
        pre = f"layers.{i}."
        params["layers"].append({
            "attn_norm": norm(pre + "input_layernorm.weight"),
            "wq": w(pre + "self_attn.q_proj.weight"),
            "wk": w(pre + "self_attn.k_proj.weight"),
            "wv": w(pre + "self_attn.v_proj.weight"),
            "wo": w(pre + "self_attn.o_proj.weight"),
            "attn_post_norm": norm(pre + "post_attention_layernorm.weight"),
            "mlp_norm": norm(pre + "pre_feedforward_layernorm.weight"),
            "w_gate": w(pre + "mlp.gate_proj.weight"),
            "w_up": w(pre + "mlp.up_proj.weight"),
            "w_down": w(pre + "mlp.down_proj.weight"),
            "mlp_post_norm": norm(pre + "post_feedforward_layernorm.weight"),
        })
    leftover = [k for k in sd if not k.endswith("rotary_emb.inv_freq")]
    if leftover:
        raise ValueError(f"unmapped Gemma2 weights: {sorted(leftover)[:8]}")
    return params, cfg


def load_hf_checkpoint(path, cfg: LlamaConfig | None = None, **kw):
    """Load a HF Llama checkpoint directory straight from safetensors.

    Streams tensors from ``model*.safetensors`` shards without
    instantiating a torch model (an 8B bf16 torch module would double host
    memory); config.json supplies the architecture when ``cfg`` is None.
    Extra keyword args go to :func:`from_hf_llama` (dtype/quantize/act).
    """
    import glob
    import json
    import os
    import types

    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors shards under {path!r}")
    sd = {}
    for f in files:
        with safe_open(f, framework="np") as st:
            for k in st.keys():
                sd[k] = st.get_tensor(k)
    if cfg is None:
        with open(os.path.join(path, "config.json")) as f:
            cfg = config_from_hf(types.SimpleNamespace(**json.load(f)))
    return from_hf_llama(sd, cfg, **kw)


def _to_np(t):
    """torch tensor / numpy array -> float32 numpy (no torch import needed
    unless the input is a torch tensor)."""
    if hasattr(t, "detach"):
        t = t.detach().to("cpu").float().numpy()
    return np.asarray(t, np.float32)


def config_from_hf(hf_config, **overrides) -> LlamaConfig:
    """LlamaConfig from a transformers LlamaConfig(-like) object."""
    d_head = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads)
    rope_scaling = getattr(hf_config, "rope_scaling", None) or {}
    fields = dict(
        vocab_size=hf_config.vocab_size,
        dim=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=getattr(hf_config, "num_key_value_heads",
                           hf_config.num_attention_heads),
        d_head=d_head,
        hidden_dim=hf_config.intermediate_size,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        norm_eps=getattr(hf_config, "rms_norm_eps", 1e-5),
        sliding_window=getattr(hf_config, "sliding_window", None) or 0,
    )
    if rope_scaling.get("rope_type") == "llama3":
        fields.update(
            rope_scale_factor=rope_scaling["factor"],
            rope_low_factor=rope_scaling.get("low_freq_factor", 1.0),
            rope_high_factor=rope_scaling.get("high_freq_factor", 4.0),
            rope_orig_ctx=rope_scaling.get(
                "original_max_position_embeddings", 8192),
        )
    fields.update(overrides)
    return LlamaConfig(**fields)


def from_hf_llama(model_or_state_dict, cfg: LlamaConfig | None = None, *,
                  dtype=jnp.bfloat16, quantize: str | None = None,
                  act: str = "bf16"):
    """Convert a transformers Llama model (or its state dict) to params.

    Args:
      model_or_state_dict: a ``LlamaForCausalLM`` (config is read from it)
        or a raw ``state_dict()``-style mapping (then ``cfg`` is required).
      quantize: None | "int8" | "int4" — weight-only quantization of every
        projection on the way in; ``act="int8"`` selects the W8A8/W4A8
        matmul recipe.

    Returns (params, cfg).
    """
    if hasattr(model_or_state_dict, "state_dict"):
        if cfg is None:
            cfg = config_from_hf(model_or_state_dict.config)
        sd = model_or_state_dict.state_dict()
    else:
        if cfg is None:
            raise ValueError("cfg is required when passing a raw state dict")
        sd = dict(model_or_state_dict)
    cfg_dtype = DType.from_jnp(dtype)
    if cfg.dtype != cfg_dtype:
        import dataclasses

        cfg = dataclasses.replace(cfg, dtype=cfg_dtype)
    # transformers prefixes weights with "model."; accept both forms.
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):] if k.startswith("model.") else k: v
              for k, v in sd.items()}

    dt = dtype

    def w(name, transpose=True):
        arr = _to_np(sd[name])
        if transpose:
            arr = arr.T  # HF Linear (out, in) -> right-multiply (in, out)
        return jnp.asarray(arr, dt)

    embed = w("embed_tokens.weight", transpose=False)
    if "lm_head.weight" in sd:
        lm_head = w("lm_head.weight")
    else:  # tie_word_embeddings
        lm_head = embed.T
    params = {
        "embed": embed,
        "final_norm": w("norm.weight", transpose=False),
        "lm_head": lm_head,
        "layers": [],
    }
    for i in range(cfg.n_layers):
        pre = f"layers.{i}."
        layer = {
            "attn_norm": w(pre + "input_layernorm.weight", transpose=False),
            "wq": w(pre + "self_attn.q_proj.weight"),
            "wk": w(pre + "self_attn.k_proj.weight"),
            "wv": w(pre + "self_attn.v_proj.weight"),
            "wo": w(pre + "self_attn.o_proj.weight"),
            "mlp_norm": w(pre + "post_attention_layernorm.weight",
                          transpose=False),
            "w_gate": w(pre + "mlp.gate_proj.weight"),
            "w_up": w(pre + "mlp.up_proj.weight"),
            "w_down": w(pre + "mlp.down_proj.weight"),
        }
        if pre + "self_attn.q_proj.bias" in sd:  # Qwen2-style QKV biases
            layer["bq"] = w(pre + "self_attn.q_proj.bias", transpose=False)
            layer["bk"] = w(pre + "self_attn.k_proj.bias", transpose=False)
            layer["bv"] = w(pre + "self_attn.v_proj.bias", transpose=False)
        if pre + "self_attn.o_proj.bias" in sd:
            layer["bo"] = w(pre + "self_attn.o_proj.bias", transpose=False)
        params["layers"].append(layer)
    consumed = {"embed_tokens.weight", "norm.weight", "lm_head.weight"}
    for i in range(cfg.n_layers):
        pre = f"layers.{i}."
        consumed |= {
            pre + "input_layernorm.weight",
            pre + "self_attn.q_proj.weight", pre + "self_attn.k_proj.weight",
            pre + "self_attn.v_proj.weight", pre + "self_attn.o_proj.weight",
            pre + "post_attention_layernorm.weight",
            pre + "mlp.gate_proj.weight", pre + "mlp.up_proj.weight",
            pre + "mlp.down_proj.weight",
            pre + "self_attn.q_proj.bias", pre + "self_attn.k_proj.bias",
            pre + "self_attn.v_proj.bias", pre + "self_attn.o_proj.bias",
        }
    leftover = [k for k in sd
                if k not in consumed and not k.endswith("rotary_emb.inv_freq")]
    if leftover:
        # Silently dropping weights (e.g. attention/MLP biases of a
        # "Llama-compatible" checkpoint) would produce a wrong model with no
        # signal; refuse instead.
        raise ValueError(
            f"unmapped weights in checkpoint (unsupported architecture "
            f"variant?): {sorted(leftover)[:8]}"
            + (" ..." if len(leftover) > 8 else ""))
    if quantize:
        params = quantize_params(params, quantize, act=act)
    return params, cfg
