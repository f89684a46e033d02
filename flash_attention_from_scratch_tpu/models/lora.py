"""Multi-LoRA: per-request low-rank adapters batched into one decode step.

Serving N fine-tunes of one base model without N copies of the weights:
adapters live as stacked low-rank factors ``A (n_adapters, in, r)`` /
``B (n_adapters, r, out)`` per projection, and every decode row picks its
own adapter by id — one gather + two skinny einsums per projection, while
the (possibly quantized) base weight stream is shared by the whole batch.
The quantized base matmul is untouched: LoRA deltas add in bf16 on the
side, which is the standard QLoRA-style serving arrangement.

Adapter id -1 = no adapter (the delta rows multiply to zero via a mask,
keeping the step shape-static for jit).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .llama import LlamaConfig

__all__ = ["init_lora_adapters", "lora_delta", "from_peft_state_dicts",
           "LORA_KEYS"]

# Projections that carry adapters (the common attention-only default).
LORA_KEYS = ("wq", "wk", "wv", "wo")

_OUT_DIM = {"wq": lambda c: c.n_heads * c.d_head,
            "wk": lambda c: c.n_kv_heads * c.d_head,
            "wv": lambda c: c.n_kv_heads * c.d_head,
            "wo": lambda c: c.dim}
_IN_DIM = {"wq": lambda c: c.dim, "wk": lambda c: c.dim,
           "wv": lambda c: c.dim, "wo": lambda c: c.n_heads * c.d_head}


def init_lora_adapters(cfg: LlamaConfig, n_adapters: int, rank: int, key,
                       *, alpha: float | None = None, zero_b: bool = True):
    """Stacked adapters for every layer's attention projections.

    Returns a pytree: ``{"alpha": scalar, "layers": [{k: (A, B)}]}`` with
    A ~ N(0, 1/in) and B zero (the standard LoRA init — adapters start as
    identity; load trained factors over them with jax.tree_util).
    """
    alpha = float(alpha if alpha is not None else rank)
    dt = cfg.dtype.jnp_dtype
    layers = []
    keys = jax.random.split(key, cfg.n_layers)
    for li in range(cfg.n_layers):
        ks = jax.random.split(keys[li], len(LORA_KEYS))
        layer = {}
        for k, kk in zip(LORA_KEYS, ks):
            din, dout = _IN_DIM[k](cfg), _OUT_DIM[k](cfg)
            a = (jax.random.normal(kk, (n_adapters, din, rank), jnp.float32)
                 / math.sqrt(din)).astype(dt)
            b = (jnp.zeros((n_adapters, rank, dout), dt) if zero_b else
                 (jax.random.normal(jax.random.fold_in(kk, 1),
                                    (n_adapters, rank, dout), jnp.float32)
                  / math.sqrt(rank)).astype(dt))
            layer[k] = (a, b)
        layers.append(layer)
    return {"alpha": jnp.asarray(alpha / rank, jnp.float32),
            "layers": layers}


_PEFT_NAMES = {"wq": "q_proj", "wk": "k_proj", "wv": "v_proj",
               "wo": "o_proj"}


def from_peft_state_dicts(cfg: LlamaConfig, state_dicts, *, rank: int,
                          alpha: float, dtype=jnp.bfloat16):
    """Stack trained HF PEFT LoRA checkpoints into the serving layout.

    ``state_dicts``: one PEFT ``state_dict()``-style mapping per adapter
    (keys like ``...layers.N.self_attn.q_proj.lora_A.weight`` with
    lora_A (r, in) / lora_B (out, r) torch Linear layout). Projections a
    given adapter does not target get zero factors (identity). All
    adapters must share ``rank`` (pad smaller ones upstream).
    Returns the ``{"alpha", "layers"}`` pytree ``GenerationServer(lora=)``
    takes.
    """
    import numpy as np

    def to_np(t):
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t, np.float32)

    n = len(state_dicts)
    layers = []
    for li in range(cfg.n_layers):
        layer = {}
        for ours, theirs in _PEFT_NAMES.items():
            din, dout = _IN_DIM[ours](cfg), _OUT_DIM[ours](cfg)
            a = np.zeros((n, din, rank), np.float32)
            b = np.zeros((n, rank, dout), np.float32)
            for ai, sd in enumerate(state_dicts):
                hit = [k for k in sd
                       if f"layers.{li}." in k and f"{theirs}.lora_A" in k]
                if not hit:
                    continue
                ka = hit[0]
                kb = ka.replace("lora_A", "lora_B")
                a_t = to_np(sd[ka])   # (r, in) torch layout
                b_t = to_np(sd[kb])   # (out, r)
                if a_t.shape[0] != rank:
                    raise ValueError(
                        f"adapter {ai} {theirs} rank {a_t.shape[0]} != {rank}")
                a[ai] = a_t.T
                b[ai] = b_t.T
            layer[ours] = (jnp.asarray(a, dtype), jnp.asarray(b, dtype))
        layers.append(layer)
    return {"alpha": jnp.asarray(alpha / rank, jnp.float32),
            "layers": layers}


def lora_delta(lora, li: int, name: str, x, adapter_ids):
    """Per-row adapter delta for projection ``name`` of layer ``li``.

    x: (batch, s, in); adapter_ids: (batch,) int32, -1 = none.
    Returns (batch, s, out) in x.dtype.
    """
    if lora is None or name not in lora["layers"][li]:
        return 0.0
    a, b = lora["layers"][li][name]
    safe = jnp.maximum(adapter_ids, 0)
    a_sel = a[safe]                       # (batch, in, r) gather
    b_sel = b[safe]                       # (batch, r, out)
    h = jnp.einsum("bsd,bdr->bsr", x, a_sel)
    out = jnp.einsum("bsr,bro->bso", h, b_sel)
    out = out.astype(jnp.float32) * lora["alpha"]
    out = jnp.where((adapter_ids >= 0)[:, None, None], out, 0.0)
    return out.astype(x.dtype)
