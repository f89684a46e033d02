"""Llama decode path over the paged KV cache.

Extension beyond the prefill-only reference: autoregressive generation with
continuous batching. The KV cache is the page pool managed by the native
scheduler (``csrc/paged_runtime.cpp``); attention at decode is the
bandwidth-bound ``ops.paged_attention`` kernel; prefill reuses the MXU-bound
``ops.flash_forward`` kernel and scatters its K/V into pages.

Cache layout: per-layer lists of ``(n_kv_heads, num_pages, page_size,
d_store)`` arrays (lists, not a stacked array with a layer dim: a stacked
array would make every per-layer read a dynamic-slice copy of the whole
pool — at decode that doubles the HBM traffic the kernel exists to
minimize). Quantized modes store int8/fp8 (packed int4: d_head//2) plus
per-(kv_head, page) fp32 scales; a sequence's scale is calibrated at its
prefill and inherited by the pages it grows into at decode, so earlier
tokens never need re-quantization.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.configs import KernelConfig
from ..ops.paged_attention import paged_decode_attention
from ..ops.quant import KVQuantMode
from ..ops.quant_matmul import spmd_safe
from .llama import (
    LlamaConfig, _mlp as _dense_mlp, _mm, _o_proj, _q_scale_ratio, _qkv,
    apply_rope, rms_norm, rope_inv_freq, rope_tables,
)

__all__ = ["PagedKVCache", "init_cache", "prefill", "prefill_chunked",
           "decode_step", "verify_step", "decode_loop", "greedy_token",
           "sample_token", "spec_accept_sample"]


def _embed(params, tokens, cfg: LlamaConfig):
    x = params["embed"][tokens]
    if cfg.embed_scale:
        x = (x.astype(jnp.float32) * math.sqrt(cfg.dim)).astype(x.dtype)
    return x


def _lm_logits(params, h, cfg: LlamaConfig):
    logits = _mm(h, params["lm_head"]).astype(jnp.float32)
    if cfg.final_softcap:
        logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
    return logits


def _residual_tail(cfg: LlamaConfig, layer, x, out, pin=lambda v: v,
                   o_extra=None):
    """Attention-output projection + MLP with optional sandwich norms.

    ``o_extra``: additive term for the attention output projection (the
    per-row LoRA delta of wo).
    """
    h = _o_proj(layer, out)
    if o_extra is not None:
        h = h + o_extra
    if cfg.post_norms:
        h = rms_norm(h, layer["attn_post_norm"], cfg.norm_eps)
    x = pin(x + h)
    h = _mlp(layer, rms_norm(x, layer["mlp_norm"], cfg.norm_eps), cfg)
    if cfg.post_norms:
        h = rms_norm(h, layer["mlp_post_norm"], cfg.norm_eps)
    return pin(x + h)


def _mlp(layer, h, cfg):
    """Dense SwiGLU, or routed experts when the layer carries them.

    MoE decode reuses the training dispatch (models.moe._moe_mlp) on the
    (batch, 1, dim) token batch: the whole running batch routes together,
    so per-expert capacity is max(8, ~top_k*batch/E) — standard batch-level
    capacity decoding. The router aux loss is discarded at inference.
    """
    if "experts" in layer:
        from .moe import _moe_mlp

        out, _aux = _moe_mlp(cfg, layer, h)
        return out
    return _dense_mlp(layer, h, cfg)


_QMAX = {"int8": 127.0, "int4": 7.0, "fp8": 448.0}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PagedKVCache:
    """Per-layer paged KV pools (+ per-(head, page) scales when quantized)."""

    k_pages: list  # L x (kv_heads, num_pages, page_size, d_store)
    v_pages: list
    k_scales: list  # L x (kv_heads, num_pages) fp32 (ones when dense)
    v_scales: list
    mode: str = "dense"

    def tree_flatten(self):
        return (self.k_pages, self.v_pages, self.k_scales, self.v_scales), (self.mode,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, mode=aux[0])

    @property
    def page_size(self) -> int:
        rows = self.k_pages[0].shape[2]
        return rows * 2 if self.mode == KVQuantMode.INT4 else rows

    @property
    def num_pages(self) -> int:
        return self.k_pages[0].shape[1]

    def nbytes(self) -> int:
        return sum(x.nbytes for x in self.k_pages + self.v_pages
                   + self.k_scales + self.v_scales)


def init_cache(cfg: LlamaConfig, num_pages: int, page_size: int,
               mode: str = "dense") -> PagedKVCache:
    if mode == "dense":
        store_dtype, rows = cfg.dtype.jnp_dtype, page_size
    elif mode == KVQuantMode.INT8:
        store_dtype, rows = jnp.int8, page_size
    elif mode == KVQuantMode.INT4:
        # Sublane-packed: byte (t, c) = token t (lo) / token t+ps/2 (hi).
        store_dtype, rows = jnp.int8, page_size // 2
    elif mode == KVQuantMode.FP8:
        store_dtype, rows = jnp.float8_e4m3fn, page_size
    else:
        raise ValueError(f"unknown cache mode {mode!r}")
    shape = (cfg.n_kv_heads, num_pages, rows, cfg.d_head)
    return PagedKVCache(
        [jnp.zeros(shape, store_dtype) for _ in range(cfg.n_layers)],
        [jnp.zeros(shape, store_dtype) for _ in range(cfg.n_layers)],
        [jnp.ones((cfg.n_kv_heads, num_pages), jnp.float32)
         for _ in range(cfg.n_layers)],
        [jnp.ones((cfg.n_kv_heads, num_pages), jnp.float32)
         for _ in range(cfg.n_layers)],
        mode=mode,
    )


def _quantize_rows(x, scale, mode: str):
    """Quantize (..., d) rows with a broadcastable symmetric scale.

    INT4 returns *unpacked* nibble values in [-7, 7] (one int8 per element);
    packing is page-layout specific and done by the cache writers.
    """
    xf = x.astype(jnp.float32) / scale
    if mode == KVQuantMode.INT8:
        return jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)
    if mode == KVQuantMode.INT4:
        return jnp.clip(jnp.round(xf), -7, 7).astype(jnp.int8)
    if mode == KVQuantMode.FP8:
        # e4m3 conversion does NOT saturate (out-of-range -> NaN); decode
        # steps reuse the prefill-calibrated scale, so clamp explicitly.
        return jnp.clip(xf, -448.0, 448.0).astype(jnp.float8_e4m3fn)
    return x


def _head_scale(x, mode: str):
    """Per-KV-head symmetric scale for a (kv_heads, ..., d) tensor."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)),
                     axis=tuple(range(1, x.ndim)))
    return jnp.maximum(absmax / _QMAX[mode], 1e-12)


def _write_prompt_layer(cache: PagedKVCache, li: int, k, v, page_table,
                        prompt_len: int, page0: int = 0):
    """Scatter one sequence's prompt K/V (kv_heads, prompt_len, d) into pages.

    ``page0``: first page-table slot written (chunked prefill writes chunk c
    starting at slot c * chunk_tokens / page_size; ``prompt_len`` is then
    the chunk's row count). For quantized caches the per-head scale is
    calibrated from the rows written at page0 == 0 and *inherited* from the
    sequence's first page by later chunks — the same scheme decode uses —
    so every page the sequence occupies carries one consistent scale.
    """
    ps = cache.page_size
    n_used = -(-prompt_len // ps)  # static: only touch real pages, not -1 pad

    if cache.mode != "dense":
        if page0 == 0:
            ks = _head_scale(k, cache.mode)  # (kv_heads,)
            vs = _head_scale(v, cache.mode)
        else:
            ks = cache.k_scales[li][:, page_table[0]]
            vs = cache.v_scales[li][:, page_table[0]]
        k = _quantize_rows(k, ks[:, None, None], cache.mode)
        v = _quantize_rows(v, vs[:, None, None], cache.mode)
        used = page_table[page0:page0 + n_used]
        cache.k_scales[li] = cache.k_scales[li].at[:, used].set(
            jnp.broadcast_to(ks[:, None], (ks.shape[0], n_used)))
        cache.v_scales[li] = cache.v_scales[li].at[:, used].set(
            jnp.broadcast_to(vs[:, None], (vs.shape[0], n_used)))

    if cache.mode == KVQuantMode.INT4:
        # Whole-page writes: pad the prompt to n_used full pages, pair token
        # t with token t + ps/2 of the same page into one byte row.
        def scatter4(pages, vals):
            kv_heads = vals.shape[0]
            padded = jnp.zeros((kv_heads, n_used * ps, vals.shape[-1]), jnp.int8)
            padded = padded.at[:, :prompt_len].set(vals)
            by_page = padded.reshape(kv_heads, n_used, ps, -1)
            lo = by_page[:, :, : ps // 2] & 0x0F
            hi = by_page[:, :, ps // 2:] & 0x0F
            packed = (lo | (hi << 4)).astype(jnp.int8)

            # Statically-unrolled per-page DUS rather than a page-dim
            # scatter — same relayout-avoidance as the dense path below
            # (and the axon AOT compiler crashes on fori_loop bodies whose
            # DUS start indices are loop-derived gathers). All heads write
            # the same page, so they collapse into one (kv_heads, 1, ., .)
            # box per page.
            for p in range(n_used):
                pages = jax.lax.dynamic_update_slice(
                    pages, packed[:, p][:, None],
                    (0, page_table[page0 + p], 0, 0))
            return pages

        cache.k_pages[li] = scatter4(cache.k_pages[li], k)
        cache.v_pages[li] = scatter4(cache.v_pages[li], v)
        return cache

    def scatter(pages, vals):
        # Whole-page dynamic_update_slice per page (all heads as one box —
        # head is the leading pool dim taken whole), never a gather/scatter
        # op: XLA assigns scatters their own pool layout and relayouts the
        # full pool twice per call (measured 7.6 ms/step on the 8B decode
        # before the equivalent fix there). Each update here is a
        # (kv_heads, 1, page_size, d) box. The prompt is zero-padded to
        # whole pages; the tail slots
        # belong to this sequence and are overwritten by decode writes
        # before attention can see them (lengths mask the rest).
        kvh, _, d = vals.shape
        padded = jnp.zeros((kvh, n_used * ps, d), vals.dtype)
        padded = padded.at[:, :prompt_len].set(vals)
        by_page = padded.reshape(kvh, n_used, ps, d)
        for p in range(n_used):
            pages = jax.lax.dynamic_update_slice(
                pages, by_page[:, p][:, None], (0, page_table[page0 + p], 0, 0))
        return pages

    cache.k_pages[li] = scatter(cache.k_pages[li], k)
    cache.v_pages[li] = scatter(cache.v_pages[li], v)
    return cache


@functools.partial(jax.jit, static_argnames=("cfg", "prompt_len", "interpret",
                                             "mesh"),
                   donate_argnames=("cache",))
@spmd_safe
def prefill(params, tokens, cfg: LlamaConfig, cache: PagedKVCache,
            page_table, prompt_len: Optional[int] = None,
            interpret: Optional[bool] = None, mesh=None,
            lora=None, adapter_ids=None):
    """Run one prompt (1, padded_len) through the model, filling its pages.

    ``tokens`` may be right-padded so the flash kernel's block constraint
    (multiple of 128) holds; ``prompt_len`` is the true length — only its
    K/V rows are scattered into pages and the returned logits are the
    position ``prompt_len - 1`` row. Returns (logits (vocab,) fp32, cache).

    With ``mesh``, the prompt runs tensor-parallel: heads shard over the
    model axis through ``shard_mapped_attention`` (same split as the
    decode path) and the residual is pinned replicated after each
    row-parallel matmul.
    """
    from .llama import flash_attention

    pin = lambda x: x  # noqa: E731
    if mesh is not None:
        from ..parallel.mesh import pin_residual
        from ..parallel.sharded_attention import shard_mapped_attention

        pin = functools.partial(pin_residual, mesh=mesh)

    cache = dataclasses.replace(cache, k_pages=list(cache.k_pages),
                                v_pages=list(cache.v_pages),
                                k_scales=list(cache.k_scales),
                                v_scales=list(cache.v_scales))
    x = pin(_embed(params, tokens, cfg))  # (1, s_pad, dim)
    s = tokens.shape[1]
    prompt_len = prompt_len or s
    cos, sin = rope_tables(s, cfg.d_head, cfg.rope_theta, cfg=cfg)
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        b = h.shape[0]
        q, k, v = _qkv(layer, h, cfg)
        if lora is not None:
            from .lora import lora_delta

            q = q + lora_delta(lora, li, "wq", h, adapter_ids)
            k = k + lora_delta(lora, li, "wk", h, adapter_ids)
            v = v + lora_delta(lora, li, "wv", h, adapter_ids)
        q = q.reshape(b, s, cfg.n_heads, cfg.d_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, cfg.n_kv_heads, cfg.d_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, cfg.n_kv_heads, cfg.d_head).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if cfg.attn_scale:
            q = (q.astype(jnp.float32) * _q_scale_ratio(cfg)).astype(q.dtype)
        if mesh is not None:
            out = shard_mapped_attention(q, k, v,
                                         cfg.attn_config(
                                             s, layer=li, training=False),
                                         mesh, interpret)
        else:
            out = flash_attention(q, k, v,
                                  cfg.attn_config(s, layer=li, training=False),
                                  interpret)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.n_heads * cfg.d_head)
        o_extra = None
        if lora is not None:
            from .lora import lora_delta

            o_extra = lora_delta(lora, li, "wo", out, adapter_ids)
        x = _residual_tail(cfg, layer, x, out, pin, o_extra=o_extra)
        # Causality makes rows [0, prompt_len) independent of the padding
        # rows, so scattering just those rows keeps the cache exact.
        cache = _write_prompt_layer(cache, li, k[0, :, :prompt_len],
                                    v[0, :, :prompt_len], page_table, prompt_len)
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    return _lm_logits(params, x[:, prompt_len - 1], cfg)[0], cache


def _gather_prefix(cache: PagedKVCache, li: int, page_table, start: int,
                   compute_dtype):
    """Read the first ``start`` cached tokens back as dense K/V.

    Chunked prefill attends each chunk against [prefix | chunk]; the prefix
    comes from the pages earlier chunks wrote — dequantized exactly the way
    decode will later see it (quantized caches round once at write time).
    Returns (k, v), each (kv_heads, start, d_head) in ``compute_dtype``.
    """
    ps = cache.page_size
    n = -(-start // ps)
    idx = page_table[:n]

    def read(pages, scales):
        got = pages[:, idx]  # (kv_heads, n, rows, d) — gather of n pages
        if cache.mode == KVQuantMode.INT4:
            from ..ops.quant import unpack_int4_halves

            lo, hi = unpack_int4_halves(got, compute_dtype)
            got = jnp.concatenate([lo, hi], axis=2)  # token order per page
        elif cache.mode != "dense":
            got = got.astype(compute_dtype)
        if cache.mode != "dense":
            sc = scales[:, idx]  # (kv_heads, n)
            got = got * sc[:, :, None, None].astype(compute_dtype)
        kvh, _, _, d = got.shape
        return got.reshape(kvh, n * ps, d)[:, :start].astype(compute_dtype)

    return (read(cache.k_pages[li], cache.k_scales[li]),
            read(cache.v_pages[li], cache.v_scales[li]))


@functools.partial(jax.jit, static_argnames=("cfg", "start", "write_len",
                                             "want_logit_row", "interpret"),
                   donate_argnames=("cache",))
def _prefill_one_chunk(params, tokens_chunk, cfg: LlamaConfig,
                       cache: PagedKVCache, page_table, start: int,
                       write_len: int, want_logit_row: int,
                       interpret: Optional[bool] = None):
    """One chunk of a chunked prompt pass (see :func:`prefill_chunked`).

    tokens_chunk: (1, chunk_len) — rows [0, write_len) are real.
    Attention runs offset-causal over [prefix | chunk] with
    ``KernelConfig.q_offset = start``; prefix K/V stream back from the
    cache pages. Returns (logits (vocab,) fp32 at want_logit_row — or
    zeros when want_logit_row < 0 — and the updated cache).
    """
    from .llama import flash_attention

    cache = dataclasses.replace(cache, k_pages=list(cache.k_pages),
                                v_pages=list(cache.v_pages),
                                k_scales=list(cache.k_scales),
                                v_scales=list(cache.v_scales))
    x = _embed(params, tokens_chunk, cfg)  # (1, c, dim)
    c = tokens_chunk.shape[1]
    compute_dtype = cfg.dtype.jnp_dtype
    cos, sin = rope_tables(start + c, cfg.d_head, cfg.rope_theta, cfg=cfg)
    cos, sin = cos[start:], sin[start:]

    def chunk_attn_config(window: int):
        def fit(limit, seq, quantum):
            b = min(limit, seq) - (min(limit, seq) % quantum)
            while b >= quantum and seq % b:
                b -= quantum
            return max(b, quantum)

        return KernelConfig(
            block_q=fit(cfg.block_q, c, 8),
            block_kv=fit(cfg.block_kv, start + c, 128),
            d_head=cfg.d_head, dtype=cfg.dtype,
            causal=True, q_offset=start,
            window=window,
            attn_softcap=cfg.attn_softcap,
            optimized_softmax=not window,
        )
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q, k, v = _qkv(layer, h, cfg)
        q = q.reshape(1, c, cfg.n_heads, cfg.d_head).transpose(0, 2, 1, 3)
        k = k.reshape(1, c, cfg.n_kv_heads, cfg.d_head).transpose(0, 2, 1, 3)
        v = v.reshape(1, c, cfg.n_kv_heads, cfg.d_head).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if cfg.attn_scale:
            q = (q.astype(jnp.float32) * _q_scale_ratio(cfg)).astype(q.dtype)

        # Chunk K/V go to pages FIRST: the prefix this chunk's attention
        # reads back is then exactly what decode will read later (one
        # quantization at write time, no double-rounding drift).
        cache = _write_prompt_layer(cache, li, k[0, :, :write_len],
                                    v[0, :, :write_len], page_table,
                                    write_len,
                                    page0=start // cache.page_size)
        if start:
            k_pref, v_pref = _gather_prefix(cache, li, page_table, start,
                                            compute_dtype)
            k_full = jnp.concatenate(
                [k_pref[None], k.astype(compute_dtype)], axis=2)
            v_full = jnp.concatenate(
                [v_pref[None], v.astype(compute_dtype)], axis=2)
        else:
            k_full, v_full = k, v
        out = flash_attention(q, k_full, v_full,
                              chunk_attn_config(cfg.layer_window(li)),
                              interpret)
        out = out.transpose(0, 2, 1, 3).reshape(1, c, cfg.n_heads * cfg.d_head)
        x = _residual_tail(cfg, layer, x, out)

    if want_logit_row < 0:
        return jnp.zeros((cfg.vocab_size,), jnp.float32), cache
    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    return _lm_logits(params, x[:, want_logit_row], cfg)[0], cache


def prefill_chunked(params, tokens, cfg: LlamaConfig, cache: PagedKVCache,
                    page_table, prompt_len: Optional[int] = None,
                    chunk_tokens: int = 1024, start_tokens: int = 0,
                    interpret: Optional[bool] = None):
    """Prompt pass in fixed-size chunks: bounded activation memory.

    Whole-prompt prefill materializes (s, hidden_dim) MLP intermediates —
    ~470 MB bf16 per layer at 8k tokens on the 8B config. Chunking caps
    that at chunk_tokens rows: each chunk attends offset-causally over
    [cached prefix | chunk] (``KernelConfig.q_offset``), writes its K/V
    pages, and only the chunk containing ``prompt_len - 1`` computes
    logits. Semantically identical to :func:`prefill` for dense caches;
    quantized caches calibrate scales from the FIRST chunk (decode inherits
    them the same way), so later chunks' K/V round with chunk 0's scale.

    chunk_tokens must be a multiple of the flash block (128) and of
    page_size (chunks write whole pages). ``start_tokens`` skips fully
    cached chunks (prefix caching): their pages must already hold the
    prompt's K/V. Returns (logits (vocab,) fp32, cache).
    """
    ps = cache.page_size
    if chunk_tokens % 128 or chunk_tokens % ps:
        raise ValueError(
            f"chunk_tokens ({chunk_tokens}) must be a multiple of 128 and "
            f"of page_size ({ps})")
    if start_tokens % chunk_tokens:
        raise ValueError(
            f"start_tokens ({start_tokens}) must be a multiple of "
            f"chunk_tokens ({chunk_tokens})")
    s = tokens.shape[1]
    prompt_len = prompt_len or s
    if not start_tokens < prompt_len:
        raise ValueError(f"start_tokens ({start_tokens}) must leave at "
                         f"least the last prompt token to compute")
    logits = None
    for start in range(start_tokens, prompt_len, chunk_tokens):
        end = min(start + chunk_tokens, s)
        write_len = min(prompt_len - start, chunk_tokens)
        last = start + chunk_tokens >= prompt_len
        row = (prompt_len - 1 - start) if last else -1
        chunk = tokens[:, start:end]
        if chunk.shape[1] % 128:  # pad the tail chunk to the block quantum
            pad = -chunk.shape[1] % 128
            chunk = jnp.pad(chunk, ((0, 0), (0, pad)))
        out, cache = _prefill_one_chunk(
            params, chunk, cfg, cache, page_table, start, write_len, row,
            interpret=interpret)
        if last:
            logits = out
            break
    return logits, cache


def _paged_attention_maybe_sharded(q, kp, vp, ks, vs, lengths, page_tables,
                                   mode, mesh, interpret, attn_int8=False,
                                   window=0, softcap=0.0, scale=None):
    """Paged decode attention, shard_mapped over tp when a mesh is given.

    KV heads (pool dim 0) and Q heads shard over the model axis — the same
    megatron column split the projections use, so no collective is needed
    inside the attention; wo's row-parallel matmul all-reduces after.
    """
    if mesh is None:
        return paged_decode_attention(
            q, kp, vp, lengths, page_tables, mode=mode,
            k_scales=None if mode == "dense" else ks,
            v_scales=None if mode == "dense" else vs,
            int8_compute=attn_int8, window=window, softcap=softcap,
            scale=scale, interpret=interpret)

    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import MODEL_AXIS, mesh_interpret

    interpret = mesh_interpret(mesh, interpret)

    # q is (batch, heads, d) for single-token decode, (batch, heads, t, d)
    # for the multi-token verify step — heads shard over tp either way.
    heads_spec = P(None, MODEL_AXIS, *([None] * (q.ndim - 2)))
    pool_spec = P(MODEL_AXIS, None, None, None)
    sc_spec = P(MODEL_AXIS, None)
    rep = P()

    @partial(shard_map, mesh=mesh,
             in_specs=(heads_spec, pool_spec, pool_spec, sc_spec, sc_spec,
                       rep, rep),
             out_specs=heads_spec, check_rep=False)
    def local(q, kp, vp, ks, vs, lengths, pt):
        return paged_decode_attention(
            q, kp, vp, lengths, pt, mode=mode,
            k_scales=None if mode == "dense" else ks,
            v_scales=None if mode == "dense" else vs,
            int8_compute=attn_int8, window=window, softcap=softcap,
            scale=scale, interpret=interpret)

    return local(q, kp, vp, ks, vs, lengths, page_tables)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "mesh",
                                             "attn_int8"),
                   donate_argnames=("cache",))
@spmd_safe
def decode_step(params, tokens, cfg: LlamaConfig, cache: PagedKVCache,
                lengths, page_tables, interpret: Optional[bool] = None,
                mesh=None, attn_int8: bool = False,
                lora=None, adapter_ids=None):
    """One decode step for the whole running batch.

    Args:
      tokens: (batch,) int32 — the most recent token of each sequence.
      lengths: (batch,) int32 — sequence length *including* these tokens.
      page_tables: (batch, pages_per_seq) int32 (-1 padded).
      mesh: optional (dp, tp) Mesh — KV-head/Q-head tensor parallelism for
        the attention; dense layers shard via the params' NamedShardings.

    Returns (logits (batch, vocab) fp32, cache).
    """
    cache = dataclasses.replace(cache, k_pages=list(cache.k_pages),
                                v_pages=list(cache.v_pages),
                                k_scales=list(cache.k_scales),
                                v_scales=list(cache.v_scales))
    batch = tokens.shape[0]
    ps = cache.page_size
    pin = lambda x: x  # noqa: E731
    if mesh is not None:
        from ..parallel.mesh import pin_residual

        pin = functools.partial(pin_residual, mesh=mesh)
    # The embed table is dim-sharded; replicate the looked-up rows once here
    # or layer 0's three QKV dots each all-gather them separately.
    x = pin(_embed(params, tokens, cfg)[:, None, :])  # (batch, 1, dim)
    pos = lengths - 1  # position of the current token

    # Per-sequence rope rows, broadcast over heads.
    inv_freq = rope_inv_freq(cfg)
    angles = pos.astype(jnp.float32)[:, None] * inv_freq[None, :]
    cos = jnp.cos(angles)[:, None, None, :]  # (batch, 1, 1, d/2)
    sin = jnp.sin(angles)[:, None, None, :]

    page_of_pos = jnp.take_along_axis(
        page_tables, (pos // ps)[:, None], axis=1)[:, 0]  # (batch,)
    slot_of_pos = pos % ps
    first_page = page_tables[:, 0]  # scale owner for each sequence

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q, k, v = _qkv(layer, h, cfg)
        if lora is not None:
            from .lora import lora_delta

            q = q + lora_delta(lora, li, "wq", h, adapter_ids)
            k = k + lora_delta(lora, li, "wk", h, adapter_ids)
            v = v + lora_delta(lora, li, "wv", h, adapter_ids)
        q = q.reshape(batch, 1, cfg.n_heads, cfg.d_head)
        k = k.reshape(batch, 1, cfg.n_kv_heads, cfg.d_head)
        v = v.reshape(batch, 1, cfg.n_kv_heads, cfg.d_head)
        q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)[:, :, 0]  # (b, H, d)
        k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)[:, :, 0]  # (b, h_kv, d)
        v = v[:, 0]  # (b, h_kv, d)

        if cache.mode != "dense":
            # Each sequence quantizes with the scale calibrated at its own
            # prefill (stored on its first page), and the page it is writing
            # inherits that scale — newly grown pages get stamped here.
            ks_seq = cache.k_scales[li][:, first_page]  # (kv_heads, batch)
            vs_seq = cache.v_scales[li][:, first_page]
            k_st = _quantize_rows(k, ks_seq.T[:, :, None], cache.mode)
            v_st = _quantize_rows(v, vs_seq.T[:, :, None], cache.mode)
            cache.k_scales[li] = cache.k_scales[li].at[:, page_of_pos].set(ks_seq)
            cache.v_scales[li] = cache.v_scales[li].at[:, page_of_pos].set(vs_seq)
        else:
            k_st, v_st = k, v

        # One dynamic_update_slice per SEQUENCE, never a gather/scatter and
        # never a device loop. Measured alternatives on the 8B step: scatter
        # ops get their own pool layout (two full-pool relayout copies per
        # layer per step, 7.6 ms); a fori_loop of row writes pays ~2 us of
        # loop overhead each (8192/step = 44 ms); a per-(sequence, head)
        # DUS chain costs ~0.67 us per op (8192/step = 5.5 ms). All heads
        # of one sequence target the same (page, slot), and head is the
        # pool's LEADING dim taken whole — so they collapse into a single
        # (kv_heads, 1, 1, d) box update, batch ops per pool per step.
        kvh = cfg.n_kv_heads
        if cache.mode == KVQuantMode.INT4:
            # Nibble read-modify-write on the sublane-packed page byte.
            half = ps // 2
            byte_row = slot_of_pos % half  # (batch,)
            is_hi = slot_of_pos >= half

            def scatter(pages, rows):
                q4 = rows & 0x0F  # (batch, kv_heads, d)
                for b in range(batch):
                    at = (0, page_of_pos[b], byte_row[b], 0)
                    old = jax.lax.dynamic_slice(
                        pages, at, (kvh, 1, 1, pages.shape[3]))
                    new = q4[b][:, None, None, :]
                    lo_w = (old & jnp.int8(-16)) | new
                    hi_w = (old & jnp.int8(0x0F)) | (new << 4)
                    pages = jax.lax.dynamic_update_slice(
                        pages, jnp.where(is_hi[b], hi_w, lo_w), at)
                return pages
        else:
            def scatter(pages, rows):
                for b in range(batch):
                    pages = jax.lax.dynamic_update_slice(
                        pages, rows[b][:, None, None, :],
                        (0, page_of_pos[b], slot_of_pos[b], 0))
                return pages

        cache.k_pages[li] = scatter(cache.k_pages[li], k_st)
        cache.v_pages[li] = scatter(cache.v_pages[li], v_st)

        out = _paged_attention_maybe_sharded(
            q, cache.k_pages[li], cache.v_pages[li],
            cache.k_scales[li], cache.v_scales[li],
            lengths, page_tables, cache.mode, mesh, interpret,
            attn_int8=attn_int8, window=cfg.layer_window(li),
            softcap=cfg.attn_softcap, scale=cfg.attn_scale or None,
        )  # (batch, heads, d)
        out = out.reshape(batch, 1, cfg.n_heads * cfg.d_head).astype(x.dtype)
        o_extra = None
        if lora is not None:
            from .lora import lora_delta

            o_extra = lora_delta(lora, li, "wo", out, adapter_ids)
        # wo/w_down are row-parallel: pin the residual so their partial
        # products all-reduce HERE once (see parallel.mesh.pin_residual).
        x = _residual_tail(cfg, layer, x, out, pin, o_extra=o_extra)

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    return _lm_logits(params, x[:, 0], cfg), cache


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "mesh",
                                             "attn_int8"),
                   donate_argnames=("cache",))
@spmd_safe
def verify_step(params, tokens, cfg: LlamaConfig, cache: PagedKVCache,
                lengths, page_tables, interpret: Optional[bool] = None,
                mesh=None, attn_int8: bool = False):
    """Score t tokens per sequence in ONE forward pass (speculative verify).

    The multi-token generalization of :func:`decode_step`: token j of a
    row's t inputs sits at position ``lengths - t + j`` (``lengths``
    INCLUDES the t tokens; the scheduler has allocated their slots). All t
    tokens' K/V are written to their pages, and attention uses the
    multi-token paged kernel (``ops.paged_attention`` with ``q_tokens = t``
    — per-token causal masks within the new tokens).

    Args:
      tokens: (batch, t) int32 — [previous committed token, draft_1..t-1].

    Returns (logits (batch, t, vocab) fp32, cache): logits[:, j] is the
    model's next-token distribution after consuming token j — row j
    verifies draft j+1, and the last row supplies the bonus/correction
    token.
    """
    cache = dataclasses.replace(cache, k_pages=list(cache.k_pages),
                                v_pages=list(cache.v_pages),
                                k_scales=list(cache.k_scales),
                                v_scales=list(cache.v_scales))
    batch, t = tokens.shape
    ps = cache.page_size
    pin = lambda x: x  # noqa: E731
    if mesh is not None:
        from ..parallel.mesh import pin_residual

        pin = functools.partial(pin_residual, mesh=mesh)
    x = pin(params["embed"][tokens])  # (batch, t, dim)
    pos = lengths[:, None] - t + jnp.arange(t)[None, :]  # (batch, t)

    inv_freq = rope_inv_freq(cfg)
    angles = pos.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    cos = jnp.cos(angles)[:, None]  # (batch, 1, t, d/2)
    sin = jnp.sin(angles)[:, None]

    page_of = jnp.take_along_axis(page_tables, pos // ps, axis=1)  # (b, t)
    slot_of = pos % ps
    first_page = page_tables[:, 0]

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q, k, v = _qkv(layer, h, cfg)
        q = q.reshape(batch, t, cfg.n_heads, cfg.d_head).transpose(0, 2, 1, 3)
        k = k.reshape(batch, t, cfg.n_kv_heads, cfg.d_head).transpose(0, 2, 1, 3)
        v = v.reshape(batch, t, cfg.n_kv_heads, cfg.d_head).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)       # (b, H, t, d)
        k = apply_rope(k, cos, sin)       # (b, kvh, t, d)

        if cache.mode != "dense":
            ks_seq = cache.k_scales[li][:, first_page]  # (kv_heads, batch)
            vs_seq = cache.v_scales[li][:, first_page]
            k_st = _quantize_rows(k, ks_seq.T[:, :, None, None], cache.mode)
            v_st = _quantize_rows(v, vs_seq.T[:, :, None, None], cache.mode)
            flat_pages = page_of.reshape(-1)
            cache.k_scales[li] = cache.k_scales[li].at[:, flat_pages].set(
                jnp.repeat(ks_seq, t, axis=1))
            cache.v_scales[li] = cache.v_scales[li].at[:, flat_pages].set(
                jnp.repeat(vs_seq, t, axis=1))
        else:
            k_st, v_st = k, v

        # Per-(sequence, token) DUS box writes — same relayout-avoidance as
        # decode_step; batch * t boxes per pool (t is small, typically <= 8).
        kvh = cfg.n_kv_heads
        if cache.mode == KVQuantMode.INT4:
            half = ps // 2
            byte_row = slot_of % half
            is_hi = slot_of >= half

            def scatter(pages, rows):
                q4 = rows & 0x0F  # (batch, kvh, t, d)
                for b in range(batch):
                    for j in range(t):
                        at = (0, page_of[b, j], byte_row[b, j], 0)
                        old = jax.lax.dynamic_slice(
                            pages, at, (kvh, 1, 1, pages.shape[3]))
                        new = q4[b, :, j][:, None, None, :]
                        lo_w = (old & jnp.int8(-16)) | new
                        hi_w = (old & jnp.int8(0x0F)) | (new << 4)
                        pages = jax.lax.dynamic_update_slice(
                            pages, jnp.where(is_hi[b, j], hi_w, lo_w), at)
                return pages
        else:
            def scatter(pages, rows):
                for b in range(batch):
                    for j in range(t):
                        pages = jax.lax.dynamic_update_slice(
                            pages, rows[b, :, j][:, None, None, :],
                            (0, page_of[b, j], slot_of[b, j], 0))
                return pages

        cache.k_pages[li] = scatter(cache.k_pages[li], k_st)
        cache.v_pages[li] = scatter(cache.v_pages[li], v_st)

        out = _paged_attention_maybe_sharded(
            q, cache.k_pages[li], cache.v_pages[li],
            cache.k_scales[li], cache.v_scales[li],
            lengths, page_tables, cache.mode, mesh, interpret,
            attn_int8=attn_int8, window=cfg.layer_window(li),
            softcap=cfg.attn_softcap, scale=cfg.attn_scale or None,
        )  # (batch, heads, t, d)
        out = out.transpose(0, 2, 1, 3).reshape(
            batch, t, cfg.n_heads * cfg.d_head).astype(x.dtype)
        x = _residual_tail(cfg, layer, x, out, pin)

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    return _lm_logits(params, x, cfg), cache


@functools.partial(jax.jit, static_argnames=("cfg", "steps", "temperature",
                                             "top_k", "interpret", "mesh",
                                             "attn_int8"),
                   donate_argnames=("cache",))
def decode_loop(params, tokens, cfg: LlamaConfig, cache: PagedKVCache,
                lengths, page_tables, steps: int, *, row_keys=None,
                pos0=None, temperature: float = 0.0, top_k: int = 0,
                interpret: Optional[bool] = None, mesh=None,
                attn_int8: bool = False, lora=None, adapter_ids=None):
    """``steps`` decode iterations inside ONE jit via ``lax.scan``.

    Amortizes host dispatch over a whole chunk: through the axon tunnel one
    ``decode_step`` call pays ~8-12 ms of host overhead on a ~16 ms device
    step, so chunking is nearly a 2x serving-throughput lever on its own.

    Unlike :func:`decode_step`, token selection happens **in-graph**:
    greedy at ``temperature <= 0`` (or when ``row_keys`` is None), else
    temperature/top-k sampling with the key for row r at loop step i
    derived as ``fold_in(row_keys[r], pos0[r] + i)`` — the same
    (sequence, position) keying the serving loop uses, so a chunked and a
    step-by-step server replay identical trajectories (including after
    recompute preemption).

    Args:
      tokens: (batch,) int32 — last committed token per sequence.
      lengths: (batch,) int32 — committed length per sequence (prompt +
        generated so far, *excluding* the tokens this call generates);
        note this differs from ``decode_step``, which takes the length
        including the token being decoded.
      page_tables: (batch, pages_per_seq) int32 covering the final length
        ``lengths + steps`` (pages must be pre-allocated for the chunk).
      row_keys: optional (batch,) PRNG keys (one per sequence).
      pos0: (batch,) int32 — generated-token count per row at chunk start
        (the position fold for sampling); required when sampling.

    Returns ``(out_tokens (batch, steps) int32, cache, lengths + steps)``.
    """
    def body(carry, i):
        toks, cache, lengths = carry
        lengths = lengths + 1
        logits, cache = decode_step(params, toks, cfg, cache, lengths,
                                    page_tables, interpret=interpret,
                                    mesh=mesh, attn_int8=attn_int8,
                                    lora=lora, adapter_ids=adapter_ids)
        if temperature <= 0.0 or row_keys is None:
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        else:
            def pick(kr, p, lg):
                return sample_token(lg, jax.random.fold_in(kr, p),
                                    temperature, top_k)
            nxt = jax.vmap(pick)(row_keys, pos0 + i, logits)
        return (nxt, cache, lengths), nxt

    (toks, cache, lengths), out = jax.lax.scan(
        body, (tokens, cache, lengths), jnp.arange(steps))
    return out.T, cache, lengths


def greedy_token(logits) -> jax.Array:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("temperature", "top_k"))
def spec_accept_sample(logits, drafts, draft_lens, keys,
                       temperature: float = 1.0, top_k: int = 0):
    """Delta-proposal speculative sampling: exact target distribution.

    Given verifier logits for t inputs ([prev, d_1..d_k], so logits[j] is
    the model's distribution AFTER consuming input j) and the k drafted
    tokens, accept draft d_{j+1} with probability p_j(d_{j+1}); at the
    first rejection sample a correction from the residual
    p_j(x) * 1[x != d_{j+1}] renormalized, and after a fully accepted draft
    sample the bonus token from p_k. With a deterministic (delta) proposal
    q = 1[x == d], accept-with-p(d) + renormalized-residual reproduces
    p exactly: P(x = d) = p(d), P(x != d) = (1 - p(d)) * p(x)/(1 - p(d)).

    Args:
      logits: (batch, t, vocab) fp32, t = k + 1.
      drafts: (batch, k) int32, zero-padded past draft_lens.
      draft_lens: (batch,) int32 — real draft tokens per row (pad slots are
        never accepted).
      keys: (batch,) PRNG keys. Replay caveat: sampled speculative steps
        draw from a different RNG construction than plain sampled decode,
        so a preempted sequence replays deterministically only if it takes
        the same spec/plain path sequence on the way back (greedy always
        replays exactly).

    Returns (tokens (batch, t) int32, n_emit (batch,) int32): row i emits
    tokens[i, :n_emit[i]] — accepted drafts then the correction/bonus.
    Uses the same temperature/top-k shaping as :func:`sample_token`;
    temperature <= 0 reduces to greedy acceptance.
    """
    batch, t, vocab = logits.shape
    k = t - 1
    if top_k:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits >= kth, logits, -jnp.inf)
    if temperature <= 0.0:
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (batch, t)
        match = preds[:, :k] == drafts  # greedy acceptance
    else:
        scaled = logits / jnp.maximum(temperature, 1e-6)
        probs = jax.nn.softmax(scaled, axis=-1)  # (batch, t, vocab)
        p_draft = jnp.take_along_axis(
            probs[:, :k], drafts[..., None], axis=-1)[..., 0]  # (batch, k)
        u = jax.vmap(lambda kk: jax.random.uniform(
            jax.random.fold_in(kk, 0), (k,)))(keys)
        match = u < p_draft
    match = jnp.logical_and(
        match, jnp.arange(k)[None, :] < draft_lens[:, None])

    # First rejection index per row (k if the whole draft is accepted).
    rej = jnp.argmin(jnp.concatenate(
        [match, jnp.zeros((batch, 1), bool)], axis=1).astype(jnp.int32),
        axis=1)  # (batch,) in [0, k]
    n_acc = rej

    # The emitted tail token: position n_acc's distribution, with the
    # rejected draft removed (residual) — or the bonus from position k.
    row_logits = jnp.take_along_axis(
        logits, n_acc[:, None, None], axis=1)[:, 0]  # (batch, vocab)
    rejected_draft = jnp.take_along_axis(
        jnp.concatenate([drafts, jnp.zeros((batch, 1), jnp.int32)], axis=1),
        n_acc[:, None], axis=1)[:, 0]
    # A row is a REJECTION only if a real draft token was refused; a fully
    # accepted short draft (incl. the empty draft) ends with a bonus sample
    # from the plain distribution — masking the pad token there would skew
    # it (review finding: `n_acc < k` wrongly banned token id 0).
    was_rejected = n_acc < draft_lens
    if temperature <= 0.0:
        tail = jnp.argmax(row_logits, axis=-1).astype(jnp.int32)
    else:
        onehot = jax.nn.one_hot(rejected_draft, vocab, dtype=bool)
        residual = jnp.where(was_rejected[:, None] & onehot, -jnp.inf,
                             row_logits)
        tail = jax.vmap(lambda lg, kk: jax.random.categorical(
            jax.random.fold_in(kk, 1),
            lg / jnp.maximum(temperature, 1e-6)))(residual, keys)
        tail = tail.astype(jnp.int32)

    pos = jnp.arange(t)[None, :]
    toks = jnp.where(pos < n_acc[:, None],
                     jnp.concatenate(
                         [drafts, jnp.zeros((batch, 1), jnp.int32)], axis=1),
                     0)
    toks = jnp.where(pos == n_acc[:, None], tail[:, None], toks)
    return toks, n_acc + 1


@functools.partial(jax.jit, static_argnames=("top_k",))
def sample_token(logits, key, temperature: float = 1.0,
                 top_k: int = 0) -> jax.Array:
    """Temperature / top-k sampling. ``logits`` (..., vocab) fp32.

    ``temperature <= 0`` degenerates to greedy; ``top_k == 0`` disables the
    top-k filter.
    """
    if top_k:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits >= kth, logits, -jnp.inf)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temperature, 1e-6)
    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)
