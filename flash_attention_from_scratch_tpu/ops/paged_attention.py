"""Paged decode attention: one query token per sequence over a paged KV cache.

Extension beyond the reference (whose kernel is prefill-only with contiguous
equal-length Q/K/V — ``README.md:7-16``): the serving hot path. Decode
attention is HBM-bandwidth-bound (every step streams the whole KV cache for
one token of Q), so the kernel's job is to stream pages at full bandwidth:

- The KV cache lives in HBM as fixed-size pages
  ``(n_kv_heads, num_pages, page_size, d_head)`` owned by the native
  continuous-batching engine (``csrc/paged_runtime.cpp``); the kernel walks
  each sequence's page table with double-buffered ``make_async_copy`` DMAs —
  compute on page i overlaps the fetch of page i+1.
- Page tables and sequence lengths ride ``PrefetchScalarGridSpec`` so the
  DMA addresses are known before the kernel body runs.
- GQA-native: grid is (batch, n_kv_heads); each step attends the whole
  group of Q heads (a ``(group, page_size)`` score tile) against its shared
  KV head. Q is pre-reshaped to (batch, n_kv_heads, group, d).
- Quantized cache modes (the BASELINE north-star decode target): INT8,
  packed-INT4 (half-split, see ``quant.py``) and FP8-e4m3 pages with
  per-(kv_head, page) fp32 scales, dequantized in VMEM after the DMA — the
  HBM stream is 2-4x smaller, which is a direct decode speedup.
- fp32 online softmax with the exp2 trick, length-masked on the last
  partial page.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_forward import LOG2E, MASK_VALUE
from .quant import unpack_int4_halves

__all__ = ["paged_decode_attention"]


def _decode_kernel(page_size: int, d: int, mode: str, scale: float,
                   compute_dtype,
                   # scalar prefetch (SMEM: arbitrary scalar indexing)
                   lengths_ref, pt_ref, ks_ref, vs_ref,
                   # inputs
                   q_ref, k_hbm, v_hbm,
                   # outputs
                   o_ref,
                   # scratch
                   k_buf, v_buf, sems):
    b = pl.program_id(0)
    hk = pl.program_id(1)
    length = lengths_ref[b]
    n_pages = pl.cdiv(length, page_size)

    def dma(slot, i):
        page = pt_ref[b, i]
        k_dma = pltpu.make_async_copy(k_hbm.at[hk, page], k_buf.at[slot],
                                      sems.at[0, slot])
        v_dma = pltpu.make_async_copy(v_hbm.at[hk, page], v_buf.at[slot],
                                      sems.at[1, slot])
        return k_dma, v_dma

    k0, v0 = dma(0, 0)
    k0.start()
    v0.start()

    q = q_ref[0, 0]  # (group, d)
    group = q.shape[0]
    c = scale * LOG2E

    def load_block(buf, slot):
        if mode == "int4":
            lo, hi = unpack_int4_halves(buf[slot], compute_dtype)
            return lo, hi
        if mode == "dense":
            return buf[slot], None
        return buf[slot].astype(compute_dtype), None

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_pages)
        def _():
            kn, vn = dma(jax.lax.rem(i + 1, 2), i + 1)
            kn.start()
            vn.start()

        kc, vc = dma(slot, i)
        kc.wait()
        vc.wait()

        page = pt_ref[b, i]
        if mode == "dense":
            k_scale = 1.0
            v_scale = 1.0
        else:
            # Per-(kv_head, page) scales; K's folds into the score scale,
            # V's into this page's PV contribution.
            k_scale = ks_ref[hk, page]
            v_scale = vs_ref[hk, page]

        k_lo, k_hi = load_block(k_buf, slot)
        if k_hi is not None:
            d2 = d // 2
            s = jax.lax.dot_general(
                q[:, :d2], k_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                q[:, d2:], k_hi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            s = jax.lax.dot_general(
                q, k_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        s = s * (c * k_scale)  # (group, page_size), log2-domain scaled

        # Mask tokens past the sequence length (last partial page).
        col = i * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < length, s, MASK_VALUE)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)

        p_mm = p.astype(compute_dtype)
        v_lo, v_hi = load_block(v_buf, slot)
        if v_hi is not None:
            pv = jnp.concatenate(
                [jax.lax.dot_general(p_mm, v_lo, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32),
                 jax.lax.dot_general(p_mm, v_hi, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)],
                axis=-1,
            )
        else:
            pv = jax.lax.dot_general(p_mm, v_lo, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        acc_new = acc * alpha + pv * v_scale
        return m_new, l_new, acc_new

    init = (
        jnp.full((group, 1), MASK_VALUE, jnp.float32),
        jnp.zeros((group, 1), jnp.float32),
        jnp.zeros((group, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, n_pages, body, init)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


@functools.lru_cache(maxsize=128)
def _build_decode_call(batch: int, kv_heads: int, group: int, d: int,
                       num_pages: int, page_size: int, pages_per_seq: int,
                       mode: str, store_dtype_name: str, compute_dtype_name: str,
                       scale: float, interpret: bool):
    d_store = d // 2 if mode == "int4" else d
    store_dtype = jnp.dtype(store_dtype_name)
    compute_dtype = jnp.dtype(compute_dtype_name)

    kernel = functools.partial(_decode_kernel, page_size, d, mode, scale,
                               compute_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # lengths, page_tables, k_scales, v_scales
        grid=(batch, kv_heads),
        in_specs=[
            pl.BlockSpec((1, 1, group, d), lambda b, hk, *_: (b, hk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # K pages stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V pages
        ],
        out_specs=pl.BlockSpec((1, 1, group, d), lambda b, hk, *_: (b, hk, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, page_size, d_store), store_dtype),
            pltpu.VMEM((2, page_size, d_store), store_dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, kv_heads, group, d),
                                       compute_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )
    return jax.jit(
        lambda lengths, pt, ks, vs, q, kp, vp: call(lengths, pt, ks, vs, q, kp, vp)
    )


def paged_decode_attention(q, k_pages, v_pages, lengths, page_tables, *,
                           mode: str = "dense", k_scales=None, v_scales=None,
                           scale: float | None = None,
                           interpret: bool | None = None):
    """softmax(q K^T * scale) V for one query token over a paged KV cache.

    Args:
      q: (batch, n_heads, d_head) — the current step's query per sequence.
      k_pages/v_pages: (n_kv_heads, num_pages, page_size, d_head) — or
        ``d_head // 2`` last dim for packed-INT4 mode.
      lengths: (batch,) int32 — number of valid KV tokens per sequence.
      page_tables: (batch, pages_per_seq) int32, page ids in order (-1 pad).
      mode: "dense" | "int8" | "int4" | "fp8".
      k_scales/v_scales: (n_kv_heads, num_pages) fp32, required for quant modes.

    Returns (batch, n_heads, d_head) in q's dtype.
    """
    batch, heads, d = q.shape
    kv_heads, num_pages, page_size = k_pages.shape[:3]
    if mode == "int4" and jax.default_backend() != "cpu":
        # Packed-int4 pages have a 64-lane minor dim that Mosaic cannot
        # DMA-slice per page ("slice shape along dim 3 must be aligned to
        # tiling (128)"). Contiguous-KV int4 works (flash_quant); a
        # sublane-packed page layout is the planned fix.
        raise NotImplementedError(
            "int4 paged decode requires a 128-lane page layout; use int8/fp8 "
            "paged caches or the contiguous int4 path (flash_forward_quantized)"
        )
    if heads % kv_heads:
        raise ValueError(f"heads {heads} not divisible by kv_heads {kv_heads}")
    group = heads // kv_heads
    pages_per_seq = page_tables.shape[1]
    if mode == "dense":
        # Unused by the kernel; a (1, 1) placeholder keeps SMEM tiny.
        k_scales = v_scales = jnp.ones((1, 1), jnp.float32)
    else:
        if k_scales is None or v_scales is None:
            raise ValueError(f"mode {mode!r} requires k_scales and v_scales")
        k_scales = k_scales.astype(jnp.float32)
        v_scales = v_scales.astype(jnp.float32)
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    fn = _build_decode_call(
        batch, kv_heads, group, d, num_pages, page_size, pages_per_seq,
        mode, str(k_pages.dtype), str(q.dtype), float(scale), interpret,
    )
    q_g = q.reshape(batch, kv_heads, group, d)
    out = fn(lengths.astype(jnp.int32), page_tables.astype(jnp.int32),
             k_scales, v_scales, q_g, k_pages, v_pages)
    return out.reshape(batch, heads, d)
