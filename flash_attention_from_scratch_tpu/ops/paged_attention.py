"""Paged decode attention: one query token per sequence over a paged KV cache.

Extension beyond the reference (whose kernel is prefill-only with contiguous
equal-length Q/K/V — ``README.md:7-16``): the serving hot path. Decode
attention is HBM-bandwidth-bound (every step streams the whole KV window for
one token of Q), so the kernel's only job is to stream pages at full
bandwidth:

- The KV cache lives in HBM as fixed-size pages
  ``(n_kv_heads, num_pages, page_size, d_head)`` owned by the native
  continuous-batching engine (``csrc/paged_runtime.cpp``); page tables and
  sequence lengths ride ``PrefetchScalarGridSpec`` so DMA addresses are
  known up front.
- **Cross-program pipelining**: grid steps on TPU run sequentially, and
  VMEM scratch persists across them — so each program bursts ALL of the
  *next* program's page DMAs while computing on its own buffered pages
  (started one step earlier). Without this, every program pays the full DMA
  latency as a bubble; with it the page stream never stalls.
- **One grid step per sequence**: the whole-window variant handles every KV
  head inside one program (grid (batch,), not (batch, kv_heads)) — the
  fixed per-grid-step cost (sequencer + q/o block pipeline) measured larger
  than the DMA descriptors, so fewer/fatter steps win.
- One masked softmax over the whole buffered window (group x max_kv tile)
  instead of an online per-page loop — decode tiles are tiny, the VPU pass
  is cheap, and it removes the serial dependency chain.
- GQA-native: each program attends the whole Q-head group of every KV head.
- Quantized cache modes: INT8 / FP8-e4m3 pages, and sublane-packed INT4
  (byte (t, c) = token t lo nibble / token t + page_size/2 hi nibble —
  keeps the page's lane dim 128-wide so per-page DMA slices stay legal).
  Per-(kv_head, page) scales are folded into the dequant upcast.

A fallback per-page online-softmax variant (same math, chunked) covers
windows too long for whole-sequence VMEM buffering.
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

# Whole-sequence K+V double buffers must fit comfortably in VMEM.
_FULL_VARIANT_VMEM_CAP = 8 * 1024 * 1024


def _scale_col_blocks(x, scales, block: int):
    """Multiply (group, n*block) column blocks by per-block scalars."""
    parts = [x[:, i * block:(i + 1) * block] * s for i, s in enumerate(scales)]
    return jnp.concatenate(parts, axis=1)


def _quantize_q_rows(q):
    """Per-row symmetric int8 quantization of the (group, d) query tile."""
    qf = q.astype(jnp.float32)
    q_scale = jnp.maximum(
        jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-12) / 127.0
    return jnp.round(qf / q_scale).astype(jnp.int8), q_scale


def _full_kernel(page_size: int, d: int, mode: str, scale: float,
                 compute_dtype, max_pages: int, int8_compute: bool,
                 kv_heads: int, q_tokens: int, window: int, softcap: float,
                 # scalar prefetch
                 lengths_ref, pt_ref, ks_ref, vs_ref,
                 # inputs
                 q_ref, k_hbm, v_hbm,
                 # outputs
                 o_ref,
                 # scratch
                 k_buf, v_buf, sems):
    """One grid step per SEQUENCE; every KV head is handled in-program.

    Folding the head dimension into the program (grid (batch,) rather than
    (batch, kv_heads)) amortizes the fixed per-grid-step cost — sequencer +
    q/o block pipeline — over kv_heads times more work; the page-size sweep
    (332 -> 379 GB/s from 16x fewer DMA descriptors) showed descriptors are
    cheap, so the step count, not the DMA count, is the overhead that
    matters.
    """
    b = pl.program_id(0)
    total = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)
    rows = page_size // 2 if mode == "int4" else page_size

    def n_pages_of(bb):
        return pl.cdiv(lengths_ref[bb], page_size)

    def first_page_of(bb):
        # Sliding window: pages entirely below every q token's window are
        # never fetched (the whole point of windows at long context).
        if not window:
            return 0
        first_tok = jnp.maximum(
            lengths_ref[bb] - (q_tokens - 1) - window, 0)
        return first_tok // page_size

    def dma_pair(slot_idx, h, i, page):
        return (
            pltpu.make_async_copy(k_hbm.at[h, page],
                                  k_buf.at[slot_idx, h,
                                           pl.ds(i * rows, rows)],
                                  sems.at[0, slot_idx, h, i]),
            pltpu.make_async_copy(v_hbm.at[h, page],
                                  v_buf.at[slot_idx, h,
                                           pl.ds(i * rows, rows)],
                                  sems.at[1, slot_idx, h, i]),
        )

    def start_all(slot_idx, bb):
        npg = n_pages_of(bb)
        fpg = first_page_of(bb)
        for i in range(max_pages):
            page = pt_ref[bb, i]

            @pl.when(jnp.logical_and(i < npg, i >= fpg))
            def _(i=i, page=page):
                for h in range(kv_heads):
                    kd, vd = dma_pair(slot_idx, h, i, page)
                    kd.start()
                    vd.start()

    def wait_all(slot_idx, bb):
        npg = n_pages_of(bb)
        fpg = first_page_of(bb)
        for i in range(max_pages):
            page = pt_ref[bb, i]

            @pl.when(jnp.logical_and(i < npg, i >= fpg))
            def _(i=i, page=page):
                for h in range(kv_heads):
                    kd, vd = dma_pair(slot_idx, h, i, page)
                    kd.wait()
                    vd.wait()

    # Warmup: the very first program bursts its own pages.
    @pl.when(b == 0)
    def _():
        start_all(0, b)

    # Pipeline: burst the NEXT sequence's pages before computing on ours.
    @pl.when(b + 1 < total)
    def _():
        start_all(jax.lax.rem(b + 1, 2), b + 1)

    wait_all(slot, b)

    length = lengths_ref[b]

    # Token position of each score column (half-order aware for int4).
    def token_pos(idx):
        if mode != "int4":
            return idx
        half = page_size // 2
        n_half = max_pages * half
        c2 = jax.lax.rem(idx, n_half)
        return ((c2 // half) * page_size + jax.lax.rem(c2, half)
                + jnp.where(idx >= n_half, half, 0))

    if mode != "dense":
        # Clamp -1 page-table padding: masked columns only need a safe read.
        safe = [jnp.maximum(pt_ref[b, i], 0) for i in range(max_pages)]
    if int8_compute:
        npg = n_pages_of(b)

    for hk in range(kv_heads):
        q = q_ref[0, hk]  # (group, d)

        if mode == "int4":
            # Sublane-packed pages: lo nibbles are each page's tokens
            # [0, ps/2), hi nibbles tokens [ps/2, ps). Working in "half
            # order" (all lo rows, then all hi rows) avoids any interleave —
            # softmax is permutation-invariant as long as K rows, V rows,
            # and the mask positions agree.
            k_lo, k_hi = unpack_int4_halves(k_buf[slot, hk], compute_dtype)
            v_lo, v_hi = unpack_int4_halves(v_buf[slot, hk], compute_dtype)
            k_all = jnp.concatenate([k_lo, k_hi], axis=0)
            v_all = jnp.concatenate([v_lo, v_hi], axis=0)
        elif mode == "dense" or int8_compute:
            k_all = k_buf[slot, hk]  # int8_compute: raw, straight to the MXU
            v_all = v_buf[slot, hk]
        else:
            k_all = k_buf[slot, hk].astype(compute_dtype)
            v_all = v_buf[slot, hk].astype(compute_dtype)

        if int8_compute:
            # The kernel is compute-bound, not DMA-bound. Quantizing q per
            # row makes S an exact int8 x int8 -> int32 MXU dot with zero K
            # upconverts, at the int8 MXU rate.
            q_i8, q_scale = _quantize_q_rows(q)
            s = jax.lax.dot_general(
                q_i8, k_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (q_scale * (scale * LOG2E))
        else:
            s = jax.lax.dot_general(
                q, k_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale * LOG2E)

        if mode != "dense":
            k_sc = [ks_ref[hk, p] for p in safe]
            v_sc = [vs_ref[hk, p] for p in safe]
            if mode == "int4":
                k_sc, v_sc = k_sc + k_sc, v_sc + v_sc  # lo then hi blocks
            s = _scale_col_blocks(s, k_sc, rows)

        if softcap:
            # Gemma-2 logit softcap; s is in the log2 domain (scale folded
            # LOG2E), so the cap co-scales.
            capf = softcap * LOG2E
            s = jnp.tanh(s / capf) * capf

        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if q_tokens == 1:
            limit = length
        else:
            # Multi-token decode (speculative verify): q row r is the
            # group-g copy of new token j = r % q_tokens, sitting at
            # position length - q_tokens + j; it sees cols <= its position.
            rowj = jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 0), q_tokens)
            limit = length - (q_tokens - 1) + rowj
        keep = token_pos(col) < limit
        if window:
            # Sliding window: each q token sees (its position - window, pos].
            keep = jnp.logical_and(keep, token_pos(col) >= limit - window)
        s = jnp.where(keep, s, MASK_VALUE)

        if not int8_compute:
            # Zero V rows past the length — and, with a window, below the
            # first fetched page: their P weights are exactly 0, but
            # never-DMA'd buffer rows can hold non-finite bits and
            # 0 * NaN = NaN (found by tools/check_races.py with NaN-poisoned
            # interpreter memory). int8 V has no NaN bit patterns.
            vrow = jax.lax.broadcasted_iota(jnp.int32, (v_all.shape[0], 1), 0)
            valid = token_pos(vrow) < length
            if window:
                valid = jnp.logical_and(
                    valid, token_pos(vrow) >= first_page_of(b) * page_size)
            v_all = jnp.where(valid, v_all, 0)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if int8_compute:
            # max(p) == exp2(0) == 1 per row, so P quantizes with the
            # constant scale 127. Per-page V scales (<= v_max by
            # construction) fold into P *before* the round, so the int8 dot
            # is dequantized by a single v_max / 127 — attention weights
            # below ~1/254 of the row max round to zero, the standard
            # int8-attention approximation.
            v_valid = [jnp.where(i < npg, v_sc[i], 0.0)
                       for i in range(max_pages)]
            v_max = jnp.maximum(functools.reduce(jnp.maximum, v_valid), 1e-30)
            p_rel = _scale_col_blocks(p, [sc / v_max for sc in v_valid], rows)
            p_i8 = jnp.round(p_rel * 127.0).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_i8, v_all, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (v_max / 127.0)
        else:
            if mode != "dense":
                p = _scale_col_blocks(p, v_sc, rows)
            pv = jax.lax.dot_general(
                p.astype(compute_dtype), v_all, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[0, hk] = (pv / l).astype(o_ref.dtype)


def _loop_kernel(page_size: int, d: int, mode: str, scale: float,
                 compute_dtype, int8_compute: bool, q_tokens: int,
                 window: int, softcap: float,
                 lengths_ref, pt_ref, ks_ref, vs_ref,
                 q_ref, k_hbm, v_hbm,
                 o_ref,
                 k_buf, v_buf, sems):
    """Fallback: per-page online softmax, double-buffered within the program."""
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

    if window:
        # Sliding window: never visit pages below every q token's window.
        first_page = jnp.maximum(
            length - (q_tokens - 1) - window, 0) // page_size
    else:
        first_page = 0

    @pl.when(n_pages > first_page)
    def _():
        k0, v0 = dma(jax.lax.rem(first_page, 2), first_page)
        k0.start()
        v0.start()

    q = q_ref[0, 0]
    group = q.shape[0]
    c = scale * LOG2E
    if int8_compute:
        q_i8, q_scale = _quantize_q_rows(q)

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
        if mode == "int4":
            k_lo, k_hi = unpack_int4_halves(k_buf[slot], compute_dtype)
            v_lo, v_hi = unpack_int4_halves(v_buf[slot], compute_dtype)
            k = jnp.concatenate([k_lo, k_hi], axis=0)
            v = jnp.concatenate([v_lo, v_hi], axis=0)
        elif mode == "dense" or int8_compute:
            k, v = k_buf[slot], v_buf[slot]
        else:
            k = k_buf[slot].astype(compute_dtype)
            v = v_buf[slot].astype(compute_dtype)

        if int8_compute:
            s = jax.lax.dot_general(
                q_i8, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (q_scale * c)
        else:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * c
        if mode != "dense":
            s = s * ks_ref[hk, page]
        if softcap:
            capf = softcap * LOG2E
            s = jnp.tanh(s / capf) * capf
        col = i * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if q_tokens == 1:
            limit = length
        else:
            rowj = jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 0), q_tokens)
            limit = length - (q_tokens - 1) + rowj
        keep = col < limit
        if window:
            keep = jnp.logical_and(keep, col >= limit - window)
        s = jnp.where(keep, s, MASK_VALUE)
        if not int8_compute:
            # Zero V rows past the length (0 * NaN = NaN; see _full_kernel
            # note). int8 V has no NaN bit patterns. With a window the
            # below-window rows of the first visited page are DMA'd (whole
            # pages), so only the tail needs zeroing.
            vrow = i * page_size + jax.lax.broadcasted_iota(
                jnp.int32, (v.shape[0], 1), 0)
            v = jnp.where(vrow < length, v, 0)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if int8_compute:
            # max(p) <= 1, so the constant scale 127 is exact (see
            # _full_kernel); one page per iteration means the per-page V
            # scale dequantizes the int32 dot directly.
            p_i8 = jnp.round(p * 127.0).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_i8, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (vs_ref[hk, page] / 127.0)
        else:
            pv = jax.lax.dot_general(
                p.astype(compute_dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mode != "dense":
                pv = pv * vs_ref[hk, page]  # per-page V dequant scale
        return m_new, l_new, acc * alpha + pv

    init = (
        jnp.full((group, 1), MASK_VALUE, jnp.float32),
        jnp.zeros((group, 1), jnp.float32),
        jnp.zeros((group, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(first_page, n_pages, body, init)
    # length-0 rows (possible for decode-batch padding) produce l == 0.
    o_ref[0, 0] = jnp.where(l > 0, acc / jnp.maximum(l, 1e-30), 0.0).astype(
        o_ref.dtype)


@functools.lru_cache(maxsize=128)
def _build_decode_call(batch: int, kv_heads: int, group: int, d: int,
                       page_size: int, pages_per_seq: int,
                       mode: str, store_dtype_name: str, compute_dtype_name: str,
                       scale: float, interpret: bool,
                       int8_compute: bool = False, q_tokens: int = 1,
                       window: int = 0, softcap: float = 0.0):
    store_dtype = jnp.dtype(store_dtype_name)
    compute_dtype = jnp.dtype(compute_dtype_name)
    # int4 pages are sublane-packed: (page_size // 2, d_head) bytes per page.
    buf_rows = page_size // 2 if mode == "int4" else page_size

    full_bytes = (2 * 2 * kv_heads * pages_per_seq * buf_rows * d
                  * store_dtype.itemsize)
    use_full = full_bytes <= _FULL_VARIANT_VMEM_CAP

    if use_full:
        # Grid (batch,): all KV heads per program (see _full_kernel).
        kernel = functools.partial(_full_kernel, page_size, d, mode, scale,
                                   compute_dtype, pages_per_seq, int8_compute,
                                   kv_heads, q_tokens, window, softcap)
        scratch = [
            pltpu.VMEM((2, kv_heads, pages_per_seq * buf_rows, d),
                       store_dtype),
            pltpu.VMEM((2, kv_heads, pages_per_seq * buf_rows, d),
                       store_dtype),
            pltpu.SemaphoreType.DMA((2, 2, kv_heads, pages_per_seq)),
        ]
        grid = (batch,)
        qo_spec = pl.BlockSpec((1, kv_heads, group * q_tokens, d),
                               lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        semantics = ("arbitrary",)
    else:
        kernel = functools.partial(_loop_kernel, page_size, d, mode, scale,
                                   compute_dtype, int8_compute, q_tokens,
                                   window, softcap)
        scratch = [
            pltpu.VMEM((2, buf_rows, d), store_dtype),
            pltpu.VMEM((2, buf_rows, d), store_dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        grid = (batch, kv_heads)
        qo_spec = pl.BlockSpec((1, 1, group * q_tokens, d),
                               lambda b, hk, *_: (b, hk, 0, 0),
                               memory_space=pltpu.VMEM)
        semantics = ("arbitrary", "arbitrary")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # lengths, page_tables, k_scales, v_scales
        grid=grid,
        in_specs=[
            qo_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # K pages stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V pages
        ],
        out_specs=qo_spec,
        scratch_shapes=scratch,
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, kv_heads, group * q_tokens, d),
                                       compute_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        interpret=interpret,
    )
    return jax.jit(
        lambda lengths, pt, ks, vs, q, kp, vp: call(lengths, pt, ks, vs, q, kp, vp)
    )


def paged_decode_attention(q, k_pages, v_pages, lengths, page_tables, *,
                           mode: str = "dense", k_scales=None, v_scales=None,
                           scale: float | None = None,
                           int8_compute: bool = False, window: int = 0,
                           softcap: float = 0.0,
                           interpret: bool | None = None):
    """softmax(q K^T * scale) V for 1..t query tokens over a paged KV cache.

    Args:
      q: (batch, n_heads, d_head) — the current step's query per sequence —
        or (batch, n_heads, q_tokens, d_head) for multi-token decode
        (speculative verify): token j of the q_tokens new ones sits at
        position lengths - q_tokens + j and is masked causally within the
        new tokens (their K/V must already be in the cache).
      k_pages/v_pages: (n_kv_heads, num_pages, page_size, d_head) — for
        packed-INT4, (n_kv_heads, num_pages, page_size // 2, d_head) with
        byte (t, c) holding token t (lo nibble) / token t + page_size/2 (hi).
      lengths: (batch,) int32 — number of valid KV tokens per sequence.
      page_tables: (batch, pages_per_seq) int32, page ids in order (-1 pad).
      mode: "dense" | "int8" | "int4" | "fp8".
      int8_compute: int8 pages only — also quantize q per row (exact int8
        S dot) and P with the constant scale 127 (its row max is exp2(0)),
        so both MXU dots run at the int8 rate with zero K/V upconverts.
        The kernel is compute-bound, not DMA-bound; this trades ~0.3%
        extra attention error for ~1.9x kernel throughput.
      k_scales/v_scales: (n_kv_heads, num_pages) fp32, required for quant modes.
      window: sliding-window attention — each q token sees only the last
        ``window`` positions up to its own; pages entirely below every
        token's window are never DMA'd. 0 disables.

    Returns q's shape in q's dtype.
    """
    q_tokens = 1 if q.ndim == 3 else q.shape[2]
    batch, heads, d = q.shape[0], q.shape[1], q.shape[-1]
    kv_heads, num_pages, page_rows = k_pages.shape[:3]
    page_size = page_rows * 2 if mode == "int4" else page_rows
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
    if int8_compute and mode != "int8":
        raise ValueError(f"int8_compute requires mode='int8', got {mode!r}")

    if window < 0:
        raise ValueError(f"window must be >= 0: {window}")
    fn = _build_decode_call(
        batch, kv_heads, group, d, page_size, pages_per_seq,
        mode, str(k_pages.dtype), str(q.dtype), float(scale), interpret,
        int8_compute, q_tokens, window, float(softcap),
    )
    # Rows ordered (group, token): row r of a head's tile is group copy
    # r // q_tokens of new token r % q_tokens — matching the kernels' mask.
    q_g = q.reshape(batch, kv_heads, group * q_tokens, d)
    out = fn(lengths.astype(jnp.int32), page_tables.astype(jnp.int32),
             k_scales, v_scales, q_g, k_pages, v_pages)
    if q_tokens == 1:
        return out.reshape(batch, heads, d)
    return out.reshape(batch, heads, q_tokens, d)
