"""Flash Attention 2 forward pass as a Pallas TPU kernel.

TPU-native re-design of the reference's CUDA kernel stack
(``src/include/forward_kernel.cuh:85-204`` plus the L0/L1 machinery it sits
on). The mapping, layer by layer:

- PTX ``mma.m16n8k16`` tile loops (``gemm.cuh:89-123``) -> one
  ``lax.dot_general`` per block pair on the MXU with fp32 accumulation.
- ``cp.async`` eager K/V prefetch + double buffering (ladder steps 3-5,
  ``forward_kernel.cuh:39-64``) -> either the Pallas grid pipeline
  (``KVLoop.GRID``: KV blocks as the innermost ``arbitrary`` grid dimension,
  HBM->VMEM copies double-buffered by Mosaic) or a hand-rolled
  ``make_async_copy`` pipeline (``KVLoop.FORI``).
- fp32 online softmax with the exp2 trick (``softmax.cuh:15-128``,
  ``flash_attention.cu:103``) -> fp32 running max/sum in VMEM scratch,
  scale pre-multiplied by log2(e) so ``exp2`` replaces ``exp``.
- first-KV-block specialization (ladder step 10, ``softmax.cuh:92-95``) ->
  ``@pl.when(kv_step == 0)`` branch that skips the rescale.
- backwards KV iteration (ladder step 13, ``forward_kernel.cuh:179-184``) ->
  reversed BlockSpec index map.
- smem swizzling / ldmatrix / SASS dieting (ladder steps 2, 8-12) have no TPU
  analogue: VMEM has no bank conflicts and Mosaic owns register allocation.

Inputs are (batch, heads, seq, d_head); non-causal by default like the
reference, with causal masking as an extension.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .configs import DType, KernelConfig, KVLoop, calc_self_attn_flop

__all__ = ["make_flash_forward", "flash_forward", "flash_forward_with_lse"]

LOG2E = math.log2(math.e)
MASK_VALUE = -1e30  # large-negative instead of -inf: avoids inf-inf NaNs
_STATS_LANES = 128  # row statistics kept lane-broadcast for layout friendliness


def _mm_precision(cfg: KernelConfig):
    """fp32 operands need HIGHEST or the MXU silently rounds them to bf16."""
    return jax.lax.Precision.HIGHEST if cfg.dtype == DType.FP32 else None


def _row_sum(cfg: KernelConfig, p, p_mm):
    """Row sums of the P tile, (block_q, 1) fp32.

    ``mxu_row_sum`` moves the reduction onto the MXU as P @ ones (an
    N=8 matvec, ~1/16th of the PV matmul) so the VPU sheds one full pass
    over the S tile — a TPU-only rung with no CUDA analogue (the reference's
    warps reduce in registers, softmax.cuh:66-83).
    """
    if cfg.mxu_row_sum:
        ones = jnp.ones((p_mm.shape[1], 8), p_mm.dtype)
        return jax.lax.dot_general(
            p_mm, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_mm_precision(cfg),
        )[:, :1]
    return jnp.sum(p, axis=-1, keepdims=True)


def _sink_merge(cfg: KernelConfig, z, m_col, l_col, acc):
    """Fold a per-head attention-sink logit into the final normalization.

    GPT-OSS/StreamingLLM sinks: one learned logit per head that joins the
    softmax denominator but carries no value. Merging it is one more
    flash-style partial combine at finalization — the sink is a "block"
    whose row max is ``z`` and whose PV contribution is zero. ``z`` is the
    raw logit (never multiplied by the softmax scale); the running stats
    live in the log2 domain under ``use_exp2``, so the sink co-scales.
    Returns (rescaled acc, total denominator, total max) — the (l, m) pair
    after the merge, so the LSE residual written for the backward pass
    includes the sink term (d(sink) then falls out of the standard FA2
    backward, see ops/autodiff.py).
    """
    exp_fn = jnp.exp2 if cfg.use_exp2 else jnp.exp
    zc = z * LOG2E if cfg.use_exp2 else z
    m_tot = jnp.maximum(m_col, zc)
    alpha = exp_fn(m_col - m_tot)
    l_tot = l_col * alpha + exp_fn(zc - m_tot)
    return acc * alpha, l_tot, m_tot


def _attend_block(cfg: KernelConfig, scale: float, s, v, q_span, kv_start,
                  m_prev, l_prev, acc_prev, mask: bool | None = None):
    """One online-softmax update given the raw S tile (fp32).

    Inputs/outputs are values (not refs): shared by both kernel variants.
    ``m_prev/l_prev`` are (block_q, _STATS_LANES); ``acc_prev`` is
    (block_q, d_head); ``s`` is (block_q, block_kv).
    Returns (m_new, l_new, acc_new). ``m_prev`` may be None, meaning "first
    visible block" (the ladder-step-10 specialization: no rescale).

    ``mask`` overrides ``cfg.causal`` for this tile (default: follow the
    config): interior blocks of a causal walk — entirely below the diagonal
    and above every row's window — are fully visible, so the caller elides
    the iota+compare+select VPU pass over the S tile for them and only
    diagonal/window-edge blocks pay it.

    Running statistics are kept in the *scaled* domain regardless of
    ``fused_scale``, so the rescale math is identical for both paths.
    """
    c = scale * LOG2E if cfg.use_exp2 else scale
    exp_fn = jnp.exp2 if cfg.use_exp2 else jnp.exp

    if cfg.scale_q:
        # Q was pre-scaled by c before the QK matmul: S is already in the
        # scaled domain, no (block_q, block_kv) multiply pass needed.
        c = 1.0
    elif not cfg.fused_scale:
        s = s * c

    if cfg.attn_softcap:
        # Gemma-2 logit softcap on the scaled scores. The running stats live
        # in the log2 domain under use_exp2, so the cap co-scales: with
        # s = f * s_nat, f*cap*tanh(s_nat/cap) == capf*tanh(s/capf).
        capf = cfg.attn_softcap * (LOG2E if cfg.use_exp2 else 1.0)
        s = jnp.tanh(s / capf) * capf

    if cfg.causal if mask is None else mask:
        q_pos = q_span + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_pos = kv_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        keep = q_pos >= k_pos
        if cfg.window:
            # Sliding window: q position p sees kv positions (p - window, p].
            keep = jnp.logical_and(keep, q_pos - k_pos < cfg.window)
        s = jnp.where(keep, s, MASK_VALUE)

    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (block_q, 1), raw or scaled
    if cfg.fused_scale:
        m_cur = m_cur * c  # scale folds into the (block_q, 1) stats instead

    def exponentiate(m_row):
        # fused_scale: one FMA pass (s*c - m) + exp; else sub + exp.
        if cfg.fused_scale and not cfg.scale_q:
            return exp_fn(s * c - m_row)
        return exp_fn(s - m_row)

    if m_prev is None:
        m_new_b = jnp.broadcast_to(m_cur, (s.shape[0], _STATS_LANES))
        p = exponentiate(m_cur)
        p_mm = p.astype(cfg.dtype.jnp_dtype) if cfg.cast_p_to_dtype else p
        l_new = jnp.broadcast_to(_row_sum(cfg, p, p_mm), m_new_b.shape)
        acc = jax.lax.dot_general(
            p_mm, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_mm_precision(cfg),
        )
        return m_new_b, l_new, acc

    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    m_row = m_new[:, :1]
    p = exponentiate(m_row)
    alpha = exp_fn(m_prev - m_new)  # (block_q, lanes); rows identical
    p_mm = p.astype(cfg.dtype.jnp_dtype) if cfg.cast_p_to_dtype else p
    l_new = l_prev * alpha + jnp.broadcast_to(_row_sum(cfg, p, p_mm), l_prev.shape)
    pv = jax.lax.dot_general(
        p_mm, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_mm_precision(cfg),
    )
    acc = acc_prev * alpha[:, :1] + pv
    return m_new, l_new, acc


def _attend_block_split(cfg: KernelConfig, scale: float, q, k, v,
                        q_span, kv_start, m_prev, l_prev, acc_prev,
                        mask: bool | None = None):
    """Split-partials online-softmax update over one KV block.

    The KV block is cut into ``cfg.kv_splits`` sub-tiles; each computes a
    *local* (m_i, l_i, acc_i) with no data dependence on its neighbours, so
    Mosaic's scheduler overlaps sub-tile i's exp pass (VPU) with sub-tile
    i+1's QK^T (MXU) — the serial QK->exp->PV chain of :func:`_attend_block`
    is what leaves the MXU idle. The flash-style merge at the end touches
    only (block_q, d_head)/(block_q, 1) arrays, ~d/block_kv of an S-tile
    pass. Unlike :func:`_attend_block` this takes (q, k, v), not a
    precomputed S tile: the per-sub-tile matmuls are the point.

    Q must already carry the softmax scale when ``cfg.scale_q``; running
    statistics stay in the scaled domain exactly as in :func:`_attend_block`,
    and ``mask`` overrides ``cfg.causal`` the same way (mask elision on
    fully-visible interior blocks).
    """
    n = cfg.kv_splits
    sub = k.shape[0] // n
    c = scale * LOG2E if cfg.use_exp2 else scale
    exp_fn = jnp.exp2 if cfg.use_exp2 else jnp.exp
    if cfg.scale_q:
        c = 1.0

    ms, ls, accs = [], [], []
    for i in range(n):
        ks = k[i * sub:(i + 1) * sub, :]
        vs = v[i * sub:(i + 1) * sub, :]
        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_mm_precision(cfg),
        )
        if not cfg.fused_scale:
            if c != 1.0:
                s = s * c
        if cfg.attn_softcap:
            capf = cfg.attn_softcap * (LOG2E if cfg.use_exp2 else 1.0)
            s = jnp.tanh(s / capf) * capf
        if cfg.causal if mask is None else mask:
            q_pos = q_span + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            k_pos = (kv_start + i * sub
                     + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            keep = q_pos >= k_pos
            if cfg.window:
                keep = jnp.logical_and(keep, q_pos - k_pos < cfg.window)
            s = jnp.where(keep, s, MASK_VALUE)
        m_i = jnp.max(s, axis=-1, keepdims=True)  # (block_q, 1)
        if cfg.fused_scale:
            m_i = m_i * c
            p = exp_fn(s * c - m_i)
        else:
            p = exp_fn(s - m_i)
        p_mm = p.astype(cfg.dtype.jnp_dtype) if cfg.cast_p_to_dtype else p
        l_i = _row_sum(cfg, p, p_mm)
        acc_i = jax.lax.dot_general(
            p_mm, vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_mm_precision(cfg),
        )
        ms.append(m_i)
        ls.append(l_i)
        accs.append(acc_i)

    # Flash-style merge of the partials (and the running stats, if any).
    # A fully-masked causal sub-tile has m_i = MASK_VALUE, so its
    # exp_fn(m_i - m_row) weight underflows to exactly 0.
    m_cur = functools.reduce(jnp.maximum, ms)  # (block_q, 1)
    if m_prev is None:
        m_new = jnp.broadcast_to(m_cur, (q.shape[0], _STATS_LANES))
        l_tot = jnp.zeros_like(ls[0])
        acc = jnp.zeros_like(accs[0])
        for m_i, l_i, acc_i in zip(ms, ls, accs):
            w = exp_fn(m_i - m_cur)
            l_tot = l_tot + l_i * w
            acc = acc + acc_i * w
        return m_new, jnp.broadcast_to(l_tot, m_new.shape), acc

    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    m_row = m_new[:, :1]
    alpha = exp_fn(m_prev - m_new)  # (block_q, lanes); rows identical
    l_tot = jnp.zeros_like(ls[0])
    acc = jnp.zeros_like(accs[0])
    for m_i, l_i, acc_i in zip(ms, ls, accs):
        w = exp_fn(m_i - m_row)
        l_tot = l_tot + l_i * w
        acc = acc + acc_i * w
    l_new = l_prev * alpha + jnp.broadcast_to(l_tot, l_prev.shape)
    acc = acc_prev * alpha[:, :1] + acc
    return m_new, l_new, acc


# ---------------------------------------------------------------------------
# GRID variant: KV blocks as innermost grid dimension (Pallas auto-pipeline).
# ---------------------------------------------------------------------------


def _grid_entry(cfg, scale, num_kv, group, has_sinks, return_lse, *refs):
    """Ref-order shim: pallas passes inputs, then outputs, then scratch.

    Inputs are (q, k, v[, sinks]); outputs (o[, lse]); scratch (acc, m, l).
    """
    q_ref, k_ref, v_ref = refs[:3]
    i = 3
    sinks_ref = refs[i] if has_sinks else None
    i += 1 if has_sinks else 0
    o_ref = refs[i]
    lse_ref = refs[i + 1] if return_lse else None
    acc_ref, m_ref, l_ref = refs[-3:]
    _grid_kernel(cfg, scale, num_kv, group, q_ref, k_ref, v_ref, o_ref,
                 acc_ref, m_ref, l_ref, lse_ref=lse_ref, sinks_ref=sinks_ref)


def _grid_kernel(cfg: KernelConfig, scale: float, num_kv: int, group: int,
                 q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                 lse_ref=None, sinks_ref=None):
    kv_step = pl.program_id(3)
    qi = pl.program_id(2)
    # Hoisted: pl.program_id must be CALLED at kernel top level — inside a
    # pl.when body the interpret-mode lowering can't resolve it (the value,
    # a traced scalar, is free to cross into the branch).
    head0 = pl.program_id(1) * cfg.head_pack
    is_first = kv_step == 0
    is_last = kv_step == num_kv - 1

    # Actual KV block index in sequence order (reverse_kv flips the walk).
    kv_block = (num_kv - 1 - kv_step) if cfg.reverse_kv else kv_step
    kv_start = kv_block * cfg.block_kv
    # q_offset shifts every q row's global position (offset-causal:
    # chunked prefill over [prefix | chunk] KV); 0 = standard causal.
    q_span = qi * cfg.block_q + cfg.q_offset

    # For causal masking, blocks strictly above the diagonal contribute
    # nothing: predicate away their compute (the grid still visits them —
    # FORI is the variant with a true early exit).
    visible = True
    if cfg.causal:
        visible = kv_start <= q_span + cfg.block_q - 1
        if cfg.window:
            # Blocks entirely below every row's window contribute nothing.
            visible = jnp.logical_and(
                visible, kv_start + cfg.block_kv - 1 >= q_span - cfg.window + 1)

    def compute():
        # head_pack: the block carries `head_pack` whole heads; each runs
        # its own QK^T -> softmax -> PV chain against its own KV tile and
        # scratch rows. The chains are fully independent, so Mosaic overlaps
        # head g's VPU exp pass with head g+1's MXU matmul — and the
        # per-grid-step fixed cost amortizes over head_pack times the work.
        # This is the small-sequence lever: at seq <= 1024 one program's
        # whole attention is a single (q, kv) shot whose serial
        # QK->exp->PV chain leaves the MXU idle half the time (measured
        # 101 -> 150+ TFLOP/s at seq 512 on v5e).
        for g in range(cfg.head_pack):
            q_full = q_ref[0, g]
            if cfg.scale_q:
                # Fold the softmax scale into Q (d_head cols) instead of the
                # S tile (block_kv cols): ~d/block_kv of the VPU pass cost.
                c = (scale * LOG2E) if cfg.use_exp2 else scale
                q_full = (q_full.astype(jnp.float32) * c).astype(q_full.dtype)
            # GQA group packing: packed Q heads share their group's KV tile
            # (the KV block carries max(1, head_pack // group) heads), so a
            # group's KV streams from HBM once instead of once per Q head.
            k = k_ref[0, g // group]
            v = v_ref[0, g // group]
            base = g * cfg.block_q

            # q_splits: independent row sub-tiles within the Q block — same
            # overlap idea as head_pack, along rows; no merge cost either
            # (row statistics never cross sub-tiles). GRID kernel only.
            sub = cfg.block_q // cfg.q_splits
            for i in range(cfg.q_splits):
                rows = slice(base + i * sub, base + (i + 1) * sub)
                q = q_full[i * sub:(i + 1) * sub]
                sub_span = q_span + i * sub

                def run(mask, q=q, v=v, k=k, sub_span=sub_span, rows=rows):
                    if cfg.kv_splits > 1:
                        def attend(m, l, acc):
                            return _attend_block_split(
                                cfg, scale, q, k, v, sub_span, kv_start,
                                m, l, acc, mask=mask)
                    else:
                        s = jax.lax.dot_general(
                            q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_mm_precision(cfg),
                        )

                        def attend(m, l, acc):
                            return _attend_block(
                                cfg, scale, s, v, sub_span, kv_start,
                                m, l, acc, mask=mask)

                    if cfg.optimized_softmax:
                        @pl.when(is_first)
                        def _():
                            m, l, acc = attend(None, None, None)
                            m_ref[rows, :] = m
                            l_ref[rows, :] = l
                            acc_ref[rows, :] = acc

                        @pl.when(jnp.logical_not(is_first))
                        def _():
                            m, l, acc = attend(m_ref[rows, :], l_ref[rows, :],
                                               acc_ref[rows, :])
                            m_ref[rows, :] = m
                            l_ref[rows, :] = l
                            acc_ref[rows, :] = acc
                    else:
                        @pl.when(is_first)
                        def _():
                            m_ref[rows, :] = jnp.full((sub, _STATS_LANES),
                                                      MASK_VALUE, jnp.float32)
                            l_ref[rows, :] = jnp.zeros((sub, _STATS_LANES),
                                                       jnp.float32)
                            acc_ref[rows, :] = jnp.zeros(
                                (sub, acc_ref.shape[1]), jnp.float32)

                        m, l, acc = attend(m_ref[rows, :], l_ref[rows, :],
                                           acc_ref[rows, :])
                        m_ref[rows, :] = m
                        l_ref[rows, :] = l
                        acc_ref[rows, :] = acc

                if cfg.causal and cfg.mask_elide:
                    # Mask elision: a block entirely below this sub-tile's
                    # diagonal (and, with a window, above every row's lower
                    # edge) is fully visible — skip the iota+compare+select
                    # VPU pass over its S tile; only diagonal/window-edge
                    # blocks pay it. Both branches specialize the same
                    # scratch-update code on the static `mask` flag.
                    # Opt-in (see configs.KernelConfig.mask_elide): measured
                    # a net LOSS at Llama shapes on v5e.
                    full_vis = kv_start + cfg.block_kv - 1 <= sub_span
                    if cfg.window:
                        full_vis = jnp.logical_and(
                            full_vis,
                            kv_start >= sub_span + sub - cfg.window)

                    @pl.when(full_vis)
                    def _(run=run):
                        run(False)

                    @pl.when(jnp.logical_not(full_vis))
                    def _(run=run):
                        run(True)
                else:
                    run(cfg.causal)

    if cfg.causal:
        if cfg.window:
            # A window can hide KV block 0 from high Q blocks, so the
            # scratch init cannot live inside the visible predicate —
            # initialize unconditionally on the first KV step. (window
            # forbids optimized_softmax, so compute() always reads scratch.)
            @pl.when(is_first)
            def _():
                m_ref[...] = jnp.full(m_ref.shape, MASK_VALUE, jnp.float32)
                l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
                acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

        # First processed block (kv_block 0, since causal forbids reverse_kv)
        # is always visible when window == 0, so scratch is initialized
        # before use either way.
        @pl.when(visible)
        def _():
            compute()
    else:
        compute()

    @pl.when(is_last)
    def _():
        # Final normalization (ref softmax.cuh:107-128) + downcast + store.
        for g in range(cfg.head_pack):
            rows = slice(g * cfg.block_q, (g + 1) * cfg.block_q)
            m_col = m_ref[rows, :1]
            l_col = l_ref[rows, :1]
            acc = acc_ref[rows, :]
            if sinks_ref is not None:
                acc, l_col, m_col = _sink_merge(cfg, sinks_ref[head0 + g],
                                                m_col, l_col, acc)
            o_ref[0, g] = (acc / l_col).astype(o_ref.dtype)
            if lse_ref is not None:
                # Natural-log row log-sum-exp of the *scaled* scores — the
                # backward pass residual (sink term included when present,
                # so the recomputed P sums to 1 - sink_weight as it should).
                # Running stats live in log2 domain when use_exp2; one ln(2)
                # multiply converts.
                if cfg.use_exp2:
                    lse = (m_col + jnp.log2(l_col)) * (1.0 / LOG2E)
                else:
                    lse = m_col + jnp.log(l_col)
                # Stored (block_q, 1): the sublane-major column layout the
                # stats already live in — no relayout on write.
                lse_ref[0, g] = lse


def _build_grid_call(cfg: KernelConfig, scale: float, batch: int, heads: int,
                     seq_q: int, seq_kv: int, interpret: bool, debug: bool = False,
                     kv_heads: int | None = None, return_lse: bool = False,
                     has_sinks: bool = False):
    num_q = seq_q // cfg.block_q
    num_kv = seq_kv // cfg.block_kv
    d = cfg.d_head
    hp = cfg.head_pack
    # GQA: Q head h reads KV head h // group directly from HBM — no
    # materialized jnp.repeat of K/V (a pure index-map change on TPU).
    group = heads // (kv_heads or heads)
    if hp > 1:
        # Degrade rather than raise when the pack does not fit this shape:
        # under tensor-parallel shard_map the per-device head count shrinks
        # (e.g. 32 -> 4 at tp=8), and a model-level config must keep
        # working on every shard. A program's packed Q heads must cover
        # whole KV heads, so with GQA one of (hp, group) must divide the
        # other.
        while hp > 1 and (heads % hp
                          or (group > 1 and group % hp and hp % group)):
            hp //= 2
        if hp != cfg.head_pack:
            # The kernel reads cfg.head_pack; keep them consistent.
            import dataclasses

            cfg = dataclasses.replace(cfg, head_pack=hp)
    # KV heads per program: packed Q heads SHARE their group's KV tile —
    # with hp <= group one KV head serves the whole program (its KV block
    # streams from HBM once instead of once per Q head).
    kv_pack = max(1, hp // group)

    def kv_index(b, h, qi, ki):
        blk = (num_kv - 1 - ki) if cfg.reverse_kv else ki
        # Head-axis index in units of kv_pack-sized blocks; integral for
        # every legal (hp, group) pair (hp % group == 0 or group % hp == 0).
        return (b, (h * hp) // (group * kv_pack), blk, 0)

    grid = (batch, heads // hp, num_q, num_kv)
    kernel = functools.partial(_grid_entry, cfg, scale, num_kv, group,
                               has_sinks, return_lse)
    out_dtype = cfg.resolved_out_dtype.jnp_dtype

    out_specs = pl.BlockSpec((1, hp, cfg.block_q, d),
                             lambda b, h, qi, ki: (b, h, qi, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((batch, heads, seq_q, d), out_dtype)
    if return_lse:
        out_specs = (out_specs,
                     pl.BlockSpec((1, hp, cfg.block_q, 1),
                                  lambda b, h, qi, ki: (b, h, qi, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((batch, heads, seq_q, 1), jnp.float32))

    in_specs = [
        pl.BlockSpec((1, hp, cfg.block_q, d), lambda b, h, qi, ki: (b, h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kv_pack, cfg.block_kv, d), kv_index,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kv_pack, cfg.block_kv, d), kv_index,
                     memory_space=pltpu.VMEM),
    ]
    if has_sinks:
        # Per-Q-head sink logits, (heads,) fp32 — scalars, so SMEM.
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((hp * cfg.block_q, d), jnp.float32),  # O accumulator
            pltpu.VMEM((hp * cfg.block_q, _STATS_LANES), jnp.float32),  # max m
            pltpu.VMEM((hp * cfg.block_q, _STATS_LANES), jnp.float32),  # sum l
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_mb * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=calc_self_attn_flop(seq_q, d, heads, batch),
            bytes_accessed=(batch * heads * (2 * seq_q + 2 * seq_kv * num_q)
                            * d * cfg.dtype.bytes),
            transcendentals=batch * heads * seq_q * seq_kv,
        ),
        interpret=interpret,
        debug=debug,
    )


def _fori_entry(cfg, scale, num_kv, group, has_sinks, return_lse, *refs):
    """Ref-order shim: pallas passes inputs, then outputs, then scratch.

    Inputs are (q, k_hbm, v_hbm[, sinks]); outputs (o[, lse]); scratch
    (k_buf, v_buf, sems).
    """
    q_ref, k_hbm, v_hbm = refs[:3]
    i = 3
    sinks_ref = refs[i] if has_sinks else None
    i += 1 if has_sinks else 0
    o_ref = refs[i]
    lse_ref = refs[i + 1] if return_lse else None
    k_buf, v_buf, sems = refs[-3:]
    _fori_kernel(cfg, scale, num_kv, group, q_ref, k_hbm, v_hbm, o_ref,
                 k_buf, v_buf, sems, sinks_ref=sinks_ref, lse_ref=lse_ref)


def _fori_kernel(cfg: KernelConfig, scale: float, num_kv: int, group: int,
                 q_ref, k_hbm, v_hbm, o_ref,
                 k_buf, v_buf, sems, sinks_ref=None, lse_ref=None):
    bi = pl.program_id(0)
    hp = cfg.head_pack
    # With head packing (GQA only: hp <= group, so ONE KV head serves the
    # whole program — its blocks are DMA'd once instead of once per Q
    # head), program p1 covers Q heads [p1*hp, (p1+1)*hp).
    hi = (pl.program_id(1) * hp) // group if group > 1 else pl.program_id(1)
    qi = pl.program_id(2)
    # q_offset shifts every q row's global position (offset-causal:
    # chunked prefill over [prefix | chunk] KV); 0 = standard causal.
    q_span = qi * cfg.block_q + cfg.q_offset
    nbuf = max(cfg.num_kv_buffers, 1)
    qs_n = cfg.q_splits
    sub = cfg.block_q // qs_n

    if cfg.causal:
        # True early exit: only visible KV blocks are ever visited (the FORI
        # variant's advantage over GRID masking).
        last_excl = jnp.minimum(
            (q_span + cfg.block_q + cfg.block_kv - 1) // cfg.block_kv, num_kv
        )
        if cfg.window:
            # ...and with a sliding window, blocks entirely below every
            # row's window are never fetched either.
            first_block = jnp.maximum(q_span - cfg.window + 1, 0) // cfg.block_kv
            # First block above EVERY row's window lower edge:
            # kv_start >= q_span + block_q - window.
            lo_clear = (jnp.maximum(q_span + cfg.block_q - cfg.window, 0)
                        + cfg.block_kv - 1) // cfg.block_kv
        else:
            first_block = 0
            lo_clear = 0
        n_steps = last_excl - first_block
        # Mask elision: steps [lo_clear, hi_clear) are fully visible for
        # every row of the Q block (last column <= the block's first row;
        # above every row's window), so they skip the mask's VPU pass.
        # Steps outside run the masked body. Expressed in step (not block)
        # coordinates, clamped so the three fori_loop ranges nest.
        hi_clear = (q_span + 1) // cfg.block_kv
        lo_clear = jnp.clip(lo_clear, first_block, last_excl) - first_block
        hi_clear = jnp.clip(hi_clear, first_block, last_excl) - first_block
        hi_clear = jnp.maximum(hi_clear, lo_clear)
    else:
        first_block = 0
        n_steps = num_kv
        lo_clear = hi_clear = None

    def kv_block_of(step):
        return (num_kv - 1 - step) if cfg.reverse_kv else first_block + step

    def dma(slot, step):
        blk = kv_block_of(step)
        start = blk * cfg.block_kv
        k_dma = pltpu.make_async_copy(
            k_hbm.at[bi, hi, pl.ds(start, cfg.block_kv), :],
            k_buf.at[slot], sems.at[0, slot],
        )
        v_dma = pltpu.make_async_copy(
            v_hbm.at[bi, hi, pl.ds(start, cfg.block_kv), :],
            v_buf.at[slot], sems.at[1, slot],
        )
        return k_dma, v_dma

    # Q sub-tiles: hp packed heads x qs_n row splits, each an independent
    # online-softmax chain (same overlap levers as the GRID kernel).
    qs, spans = [], []
    for g in range(hp):
        qg = q_ref[0, g]
        if cfg.scale_q:
            c0 = (scale * LOG2E) if cfg.use_exp2 else scale
            qg = (qg.astype(jnp.float32) * c0).astype(qg.dtype)
        for i in range(qs_n):
            qs.append(qg[i * sub:(i + 1) * sub])
            spans.append(q_span + i * sub)

    def attend_one(j, slot, step, m, l, acc, mask):
        kv_start = kv_block_of(step) * cfg.block_kv
        if cfg.kv_splits > 1:
            return _attend_block_split(
                cfg, scale, qs[j], k_buf[slot], v_buf[slot], spans[j],
                kv_start, m, l, acc, mask=mask,
            )
        s = jax.lax.dot_general(
            qs[j], k_buf[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_mm_precision(cfg),
        )
        return _attend_block(cfg, scale, s, v_buf[slot], spans[j], kv_start,
                             m, l, acc, mask=mask)

    def attend(slot, step, carry, mask):
        # Per-sub-tile independent chains against the SHARED KV slot;
        # Mosaic overlaps chain j's VPU exp pass with chain j+1's matmuls.
        ms, ls, accs = carry
        out_m, out_l, out_acc = [], [], []
        for j in range(hp * qs_n):
            m, l, acc = attend_one(j, slot, step, ms[j], ls[j], accs[j], mask)
            out_m.append(m)
            out_l.append(l)
            out_acc.append(acc)
        return tuple(out_m), tuple(out_l), tuple(out_acc)

    if nbuf == 1:
        # Ladder step 1 "base": fully synchronous copies, no overlap
        # (analogue of the reference's non-async_copy config,
        # previous_kernels/src_1-7).
        def make_body(mask):
            def body(step, carry):
                k_dma, v_dma = dma(0, step)
                k_dma.start(); v_dma.start()
                k_dma.wait(); v_dma.wait()
                return attend(0, step, carry, mask)
            return body
    else:
        # Double(+)-buffered: kick off block step+1 while computing step
        # (ladder steps 3-4: eager loads, LD/ST interleaved with compute).
        k0, v0 = dma(0, 0)
        k0.start(); v0.start()

        def make_body(mask):
            def body(step, carry):
                slot = jax.lax.rem(step, nbuf)
                next_slot = jax.lax.rem(step + 1, nbuf)

                @pl.when(step + 1 < n_steps)
                def _():
                    kn, vn = dma(next_slot, step + 1)
                    kn.start(); vn.start()

                kc, vc = dma(slot, step)
                kc.wait(); vc.wait()
                return attend(slot, step, carry, mask)
            return body

    init = (
        tuple(jnp.full((sub, _STATS_LANES), MASK_VALUE, jnp.float32)
              for _ in range(hp * qs_n)),
        tuple(jnp.zeros((sub, _STATS_LANES), jnp.float32)
              for _ in range(hp * qs_n)),
        tuple(jnp.zeros((sub, cfg.d_head), jnp.float32)
              for _ in range(hp * qs_n)),
    )
    if cfg.causal and cfg.mask_elide:
        # Three phases sharing one DMA pipeline (the step index runs
        # through): masked lead-in (window lower edge), mask-free interior,
        # masked diagonal tail. Opt-in (configs.KernelConfig.mask_elide):
        # at Llama shapes the per-program walk is 1-4 blocks, and three
        # while-loops cost more than the elided mask pass saves (measured
        # 76.6 -> 71.7 TFLOP/s on v5e) — worthwhile only when the clear
        # interior spans many blocks.
        carry = jax.lax.fori_loop(0, lo_clear, make_body(True), init)
        carry = jax.lax.fori_loop(lo_clear, hi_clear, make_body(False), carry)
        carry = jax.lax.fori_loop(hi_clear, n_steps, make_body(True), carry)
    else:
        carry = jax.lax.fori_loop(0, n_steps, make_body(cfg.causal), init)
    ms, ls, accs = carry
    for g in range(hp):
        for i in range(qs_n):
            j = g * qs_n + i
            rows = slice(i * sub, (i + 1) * sub)
            m_col = ms[j][:, :1]
            l_col = ls[j][:, :1]
            acc = accs[j]
            if sinks_ref is not None:
                acc, l_col, m_col = _sink_merge(
                    cfg, sinks_ref[pl.program_id(1) * hp + g],
                    m_col, l_col, acc)
            o_ref[0, g, rows, :] = (acc / l_col).astype(o_ref.dtype)
            if lse_ref is not None:
                # Same residual as the GRID kernel: natural-log row LSE of
                # the scaled scores, sink included when present.
                if cfg.use_exp2:
                    lse = (m_col + jnp.log2(l_col)) * (1.0 / LOG2E)
                else:
                    lse = m_col + jnp.log(l_col)
                lse_ref[0, g, rows, :] = lse


def _build_fori_call(cfg: KernelConfig, scale: float, batch: int, heads: int,
                     seq_q: int, seq_kv: int, interpret: bool, debug: bool = False,
                     kv_heads: int | None = None, return_lse: bool = False,
                     has_sinks: bool = False):
    num_q = seq_q // cfg.block_q
    num_kv = seq_kv // cfg.block_kv
    d = cfg.d_head
    nbuf = max(cfg.num_kv_buffers, 1)
    group = heads // (kv_heads or heads)
    hp = cfg.head_pack
    if hp > 1:
        # FORI packing shares the single manual KV DMA stream, so a
        # program's packed Q heads must all read the SAME KV head:
        # hp <= group with group % hp == 0 (GQA only). Degrade otherwise —
        # see the GRID builder for why degrading beats raising.
        while hp > 1 and (heads % hp or group % hp or hp > group):
            hp //= 2
        if hp != cfg.head_pack:
            import dataclasses

            cfg = dataclasses.replace(cfg, head_pack=hp)
    kernel = functools.partial(_fori_entry, cfg, scale, num_kv, group,
                               has_sinks, return_lse)
    out_dtype = cfg.resolved_out_dtype.jnp_dtype

    in_specs = [
        pl.BlockSpec((1, hp, cfg.block_q, d), lambda b, h, qi: (b, h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # K stays in HBM, DMA'd manually
        pl.BlockSpec(memory_space=pl.ANY),  # V likewise
    ]
    if has_sinks:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    out_specs = pl.BlockSpec((1, hp, cfg.block_q, d),
                             lambda b, h, qi: (b, h, qi, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((batch, heads, seq_q, d), out_dtype)
    if return_lse:
        out_specs = (out_specs,
                     pl.BlockSpec((1, hp, cfg.block_q, 1),
                                  lambda b, h, qi: (b, h, qi, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((batch, heads, seq_q, 1), jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=(batch, heads // hp, num_q),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nbuf, cfg.block_kv, d), cfg.dtype.jnp_dtype),
            pltpu.VMEM((nbuf, cfg.block_kv, d), cfg.dtype.jnp_dtype),
            pltpu.SemaphoreType.DMA((2, nbuf)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=cfg.vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
        debug=debug,
    )


# ---------------------------------------------------------------------------
# Public builders.
# ---------------------------------------------------------------------------


def _validate(cfg: KernelConfig, q, k, v):
    """Input validation (analogue of flash_attention.cu:38-58)."""
    if q.ndim != 4:
        raise ValueError(f"expected (batch, heads, seq, d_head), got {q.shape}")
    if k.shape != v.shape:
        raise ValueError(f"K/V shape mismatch: {k.shape} vs {v.shape}")
    if q.shape[0] != k.shape[0] or q.shape[3] != k.shape[3]:
        raise ValueError(f"Q/K shape mismatch: {q.shape} vs {k.shape}")
    if q.shape[1] % k.shape[1] != 0:
        raise ValueError(
            f"GQA requires q_heads % kv_heads == 0: {q.shape[1]} vs {k.shape[1]}"
        )
    if q.shape[3] != cfg.d_head:
        raise ValueError(f"d_head mismatch: config {cfg.d_head}, tensors {q.shape[3]}")
    if jnp.dtype(q.dtype) != jnp.dtype(cfg.dtype.jnp_dtype):
        raise ValueError(f"dtype mismatch: config {cfg.dtype}, tensors {q.dtype}")
    if q.shape[2] % cfg.block_q != 0:
        raise ValueError(f"seq_q {q.shape[2]} not divisible by block_q {cfg.block_q}")
    if k.shape[2] % cfg.block_kv != 0:
        raise ValueError(f"seq_kv {k.shape[2]} not divisible by block_kv {cfg.block_kv}")


def make_flash_forward(cfg: KernelConfig, batch: int, heads: int, seq_q: int,
                       seq_kv: int, scale: float | None = None,
                       interpret: bool | None = None, debug: bool = False,
                       kv_heads: int | None = None, return_lse: bool = False,
                       has_sinks: bool = False):
    """Build the pallas_call for one (config, shape) specialization.

    The analogue of one template instantiation in the reference's generated
    dispatch table (``flash_kernels.cuh:14-186``); callers should go through
    :func:`flash_forward` / ``dispatch.forward`` which cache these.
    ``kv_heads`` (default ``heads``) enables grouped-query attention: Q head
    ``h`` attends over KV head ``h // (heads // kv_heads)``.
    ``has_sinks`` adds a trailing (heads,) fp32 input of per-head attention
    sink logits (GPT-OSS-style), merged into the final normalization.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(cfg.d_head)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if cfg.kv_loop == KVLoop.GRID:
        return _build_grid_call(cfg, scale, batch, heads, seq_q, seq_kv, interpret,
                                debug, kv_heads, return_lse, has_sinks)
    return _build_fori_call(cfg, scale, batch, heads, seq_q, seq_kv, interpret,
                            debug, kv_heads, return_lse, has_sinks)


def _fold_args(batch, heads, kv_heads, seq_q, seq_kv):
    """Reshape closures for cfg.fold_batch: (b, h, s, d) <-> (1, b*h, s, d).

    A pure relabeling — every (batch, head) slice is an independent
    attention problem, and GQA grouping is preserved because
    (b*H + h) // group == b*H_kv + h // group. Contiguous reshapes, so XLA
    emits no copy; per-head sinks tile ``batch`` times.
    """
    def fold(q, k, v, sinks=None):
        qf = q.reshape(1, batch * heads, seq_q, q.shape[-1])
        kf = k.reshape(1, batch * kv_heads, seq_kv, k.shape[-1])
        vf = v.reshape(1, batch * kv_heads, seq_kv, v.shape[-1])
        sf = jnp.tile(sinks, batch) if sinks is not None else None
        return qf, kf, vf, sf

    def unfold(out):
        return out.reshape(batch, heads, seq_q, out.shape[-1])

    return fold, unfold


@functools.lru_cache(maxsize=256)
def _cached_decomposed(cfg: KernelConfig, scale: float, interpret: bool):
    """One jit over the row-band causal decomposition + sink fold.

    The banding is a composite of cached pallas calls and two concats;
    jitting the composite keeps it one device program instead of a
    per-piece dispatch chain. Sinks fold in at the very end (the band
    partials are sink-free): lse' = logaddexp(lse, z) and O rescales by
    exp(lse - lse'), the same algebra as the in-kernel merge.
    """
    from .causal_decomp import causal_forward_banded

    def run(q, k, v, *sinks):
        out, lse = causal_forward_banded(q, k, v, cfg, scale=scale,
                                         interpret=interpret)
        if sinks:
            z = sinks[0].astype(jnp.float32)[None, :, None]
            lse_tot = jnp.logaddexp(lse, z)
            out = (out.astype(jnp.float32)
                   * jnp.exp(lse - lse_tot)[..., None]).astype(out.dtype)
            lse = lse_tot
        return out, lse

    return jax.jit(run)


@functools.lru_cache(maxsize=512)
def _cached_forward(cfg: KernelConfig, batch: int, heads: int, seq_q: int,
                    seq_kv: int, scale: float, interpret: bool, kv_heads: int,
                    has_sinks: bool = False):
    fb = cfg.fold_batch and batch > 1
    cb, ch, ckv = (1, batch * heads, batch * kv_heads) if fb else (
        batch, heads, kv_heads)
    call = make_flash_forward(cfg, cb, ch, seq_q, seq_kv, scale, interpret,
                              kv_heads=ckv, has_sinks=has_sinks)
    if fb:
        fold, unfold = _fold_args(batch, heads, kv_heads, seq_q, seq_kv)

        def run_folded(q, k, v, sinks=None):
            qf, kf, vf, sf = fold(q, k, v, sinks)
            out = call(qf, kf, vf, *(() if sf is None else (sf,)))
            return unfold(out)

        if has_sinks:
            return jax.jit(lambda q, k, v, sinks: run_folded(q, k, v, sinks))
        return jax.jit(lambda q, k, v: run_folded(q, k, v))
    if has_sinks:
        return jax.jit(lambda q, k, v, sinks: call(q, k, v, sinks))
    return jax.jit(lambda q, k, v: call(q, k, v))


def flash_forward(q, k, v, cfg: KernelConfig | None = None, *,
                  scale: float | None = None, interpret: bool | None = None,
                  sinks=None):
    """Flash attention forward: softmax(Q K^T * scale) V, fused on the MXU.

    Public entry point (analogue of ``flash_attention.forward``,
    ``flash_attention/__init__.py:7-11``). Inputs (batch, heads, seq, d_head).
    ``sinks`` (optional, (heads,) fp32): GPT-OSS-style per-head attention
    sink logits — softmax is taken over [scaled scores, sink] with the sink
    column dropped, i.e. the sink joins the denominator only.
    """
    if cfg is None:
        cfg = KernelConfig.for_shape(
            q.shape[2], k.shape[2],
            dtype=DType.from_jnp(q.dtype), d_head=q.shape[-1],
            heads=q.shape[1], kv_heads=k.shape[1], batch=q.shape[0],
        )
    _validate(cfg, q, k, v)
    if sinks is not None and sinks.shape != (q.shape[1],):
        raise ValueError(
            f"sinks must be (heads,) = ({q.shape[1]},), got {sinks.shape}")
    if scale is None:
        scale = 1.0 / math.sqrt(cfg.d_head)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if cfg.decompose and k.shape[2] == q.shape[2] + cfg.q_offset:
        fn = _cached_decomposed(cfg, float(scale), interpret)
        if sinks is not None:
            return fn(q, k, v, sinks.astype(jnp.float32))[0]
        return fn(q, k, v)[0]
    fn = _cached_forward(cfg, q.shape[0], q.shape[1], q.shape[2], k.shape[2],
                         float(scale), interpret, k.shape[1],
                         sinks is not None)
    if sinks is not None:
        return fn(q, k, v, sinks.astype(jnp.float32))
    return fn(q, k, v)


@functools.lru_cache(maxsize=512)
def _cached_forward_lse(cfg: KernelConfig, batch: int, heads: int, seq_q: int,
                        seq_kv: int, scale: float, interpret: bool, kv_heads: int,
                        has_sinks: bool = False):
    fb = cfg.fold_batch and batch > 1
    cb, ch, ckv = (1, batch * heads, batch * kv_heads) if fb else (
        batch, heads, kv_heads)
    call = make_flash_forward(cfg, cb, ch, seq_q, seq_kv, scale, interpret,
                              kv_heads=ckv, return_lse=True,
                              has_sinks=has_sinks)

    def run(q, k, v, *sinks):
        if fb:
            fold, unfold = _fold_args(batch, heads, kv_heads, seq_q, seq_kv)
            qf, kf, vf, sf = fold(q, k, v, *sinks)
            out, lse = call(qf, kf, vf, *(() if sf is None else (sf,)))
            return unfold(out), lse[..., 0].reshape(batch, heads, seq_q)
        out, lse = call(q, k, v, *sinks)
        return out, lse[..., 0]  # (b, h, seq_q)

    return jax.jit(run)


def flash_forward_with_lse(q, k, v, cfg: KernelConfig | None = None, *,
                           scale: float | None = None,
                           interpret: bool | None = None, sinks=None):
    """Forward pass that also returns the per-row log-sum-exp residual.

    ``lse`` is (batch, heads, seq_q) fp32 in the natural-log domain of the
    *scaled* scores: ``lse[r] = log sum_k exp(scale * q_r . k_k)`` — exactly
    what the backward kernels need to reconstruct P without renormalizing.
    With ``sinks``, the sink logit joins the sum, so the recomputed
    ``P = exp(s - lse)`` rows sum to ``1 - sink_weight`` as in the forward.
    """
    if cfg is None:
        cfg = KernelConfig.for_shape(
            q.shape[2], k.shape[2],
            dtype=DType.from_jnp(q.dtype), d_head=q.shape[-1],
            heads=q.shape[1], kv_heads=k.shape[1], batch=q.shape[0],
        )
    _validate(cfg, q, k, v)
    if scale is None:
        scale = 1.0 / math.sqrt(cfg.d_head)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if cfg.decompose and k.shape[2] == q.shape[2] + cfg.q_offset:
        fn = _cached_decomposed(cfg, float(scale), interpret)
        if sinks is not None:
            return fn(q, k, v, sinks.astype(jnp.float32))
        return fn(q, k, v)
    fn = _cached_forward_lse(cfg, q.shape[0], q.shape[1], q.shape[2], k.shape[2],
                             float(scale), interpret, k.shape[1],
                             sinks is not None)
    if sinks is not None:
        return fn(q, k, v, sinks.astype(jnp.float32))
    return fn(q, k, v)
