"""Flash Attention 2 backward pass as Pallas TPU kernels.

Extension beyond the forward-only reference (``README.md:7-16`` lists "no
backward pass" as an explicit non-goal) — a complete framework needs
training, so this implements the FA2 backward recurrence TPU-natively:

- The forward saves only O and the per-row log-sum-exp
  (``flash_forward_with_lse``); S/P are recomputed blockwise, so backward
  memory is O(seq) like the forward.
- ``D = rowsum(dO * O)`` is precomputed with one fused XLA pass.
- Two kernels, mirroring the FA2 paper's split:
  * **dKV kernel**: grid over KV blocks, walking Q blocks innermost and
    accumulating dK/dV in fp32 VMEM scratch. GQA is native: the grid carries
    a ``group`` dimension so every Q head of the group accumulates into its
    shared KV head's gradient — no materialized K/V repeat, no post-hoc sum.
  * **dQ kernel**: grid over Q blocks, walking KV blocks innermost and
    accumulating dQ.
- Both kernels work in *transposed score space*: the recomputed tile is
  S^T (block_kv, block_q), so the LSE and D row-statistics broadcast along
  lanes for free (a column-side broadcast would cost a sublane<->lane
  relayout per tile on TPU). The dQ contribution contracts S^T's KV
  dimension (dim 0 of both operands) directly on the MXU instead of
  transposing the tile back.
- The exp2 trick carries over: P = exp2(S^T * (scale*log2e) - lse*log2e).

All five tile matmuls (S^T, dP^T, dV, dK, dQ) run on the MXU with bf16
operands and fp32 accumulation — backward is 2.5x the forward FLOPs, same
as the CUDA FA2 backward.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .configs import DType, KernelConfig
from .flash_forward import LOG2E, _mm_precision

__all__ = ["flash_backward", "make_flash_backward",
           "make_flash_backward_fused", "fused_backward_fits"]


def _mask_pt(cfg, pt, q_span, kv_start):
    """Zero P^T entries above the causal diagonal (rows=KV, cols=Q).

    ``q_span`` already carries ``cfg.q_offset`` (offset-causal chunks); with
    a sliding window, entries below the window (q_pos - k_pos >= window) are
    zeroed too — mirroring the forward's mask (flash_forward._attend_block).
    """
    k_pos = kv_start + jax.lax.broadcasted_iota(jnp.int32, pt.shape, 0)
    q_pos = q_span + jax.lax.broadcasted_iota(jnp.int32, pt.shape, 1)
    keep = q_pos >= k_pos
    if cfg.window:
        keep = jnp.logical_and(keep, q_pos - k_pos < cfg.window)
    return jnp.where(keep, pt, 0.0)


def _recompute_pt(cfg, scale, q, k, lse_row, q_span, kv_start):
    """(P^T tile, softcap slope) fp32 from saved LSE (no renormalize).

    With ``attn_softcap`` the forward's logits were cap*tanh(s/cap); P is
    recomputed through the same bend, and the returned slope
    d(capped)/d(s) = 1 - tanh^2 re-scales dS in :func:`_dst_tile`
    (None when no cap). (block_kv, block_q) throughout.
    """
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_mm_precision(cfg),
    )
    dcap = None
    if cfg.attn_softcap:
        t = jnp.tanh(st * (scale / cfg.attn_softcap))
        dcap = 1.0 - t * t
        pt = jnp.exp2((cfg.attn_softcap * LOG2E) * t - lse_row * LOG2E)
    else:
        pt = jnp.exp2(st * (scale * LOG2E) - lse_row * LOG2E)
    if cfg.causal:
        pt = _mask_pt(cfg, pt, q_span, kv_start)
    return pt, dcap


def _dst_tile(cfg, scale, pt, dcap, v, do, d_row):
    """dS^T * scale as a bf16 MXU operand: P^T * (dP^T - D) * [slope] * scale."""
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_mm_precision(cfg),
    )
    dst = pt * (dpt - d_row)
    if dcap is not None:
        dst = dst * dcap
    return (dst * scale).astype(cfg.dtype.jnp_dtype)


def _block_visible(cfg, q_span, kv_start):
    """Does this (Q block, KV block) pair contain any unmasked entry?

    Above-diagonal blocks never do; with a window, blocks entirely below
    every row's window ((kv_start + block_kv - 1) < q_span - window + 1)
    don't either — the same predicate the forward kernels use.
    """
    visible = kv_start <= q_span + cfg.block_q - 1
    if cfg.window:
        visible = jnp.logical_and(
            visible, kv_start + cfg.block_kv - 1 >= q_span - cfg.window + 1)
    return visible


# ---------------------------------------------------------------------------
# dKV kernel: grid (batch, kv_heads, kv_blocks, group, q_blocks).
# ---------------------------------------------------------------------------


def _dkv_kernel(cfg: KernelConfig, scale: float, num_q: int, group: int,
                q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                dk_ref, dv_ref, dk_acc, dv_acc):
    kj = pl.program_id(2)
    g = pl.program_id(3)
    qi = pl.program_id(4)
    is_first = jnp.logical_and(g == 0, qi == 0)
    is_last = jnp.logical_and(g == group - 1, qi == num_q - 1)

    q_row = qi * cfg.block_q  # local row offset into this head's seq_q axis
    q_span = q_row + cfg.q_offset  # global position (offset-causal chunks)
    kv_start = kj * cfg.block_kv

    @pl.when(is_first)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    visible = True
    if cfg.causal:
        # Blocks with no unmasked entry (above the diagonal, or entirely
        # below the window) contribute zero gradient.
        visible = _block_visible(cfg, q_span, kv_start)

    def compute():
        q_full = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do_full = do_ref[0, 0]
        # Sub-tile the Q rows (cfg.q_splits): each sub-tile runs its own
        # independent recompute -> dS chain into the shared accumulators,
        # so Mosaic overlaps sub-tile i's VPU exp/dS pass with sub-tile
        # i+1's MXU matmuls — the backward analogue of the forward's
        # q_splits (measured 135 -> 15x+% at seq 4096, see
        # profiles/backward_v5e.csv).
        sub = cfg.block_q // cfg.q_splits
        for i in range(cfg.q_splits):
            rows = slice(i * sub, (i + 1) * sub)
            q = q_full[rows]
            do = do_full[rows]
            # Row stats arrive as full (1, seq_q) lane rows; slice this
            # sub-tile's (1, sub) window — lanes stay lanes, no relayout.
            lse_row = lse_ref[0, 0, :, pl.ds(q_row + i * sub, sub)]
            d_row = dsum_ref[0, 0, :, pl.ds(q_row + i * sub, sub)]

            pt, dcap = _recompute_pt(cfg, scale, q, k, lse_row,
                                     q_span + i * sub, kv_start)
            pt_mm = pt.astype(cfg.dtype.jnp_dtype)
            # dV_j += P^T dO
            dv_acc[...] += jax.lax.dot_general(
                pt_mm, do, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(cfg),
            )
            # dK_j += (dS^T * scale) Q
            dst = _dst_tile(cfg, scale, pt, dcap, v, do, d_row)
            dk_acc[...] += jax.lax.dot_general(
                dst, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(cfg),
            )

    if cfg.causal:
        @pl.when(visible)
        def _():
            compute()
    else:
        compute()

    @pl.when(is_last)
    def _():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# dQ kernel: grid (batch, heads, q_blocks, kv_blocks).
# ---------------------------------------------------------------------------


def _dq_kernel(cfg: KernelConfig, scale: float, num_kv: int, group: int,
               q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
               dq_ref, dq_acc):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    is_first = ki == 0
    is_last = ki == num_kv - 1

    q_row = qi * cfg.block_q
    q_span = q_row + cfg.q_offset
    kv_start = ki * cfg.block_kv

    @pl.when(is_first)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    visible = True
    if cfg.causal:
        visible = _block_visible(cfg, q_span, kv_start)

    def compute():
        q = q_ref[0, 0]
        k_full = k_ref[0, 0]
        v_full = v_ref[0, 0]
        do = do_ref[0, 0]
        lse_row = lse_ref[0, 0, :, pl.ds(q_row, cfg.block_q)]
        d_row = dsum_ref[0, 0, :, pl.ds(q_row, cfg.block_q)]

        # Sub-tile the KV rows (cfg.kv_splits): independent recompute -> dS
        # chains per sub-tile overlap VPU and MXU work, mirroring the
        # forward's split-partials (no merge needed — dQ just accumulates).
        sub = cfg.block_kv // cfg.kv_splits
        for i in range(cfg.kv_splits):
            rows = slice(i * sub, (i + 1) * sub)
            k = k_full[rows]
            v = v_full[rows]
            pt, dcap = _recompute_pt(cfg, scale, q, k, lse_row, q_span,
                                     kv_start + i * sub)
            dst = _dst_tile(cfg, scale, pt, dcap, v, do, d_row)
            # dQ_i += dS K: contract the KV dim (dim 0 of dS^T and of K) on
            # the MXU directly — the tile never transposes back to (q, kv)
            # space.
            dq_acc[...] += jax.lax.dot_general(
                dst, k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(cfg),
            )

    if cfg.causal:
        @pl.when(visible)
        def _():
            compute()
    else:
        compute()

    @pl.when(is_last)
    def _():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# Fused kernel: grid (batch, kv_heads, group, q_blocks, kv_blocks).
#
# One shared S^T recompute feeds dQ, dK, AND dV — 5 MXU matmuls per
# (Q, KV) tile pair (S^T, dP^T, dV, dK, dQ) instead of the split kernels'
# 7 (each recomputes S^T and dP^T independently). The split layout caps
# backward throughput at 5/7 = 71% of the matmul ceiling even at perfect
# MXU utilization — which is exactly where round 3 measured it (72.9%,
# profiles/backward_v5e.csv); fusing removes that cap.
#
# The fusion trick on TPU: all grid steps of one (batch, kv_head) run
# sequentially on a core, so dK/dV accumulate across the WHOLE (group x
# q_blocks x kv_blocks) sweep in a persistent (seq_kv, d) fp32 VMEM scratch,
# while dQ accumulates per (g, qi) sweep in a (block_q, d) scratch exactly
# like the split dQ kernel. dK/dV blocks stream out only during the final
# (g, qi) sweep — the output index map parks on block 0 until then, so no
# partial/garbage windows are ever flushed over real data.
# ---------------------------------------------------------------------------


def _fused_kernel(cfg: KernelConfig, scale: float, num_q: int, num_kv: int,
                  group: int,
                  q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                  dq_ref, dk_ref, dv_ref, dq_acc, dk_acc, dv_acc):
    g = pl.program_id(2)
    qi = pl.program_id(3)
    kj = pl.program_id(4)

    q_row = qi * cfg.block_q
    q_span = q_row + cfg.q_offset
    kv_start = kj * cfg.block_kv

    @pl.when(jnp.logical_and(jnp.logical_and(g == 0, qi == 0), kj == 0))
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(kj == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    visible = True
    if cfg.causal:
        visible = _block_visible(cfg, q_span, kv_start)

    def compute():
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        # Sub-tile the Q rows (cfg.q_splits): independent recompute -> dS
        # chains (VPU) interleave with the next sub-tile's matmuls (MXU),
        # accumulating into the shared dq/dk/dv scratch.
        sub = cfg.block_q // cfg.q_splits
        for i in range(cfg.q_splits):
            rows = slice(i * sub, (i + 1) * sub)
            q = q_ref[0, 0][rows]
            do = do_ref[0, 0][rows]
            lse_row = lse_ref[0, 0, :, pl.ds(q_row + i * sub, sub)]
            d_row = dsum_ref[0, 0, :, pl.ds(q_row + i * sub, sub)]

            pt, dcap = _recompute_pt(cfg, scale, q, k, lse_row,
                                     q_span + i * sub, kv_start)
            pt_mm = pt.astype(cfg.dtype.jnp_dtype)
            kv_rows = pl.ds(kv_start, cfg.block_kv)
            # dV_j += P^T dO  (the recompute is shared from here on)
            dv_acc[kv_rows, :] += jax.lax.dot_general(
                pt_mm, do, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(cfg),
            )
            dst = _dst_tile(cfg, scale, pt, dcap, v, do, d_row)
            # dK_j += (dS^T * scale) Q
            dk_acc[kv_rows, :] += jax.lax.dot_general(
                dst, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(cfg),
            )
            # dQ_i += dS K — contract dS^T's KV dim (dim 0 of both) on the
            # MXU directly; the tile never transposes back to (q, kv) space.
            dq_acc[rows, :] += jax.lax.dot_general(
                dst, k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mm_precision(cfg),
            )

    if cfg.causal:
        @pl.when(visible)
        def _():
            compute()
    else:
        compute()

    @pl.when(kj == num_kv - 1)
    def _():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)

    # During the final (g, qi) sweep, step kj adds the last contribution to
    # KV block kj — stream it out the same step (unconditionally: a window
    # or the diagonal can hide this (qi, kj) pair, but the block's total is
    # complete regardless).
    @pl.when(jnp.logical_and(g == group - 1, qi == num_q - 1))
    def _():
        kv_rows = pl.ds(kv_start, cfg.block_kv)
        dk_ref[0, 0] = dk_acc[kv_rows, :].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[kv_rows, :].astype(dv_ref.dtype)


def make_flash_backward_fused(cfg: KernelConfig, batch: int, heads: int,
                              seq_q: int, seq_kv: int, kv_heads: int,
                              scale: float, interpret: bool,
                              block_q: int | None = None,
                              block_kv: int | None = None,
                              splits: int | None = None):
    """Build the fused (dq, dk, dv) pallas_call for one shape.

    Tile defaults come from the round-4 v5e chain-timed sweep (fused tiles
    want to be smaller than the split kernels' 2048 cap: the five live
    matmul operands per pair square the VMEM pressure). The (seq_kv, d)
    fp32 dK/dV accumulators bound applicability — the dispatcher falls back
    to the split kernels when they outgrow VMEM (see ``flash_backward``).
    """
    bq = block_q or min(1024, seq_q)
    bkv = block_kv or min(1024, seq_kv)
    while seq_q % bq:
        bq //= 2
    while seq_kv % bkv:
        bkv //= 2
    if splits is None and block_q is None:
        # r4 rung table (profiles/backward_v5e.csv): 1024-tiles + qs2 wins
        # at seq >= 2048 (187.5 vs 173.3 TFLOP/s fwd+bwd at 4096); at
        # seq 1024 the sub-tiling costs more than the overlap buys
        # (163.6 vs 187.9) — q rows per split fall to 512 and the second
        # sub-tile no longer hides a full exp/mask pass.
        splits = 2 if seq_q >= 2048 else 1
    q_splits = splits or 1
    if bq % q_splits or (bq // q_splits) % 128:
        q_splits = 1
    bcfg = KernelConfig(
        block_q=bq, block_kv=bkv, d_head=cfg.d_head, dtype=cfg.dtype,
        causal=cfg.causal, use_exp2=True, q_offset=cfg.q_offset,
        window=cfg.window, attn_softcap=cfg.attn_softcap, q_splits=q_splits,
        optimized_softmax=not cfg.window,
    )
    num_q = seq_q // bq
    num_kv = seq_kv // bkv
    d = cfg.d_head
    group = heads // kv_heads
    in_dtype = cfg.dtype.jnp_dtype

    def q_idx(b, hk, g, qi, kj):
        h = hk * group + g if group > 1 else hk
        return (b, h, qi, 0)

    def kv_idx(b, hk, g, qi, kj):
        return (b, hk, kj, 0)

    def row_idx(b, hk, g, qi, kj):
        h = hk * group + g if group > 1 else hk
        return (b, h, 0, 0)

    def dkv_idx(b, hk, g, qi, kj):
        # Park on block 0 until the final (g, qi) sweep: the window never
        # moves, so no partial accumulations are flushed over real data;
        # during the last sweep it walks kj and streams each finished block.
        last = jnp.logical_and(g == group - 1, qi == num_q - 1)
        return (b, hk, jnp.where(last, kj, 0), 0)

    row_spec = pl.BlockSpec((1, 1, 1, seq_q), row_idx, memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        functools.partial(_fused_kernel, bcfg, scale, num_q, num_kv, group),
        grid=(batch, kv_heads, group, num_q, num_kv),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), q_idx, memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, d), q_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), dkv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), dkv_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, heads, seq_q, d), in_dtype),
            jax.ShapeDtypeStruct((batch, kv_heads, seq_kv, d), in_dtype),
            jax.ShapeDtypeStruct((batch, kv_heads, seq_kv, d), in_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),      # dQ per (g, qi) sweep
            pltpu.VMEM((seq_kv, d), jnp.float32),  # dK whole-sequence
            pltpu.VMEM((seq_kv, d), jnp.float32),  # dV whole-sequence
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )
    return call


def fused_backward_fits(seq_kv: int, d_head: int,
                        vmem_limit_mb: int = 64) -> bool:
    """Do the whole-sequence dK/dV accumulators leave room for the tiles?

    Budget: the two (seq_kv, d) fp32 accumulators at <= half the VMEM
    limit, leaving the other half for the pipeline windows and the live
    S^T/dS^T tiles. At d_head=128 that admits seq_kv <= 32768.
    """
    return 2 * seq_kv * d_head * 4 <= vmem_limit_mb * 1024 * 1024 // 2


# ---------------------------------------------------------------------------
# Builders.
# ---------------------------------------------------------------------------


def make_flash_backward(cfg: KernelConfig, batch: int, heads: int, seq_q: int,
                        seq_kv: int, kv_heads: int, scale: float,
                        interpret: bool,
                        block_q: int | None = None,
                        block_kv: int | None = None,
                        splits: int | None = None):
    """Build (dq_call, dkv_call) for one shape specialization.

    ``block_q``/``block_kv`` default to backward-tuned 2048-capped tiles
    (v5e chain-timed sweep at seq 4096: 512x512 109.8, 1024x1024 129.6,
    2048x2048 134.0 TFLOP/s on the 2.5x-forward FLOP model — bigger tiles
    amortize the serial recompute chain; the forward's whole-seq blocks
    would square the VMEM footprint here, five live (kv, q) tiles instead
    of two). ``splits`` sub-tiles each program's arbitrary-axis tile
    (Q rows in the dKV kernel, KV rows in the dQ kernel) into independent
    recompute->dS chains — the backward analogue of the forward's
    q_splits/kv_splits levers; measured NEUTRAL on v5e (129.6 -> 129.7 at
    sp2, worse at sp4: the backward is not VPU-serialization-bound the way
    the forward was), so it defaults off and stays available for other
    chips.
    """
    bq = block_q or min(2048, seq_q)
    bkv = block_kv or min(2048, seq_kv)
    while seq_q % bq:
        bq //= 2
    while seq_kv % bkv:
        bkv //= 2
    if splits is None:
        splits = 1
    # dKV sub-tiles slice the lane-resident LSE/D rows, so the sub-tile
    # width must stay a multiple of 128 lanes; dQ sub-tiles slice KV
    # sublanes but the S sub-tile's KV dim is lanes-major in the matmuls —
    # same 128 quantum.
    q_splits = splits if (splits > 1 and bq % splits == 0
                          and (bq // splits) % 128 == 0) else 1
    kv_splits = splits if (splits > 1 and bkv % splits == 0
                           and (bkv // splits) % 128 == 0) else 1
    bcfg = KernelConfig(
        block_q=bq, block_kv=bkv, d_head=cfg.d_head, dtype=cfg.dtype,
        causal=cfg.causal, use_exp2=True, q_offset=cfg.q_offset,
        window=cfg.window, attn_softcap=cfg.attn_softcap,
        q_splits=q_splits, kv_splits=kv_splits,
        # optimized_softmax is a forward-only knob the backward never reads;
        # clear it under window to satisfy the config invariant.
        optimized_softmax=not cfg.window,
    )
    num_q = seq_q // bq
    num_kv = seq_kv // bkv
    d = cfg.d_head
    group = heads // kv_heads
    in_dtype = cfg.dtype.jnp_dtype

    def q_idx_dq(b, h, qi, ki):
        return (b, h, qi, 0)

    def kv_idx_dq(b, h, qi, ki):
        return (b, h // group if group > 1 else h, ki, 0)

    def row_idx_dq(b, h, qi, ki):
        return (b, h, 0, 0)

    row_spec_dq = pl.BlockSpec((1, 1, 1, seq_q), row_idx_dq,
                               memory_space=pltpu.VMEM)

    dq_call = pl.pallas_call(
        functools.partial(_dq_kernel, bcfg, scale, num_kv, group),
        grid=(batch, heads, num_q, num_kv),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_idx_dq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_idx_dq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_idx_dq, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), q_idx_dq, memory_space=pltpu.VMEM),
            row_spec_dq,
            row_spec_dq,
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), q_idx_dq, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, heads, seq_q, d), in_dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def q_idx_dkv(b, hk, kj, g, qi):
        h = hk * group + g if group > 1 else hk
        return (b, h, qi, 0)

    def kv_idx_dkv(b, hk, kj, g, qi):
        return (b, hk, kj, 0)

    def row_idx_dkv(b, hk, kj, g, qi):
        h = hk * group + g if group > 1 else hk
        return (b, h, 0, 0)

    row_spec_dkv = pl.BlockSpec((1, 1, 1, seq_q), row_idx_dkv,
                                memory_space=pltpu.VMEM)

    dkv_call = pl.pallas_call(
        functools.partial(_dkv_kernel, bcfg, scale, num_q, group),
        grid=(batch, kv_heads, num_kv, group, num_q),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), q_idx_dkv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_idx_dkv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_idx_dkv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), q_idx_dkv, memory_space=pltpu.VMEM),
            row_spec_dkv,
            row_spec_dkv,
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bkv, d), kv_idx_dkv, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv, d), kv_idx_dkv, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, kv_heads, seq_kv, d), in_dtype),
            jax.ShapeDtypeStruct((batch, kv_heads, seq_kv, d), in_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )
    return dq_call, dkv_call


@functools.lru_cache(maxsize=256)
def _cached_backward(cfg: KernelConfig, batch: int, heads: int, seq_q: int,
                     seq_kv: int, kv_heads: int, scale: float, interpret: bool,
                     fused: bool):
    if fused:
        fused_call = make_flash_backward_fused(
            cfg, batch, heads, seq_q, seq_kv, kv_heads, scale, interpret)
    else:
        dq_call, dkv_call = make_flash_backward(
            cfg, batch, heads, seq_q, seq_kv, kv_heads, scale, interpret)

    def run(q, k, v, o, lse, do):
        # The cotangent arrives in out_dtype; the kernels matmul it against
        # cfg.dtype tiles, so align it (out_dtype is a storage knob only).
        do = do.astype(q.dtype)
        dsum = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
        # Row stats go in as (b, h, 1, seq_q) whole-row lane vectors; the
        # kernels slice per-block windows without relayout.
        lse_r = lse[:, :, None, :]
        dsum_r = dsum[:, :, None, :]
        if fused:
            return fused_call(q, k, v, do, lse_r, dsum_r)
        dq = dq_call(q, k, v, do, lse_r, dsum_r)
        dk, dv = dkv_call(q, k, v, do, lse_r, dsum_r)
        return dq, dk, dv

    return jax.jit(run)


def _bwd_band_count(seq: int, band_rows: int = 1024) -> int:
    """Row-band count for the banded causal backward.

    1024-row bands keep each call's tiles at the fused kernel's measured
    sweet spot (fused_1024, profiles/backward_causal_r5.csv) while the
    visited/visible ratio (n+1)/n stays <= 1.125 from seq 8192 up."""
    n = max(1, min(16, seq // band_rows))
    while seq % n:
        n -= 1
    return n


@functools.lru_cache(maxsize=128)
def _cached_banded_backward(cfg: KernelConfig, batch: int, heads: int,
                            seq: int, kv_heads: int, scale: float,
                            interpret: bool, bands: int):
    """Row-band decomposition of the CAUSAL fused backward — MEASURED LOSS.

    Built and measured in round 5 on the hypothesis that the forward's
    banding win transfers: Q row band i runs ONE non-causal fused call
    over its strictly-past KV prefix plus one causal fused call on its
    diagonal square; prefix dK/dV partials accumulate in fp32. It does
    NOT transfer (profiles/backward_banded_r5.csv vs backward_causal_r5):
    102.2/114.9/125.4 fwd+bwd TFLOP/s at seq 4096/8192/16384 vs the
    monolithic fused kernel's 108.4/119.9/127.9. The forward's banding
    pays because an online-SOFTMAX chain serializes small-tile walks; the
    backward has no online softmax — its per-pair work is independent
    given the LSE, so the monolithic kernel's predication already skips
    invisible pairs' compute, and banding's per-call ramps, small diagonal
    squares, and dK/dV accumulation traffic cost more than the remaining
    grid/DMA slack. Kept reachable via ``flash_backward(..., bands=n)``
    for re-measurement on other chips; never dispatched by default.

    Exactness: each call receives the rows' GLOBAL LSE, so its recomputed
    P block equals the true softmax weights of that (rows, cols) rectangle
    — the same argument that makes the ring backward exact per hop
    (parallel/ring_attention.py).
    """
    rows = seq // bands
    group = heads // kv_heads
    d = cfg.d_head
    import dataclasses as _dc

    diag_cfg = _dc.replace(cfg, q_offset=0, decompose=False)
    rect_cfg = _dc.replace(cfg, causal=False, q_offset=0, window=0,
                           decompose=False)
    bq = min(1024, rows)
    while rows % bq:
        bq //= 2
    diag_call = make_flash_backward_fused(
        diag_cfg, batch, heads, rows, rows, kv_heads, scale, interpret,
        block_q=bq, block_kv=min(1024, rows))
    rect_calls = {}
    for i in range(1, bands):
        w = i * rows
        bkv = min(2048, w)
        while w % bkv:
            bkv -= 128
        rect_calls[w] = make_flash_backward_fused(
            rect_cfg, batch, heads, rows, w, kv_heads, scale, interpret,
            block_q=bq, block_kv=bkv)

    def run(q, k, v, o, lse, do):
        do = do.astype(q.dtype)
        dsum = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                       axis=-1)
        lse_r = lse[:, :, None, :]
        dsum_r = dsum[:, :, None, :]
        dq_parts = []
        dk_acc = jnp.zeros((batch, kv_heads, seq, d), jnp.float32)
        dv_acc = jnp.zeros_like(dk_acc)
        for i in range(bands):
            sl = slice(i * rows, (i + 1) * rows)
            qb, ob, dob = q[:, :, sl], o[:, :, sl], do[:, :, sl]
            lse_b, dsum_b = lse_r[:, :, :, sl], dsum_r[:, :, :, sl]
            dq_d, dk_d, dv_d = diag_call(
                qb, k[:, :, sl], v[:, :, sl], dob, lse_b, dsum_b)
            dq_i = dq_d.astype(jnp.float32)
            dk_acc = dk_acc.at[:, :, sl].add(dk_d.astype(jnp.float32))
            dv_acc = dv_acc.at[:, :, sl].add(dv_d.astype(jnp.float32))
            if i:
                w = i * rows
                dq_p, dk_p, dv_p = rect_calls[w](
                    qb, k[:, :, :w], v[:, :, :w], dob, lse_b, dsum_b)
                dq_i = dq_i + dq_p.astype(jnp.float32)
                dk_acc = dk_acc.at[:, :, :w].add(dk_p.astype(jnp.float32))
                dv_acc = dv_acc.at[:, :, :w].add(dv_p.astype(jnp.float32))
            dq_parts.append(dq_i.astype(q.dtype))
        return (jnp.concatenate(dq_parts, axis=2),
                dk_acc.astype(k.dtype), dv_acc.astype(v.dtype))

    return jax.jit(run)


def flash_backward(q, k, v, o, lse, do, cfg: KernelConfig | None = None, *,
                   scale: float | None = None, interpret: bool | None = None,
                   fused: bool | None = None, bands: int | None = None):
    """Gradients (dq, dk, dv) of ``flash_forward`` from saved (O, LSE).

    Inputs mirror the forward: q (b, h, s_q, d), k/v (b, h_kv, s_kv, d); ``o``
    is the forward output and ``lse`` the residual from
    :func:`flash_forward_with_lse`; ``do`` is the output cotangent.

    ``fused`` selects the single-kernel path (one shared S^T recompute for
    dq/dk/dv — 5 matmuls per tile pair vs the split kernels' 7). Default:
    fused whenever the whole-sequence dK/dV accumulators fit VMEM
    (:func:`fused_backward_fits`); the split kernels remain the long-context
    fallback.

    ``bands`` (explicit only) routes plain-causal self-attention through
    the row-band decomposition — a round-5 MEASURED LOSS kept for
    re-measurement; see :func:`_cached_banded_backward`. The model's
    ``decompose`` configs deliberately do NOT trigger it.
    """
    if cfg is None:
        cfg = KernelConfig.for_shape(
            q.shape[2], k.shape[2],
            dtype=DType.from_jnp(q.dtype), d_head=q.shape[-1],
        )
    if scale is None:
        scale = 1.0 / math.sqrt(cfg.d_head)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    seq = q.shape[2]
    if (bands is not None and bands > 1 and cfg.causal and not cfg.window
            and not cfg.q_offset and seq == k.shape[2]
            and fused is not False
            and fused_backward_fits(seq - seq // bands, cfg.d_head,
                                    cfg.vmem_limit_mb)):
        fn = _cached_banded_backward(
            cfg, q.shape[0], q.shape[1], seq, k.shape[1], float(scale),
            interpret, bands)
        return fn(q, k, v, o, lse, do)
    if fused is None:
        fused = fused_backward_fits(k.shape[2], cfg.d_head, cfg.vmem_limit_mb)
    fn = _cached_backward(cfg, q.shape[0], q.shape[1], q.shape[2], k.shape[2],
                          k.shape[1], float(scale), interpret, bool(fused))
    return fn(q, k, v, o, lse, do)
