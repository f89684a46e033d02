"""Row-band causal attention: every band at the whole-KV single-shot rate.

The round-4 causal-throughput finding (profiles/causal_llama_r4.csv): every
kernel that walks the triangle with small KV tiles — FORI early-exit, the
TRI pair-enumerated grid — tops out near HALF the chip's whole-KV
implementation rate (~95-105 vs 174-189 TFLOP/s), because a 1-4 step
online-softmax chain per program cannot overlap its serial QK -> exp -> PV
chain the way a single-shot whole-KV program does. The GRID whole-KV causal
kernel runs at ~93% of the ceiling but computes the full rectangle,
wasting half its work above the diagonal.

This module takes the third path: split the Q rows into horizontal BANDS.
Band i (rows [i*L, (i+1)*L)) sees exactly the KV prefix [0, (i+1)*L), so it
runs ONE offset-causal whole-KV single-shot call over that prefix — the
shape the chip likes best — and wastes only the above-diagonal half of its
LAST LxL corner. With n bands the visited/visible ratio is
(sum_{i=1..n} i) / (n^2/2 + n/2) -> ~1.11 at n=8, so the credited rate
approaches ~0.9x the single-shot rate. Unlike an LSE-merge decomposition
(tried first: the fp32 merge/concat traffic ate ~18%), bands need NO merge
at all — each band's rows are complete, outputs simply concatenate.

Sliding windows (round 5): a window only CLIPS each band's visible KV range
from below — band i sees [max(0, i*L - W + 1), (i+1)*L) — so the band is
still one offset-causal call, now over a ~(L + W)-wide slice instead of the
full prefix, with the kernel's own window mask handling the ragged lower
edge inside the slice. Chunked prefill (caller ``q_offset`` > 0) shifts
every band's diagonal by the chunk start the same way. Both lift the
round-4 restriction that kept Mistral-window / offset layers on the
monolithic walks (VERDICT r4 #6).

Forward-only dispatch: each band's LSE is the full problem's LSE for its
rows, so autodiff's backward runs the standard FA2 kernels on the whole
problem unchanged (ops/autodiff.py).

Measured on v5e (Llama 32/8-GQA, chain timer): see
profiles/causal_llama_r4.csv — the `dc` rows — and the round-5 windowed
rows in profiles/window_v5e.csv.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .configs import KernelConfig

__all__ = ["causal_forward_banded", "band_count"]


def band_count(seq: int, band_rows: int = 512) -> int:
    """Bands of ~band_rows rows; clamped to [1, 32] and to divisors.

    More bands shave the diagonal overshoot (ratio (n+1)/n -> 1) but add
    per-call fixed cost and one extra compile per distinct width. 512-row
    bands measured best on v5e at every length — the round-4 clamp to 16
    bands silently widened 16K's bands to 1024 rows and cost 25 TFLOP/s
    (152.9 vs 177.5-179.9 with 32 true 512-row bands,
    profiles/causal_llama_r5.csv — the round-4 "16K dip" in full).
    """
    n = max(1, min(32, seq // band_rows))
    while seq % n:
        n -= 1
    return n


def causal_forward_banded(q, k, v, cfg: KernelConfig, *,
                          scale: float | None = None,
                          interpret: bool | None = None,
                          bands: int | None = None,
                          band_rules=None):
    """(out, lse) for causal attention via row-band decomposition.

    Handles plain causal, sliding windows, logit softcaps, and offset-
    causal chunked prefill (``cfg.q_offset``): band i's visible KV range is
    the clipped prefix ``[max(0, lo_edge), base + (i+1)*rows)`` where
    ``lo_edge`` is the window's lower edge at the band's first row — one
    offset-causal single-shot call over the slice, with the in-kernel
    window mask covering the ragged edge inside it.

    ``cfg`` supplies the per-band knobs (dtype, block_q, overlap levers);
    each band runs with ``block_kv`` = its whole visible KV slice
    (single-shot softmax) and ``q_offset`` re-aligned to the slice start.
    S-tile VMEM budget caps the widest band; beyond it the band's block_kv
    clamps and the call becomes a short multi-step walk (still at most 2
    steps at 32K with q512).
    """
    if not cfg.causal:
        raise ValueError("causal_forward_banded requires causal masking")
    base = cfg.q_offset
    if k.shape[2] != q.shape[2] + base:
        raise ValueError(
            "banding assumes (chunked) self-attention: seq_kv must equal "
            f"q_offset + seq_q, got {k.shape[2]} != {base} + {q.shape[2]}")
    from .flash_forward import flash_forward_with_lse

    seq = q.shape[2]
    n = bands if bands is not None else band_count(seq)
    rows = seq // n
    outs, lses = [], []
    for i in range(n):
        width_end = base + (i + 1) * rows
        # Window: the band's lowest row (global pos base + i*rows) sees
        # nothing below pos - window + 1; clip the slice there, aligned so
        # the WIDTH stays a multiple of 128 lanes (alignment taken from
        # width_end, which is a row-count multiple).
        if cfg.window:
            lo = max(0, base + i * rows - cfg.window + 1)
            kv_start = max(0, width_end - -(-(width_end - lo) // 128) * 128)
        else:
            kv_start = 0
        width = width_end - kv_start
        qb = q[:, :, i * rows:(i + 1) * rows, :]
        kb = k[:, :, kv_start:width_end, :]
        vb = v[:, :, kv_start:width_end, :]
        # Whole-slice KV while the fp32 S tile fits the measured budget;
        # past that the largest fitting divisor (a 2-3 step walk).
        bq = min(cfg.block_q, rows)
        while rows % bq:
            bq //= 2
        bkv_cap = max(KernelConfig.S_TILE_BUDGET_BYTES // (4 * bq), 128)
        bkv = min(width, bkv_cap)
        while width % bkv:
            bkv -= 128
        # Per-band overlap knobs follow the whole-KV sweep winners for the
        # band's WIDTH (configs._SWEEP_TABLE): narrow bands take the
        # caller's head packing (GQA group packing measured best <= 4K
        # wide), wide bands trade packed heads for kv sub-splits — an
        # hp4 x 32MB S-tile set at width 16K both busts VMEM and
        # serializes the packed chains (sp5/hp4 measured 0.5-1.8 MB past
        # the 64 MB limit; the 16K non-causal champion is sp8+hp1).
        if band_rules is not None:
            # Sweep hook (tools/tune_bands.py): (band_kv_width) ->
            # (kv_splits target, head_pack target), overriding the
            # measured defaults below.
            sp_t, hp_t = band_rules(bkv)
        elif bkv > 8192:
            # sp4 + hp2 through the widest bands: the round-4 sp8+hp1
            # fallback at >= 12288 (taken from the non-causal sweep)
            # measured 2.5 TFLOP/s worse at band granularity
            # (causal_llama_r5.csv: 179.9 sp4hp2 vs 177.5 at seq 16384).
            sp_t, hp_t = 4, 2
        elif bkv >= 4096:
            # sp2 + the caller's packing measured best through width 8192
            # (seq-8192 sweep: 173.9 vs 166.4 TFLOP/s with an sp4+hp2
            # bucket); beyond 8192 the wider S-tile set flips it.
            sp_t, hp_t = 2, cfg.head_pack
        else:
            sp_t, hp_t = cfg.kv_splits, cfg.head_pack
        sp = max(cfg.kv_splits, sp_t)
        while sp > 1 and bkv % (sp * 128):
            sp //= 2
        band_cfg = dataclasses.replace(
            cfg, block_q=bq, block_kv=bkv,
            q_offset=base + i * rows - kv_start,
            decompose=False,
            kv_splits=sp,
            head_pack=max(1, min(cfg.head_pack, hp_t)),
            q_splits=(cfg.q_splits
                      if bq % (cfg.q_splits * cfg.dtype.min_tile[0]) == 0
                      else 1),
        )
        o, lse = flash_forward_with_lse(qb, kb, vb, band_cfg, scale=scale,
                                        interpret=interpret)
        outs.append(o)
        lses.append(lse)
    return jnp.concatenate(outs, axis=2), jnp.concatenate(lses, axis=2)
