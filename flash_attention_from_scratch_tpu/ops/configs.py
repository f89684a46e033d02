"""Kernel configuration system and analytical FLOP model.

TPU-native re-design of the reference's config universe
(``py/flash_helpers/kernel_configs.py:106-485`` and
``src/include/flash_attention.cuh:34-108``): a single frozen dataclass holds
every tunable knob of the flash-attention forward kernel, derives resource
estimates (VMEM instead of SMEM/registers), prunes the autotuning space, and
round-trips through a canonical short-form string so any tool output (bench
table row, profile entry, test id) maps back to a config.

Unlike the reference there is no C++ mirror or codegen step
(``tools/build/generate_kernel_instantiations.py``): ``jax.jit`` specializes
per config, so the dispatch table is a cache keyed on this dataclass
(see ``dispatch.py``).
"""

from __future__ import annotations

import dataclasses
import enum
import itertools
import os
import re
from typing import Iterable, Sequence

import jax.numpy as jnp

__all__ = [
    "DType",
    "KernelConfig",
    "calc_causal_attn_flop",
    "calc_self_attn_flop",
    "calc_total_flop",
    "calc_tile_softmax_flop",
    "calc_arithmetic_intensity",
    "get_autotuning_kernel_configs",
    "get_kernel_progression_configs",
    "get_kernels_to_build",
    "get_kernel_configs",
    "parse_short_form",
    "should_autotune_config",
]


class DType(enum.Enum):
    """Supported QKV element types.

    The reference mirrors torch ScalarType values to avoid importing torch
    (``kernel_configs.py:9-55``); here the enum carries the jnp dtype and the
    native TPU tile shape (sublane x lane) instead, since tiling — not CUDA
    vector width — is what layout decisions depend on.
    """

    FP32 = ("f32", jnp.float32, (8, 128))
    BF16 = ("bf16", jnp.bfloat16, (16, 128))
    FP16 = ("f16", jnp.float16, (16, 128))
    FP8_E4M3 = ("f8e4m3", jnp.float8_e4m3fn, (32, 128))
    INT8 = ("i8", jnp.int8, (32, 128))

    def __init__(self, short: str, jnp_dtype, min_tile: tuple[int, int]):
        self.short = short
        self.jnp_dtype = jnp_dtype
        self.min_tile = min_tile

    @property
    def bytes(self) -> int:
        return jnp.dtype(self.jnp_dtype).itemsize

    @classmethod
    def from_short(cls, s: str) -> "DType":
        for d in cls:
            if d.short == s:
                return d
        raise ValueError(f"unknown dtype short form: {s!r}")

    @classmethod
    def from_jnp(cls, dt) -> "DType":
        dt = jnp.dtype(dt)
        for d in cls:
            if jnp.dtype(d.jnp_dtype) == dt:
                return d
        raise ValueError(f"unsupported dtype: {dt}")


class KVLoop(enum.Enum):
    """How the KV-block loop is realized.

    GRID: KV blocks are the innermost (``arbitrary``) grid dimension; the
    Pallas pipeline double-buffers the HBM->VMEM copies automatically — the
    TPU-idiomatic analogue of the reference's eager ``cp.async`` prefetch
    (ladder steps 3-5, ``forward_kernel.cuh:39-64``).

    FORI: one grid step per Q block; the kernel loops over KV blocks with
    ``fori_loop`` and drives its own double-buffered ``make_async_copy``
    pipeline from HBM refs — the "hand-rolled" rung of the ladder, and the
    shape needed for causal early-exit and ring attention.

    A third variant — TRI, a flat grid enumerating exactly the visible
    causal (q_block, kv_block) pairs via scalar-prefetched index tables —
    was built and measured in round 4 and REMOVED in round 5: it reached
    only 89.9 TFLOP/s hm at Llama shapes vs the row-band decomposition's
    152.5 (profiles/causal_llama_r4.csv, the `tri2` rows) because its
    per-pair online-softmax chain still serializes QK -> exp -> PV at
    small KV tiles; no shape where it wins was found. The measurement and
    design are documented in PARITY.md §2.5.
    """

    GRID = "grid"
    FORI = "fori"


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """All compile-time knobs of the flash forward kernel.

    TPU analogue of ``FlashForwardKernelConfig`` (13 fields,
    ``kernel_configs.py:106-174`` / ``flash_attention.cuh:34-52``). Every
    field is static: changing any re-specializes the jitted kernel, exactly
    like the reference's template instantiations.
    """

    # Tile shapes (ladder step 7: autotuning domain). Defaults are the
    # autotuned v5e values at seq 4096 (profiles/autotune_r1.csv): large KV
    # blocks amortize the per-grid-step softmax bookkeeping against more MXU
    # work per step.
    block_q: int = 512
    block_kv: int = 1024
    d_head: int = 128

    # Element types.
    dtype: DType = DType.BF16
    out_dtype: DType | None = None  # None -> same as dtype

    # Softmax variants.
    use_exp2: bool = True  # ladder step 6: fold scale*log2(e), use exp2
    optimized_softmax: bool = True  # ladder step 10: specialize first KV block
    cast_p_to_dtype: bool = True  # convert P to 16-bit before PV (ref: load_store.cuh:314)
    # TPU-specific rungs (no CUDA analogue): the softmax path is VPU-bound
    # at large KV blocks, so shave full passes over the S tile.
    fused_scale: bool = False  # max on raw S; scale folded into the exp FMA
    mxu_row_sum: bool = False  # l = P @ ones on the MXU instead of VPU reduce
    scale_q: bool = True  # pre-scale the Q block (d cols) instead of S (kv cols): +13% at seq 4096 on v5e
    # Split-partials softmax: cut each KV block into kv_splits independent
    # sub-tiles, each with a *local* max/sum, merged flash-style at the end
    # (the d_head-wide merge passes cost ~d/block_kv of an S-tile pass).
    # Removing the data dependence between sub-tile i's exp (VPU) and
    # sub-tile i+1's QK^T (MXU) lets Mosaic overlap the two units — the TPU
    # analogue of the reference's ladder step 4 "interleave LD/ST with
    # compute" (forward_kernel.cuh:37-49), except the interleave here is
    # VPU-vs-MXU rather than copy-vs-compute. Measured on v5e at seq 4096:
    # 163 -> 179 TFLOP/s; at seq 16384 it reaches the chip's measured matmul
    # ceiling (187 TFLOP/s).
    kv_splits: int = 1
    # Split-partials along Q rows: independent row sub-tiles inside one
    # program, each with its own scratch rows — same VPU/MXU overlap as
    # kv_splits but with zero merge cost (row stats never cross sub-tiles).
    q_splits: int = 1
    # Whole-head packing: one grid program carries `head_pack` heads, each
    # running its own fully-independent QK^T -> softmax -> PV chain on its
    # own KV tile and scratch rows. Like q_splits the chains never merge,
    # but the tiles stay full-size (no MXU-efficiency loss from slicing)
    # and the per-grid-step fixed cost amortizes over head_pack heads. The
    # small-sequence lever: at seq <= 1024 one program's whole attention is
    # a single (q, kv) shot whose serial chain leaves the MXU idle.
    # GRID kernel only; requires kv_heads == heads (no GQA).
    head_pack: int = 1

    # Batch folding: dispatch reshapes (b, h, s, d) -> (1, b*h, s, d) before
    # the kernel — a free relabeling (every (batch, head) slice is an
    # independent attention problem; GQA group structure is preserved:
    # (b*H + h) // group == b*H_kv + h // group). The point is head_pack:
    # at short sequences the pack is capped by the per-sample head count,
    # and folding lets it amortize the per-program fixed cost across BATCH
    # elements too (the round-3 seq-512 rung was head-limited at hp16).
    fold_batch: bool = False

    # Iteration order / pipelining.
    kv_loop: KVLoop = KVLoop.GRID
    reverse_kv: bool = False  # ladder step 13: backwards KV iteration
    num_kv_buffers: int = 2  # manual-pipeline depth (FORI only)

    # Masking (extension beyond the reference, which is non-causal only).
    causal: bool = False
    # Offset-causal: q row i attends kv columns [0, q_offset + i]. The
    # primitive chunked prefill needs — a chunk starting at global position
    # p runs causal over [prefix | chunk] KV with q_offset = p. 0 keeps the
    # standard top-left alignment (q and kv starts coincide).
    q_offset: int = 0
    # Sliding window (Mistral-style): q position p attends kv positions
    # (p - window, p]. 0 disables. Requires causal; KV blocks entirely
    # below the window are skipped (FORI: never visited; GRID: predicated).
    window: int = 0
    # Row-band decomposition (causal; composes with window / q_offset /
    # softcap): dispatch splits the Q rows into horizontal bands, each
    # running ONE offset-causal whole-KV single-shot call over its visible
    # KV slice — a clipped prefix under a sliding window — so nearly all
    # work lands at the chip's best (whole-KV) rate (ops/causal_decomp.py).
    # Forward-dispatch only — each band's LSE is the full problem's LSE for
    # its rows, so the backward runs the standard FA2 kernels on the whole
    # problem. This config is the LEAF config.
    decompose: bool = False
    # Mask elision: skip the iota+compare+select VPU pass on causal blocks
    # that are fully visible (GRID: per-sub-tile pl.when dual-branch; FORI:
    # the KV walk splits into masked-edge / clear-interior / masked-diagonal
    # fori_loops). MEASURED A NET LOSS on v5e at Llama shapes — the branch
    # duplication / loop splitting costs more than the mask pass saves when
    # the per-program KV loop is only 1-4 blocks long (GRID champion 88 ->
    # 55 TFLOP/s at seq 2048, FORI 76.6 -> 71.7; profiles/causal_llama
    # round-4 probe) — so it defaults OFF and stays available for long-loop
    # shapes where the arithmetic flips.
    mask_elide: bool = False
    # Attention logit softcapping (Gemma-2): s -> cap * tanh(s / cap) on the
    # scaled scores, before masking. 0 disables. The tanh runs in whatever
    # log-base domain the kernel uses (the cap is co-scaled), so it composes
    # with use_exp2/scale_q.
    attn_softcap: float = 0.0

    # Resource hints.
    vmem_limit_mb: int = 64

    def __post_init__(self):
        if self.block_q % 8 != 0 or self.block_kv % 128 != 0:
            raise ValueError(
                f"block_q must be a multiple of 8 (sublane) and block_kv of 128 "
                f"(lane): got ({self.block_q}, {self.block_kv})"
            )
        if self.d_head % 128 != 0:
            raise ValueError(f"d_head must be a multiple of 128: {self.d_head}")
        if self.num_kv_buffers < 1:
            raise ValueError("num_kv_buffers must be >= 1 (1 = synchronous copies)")
        if self.scale_q and self.fused_scale:
            raise ValueError("scale_q and fused_scale are exclusive scale paths")
        if self.causal and self.reverse_kv:
            raise ValueError(
                "causal + reverse_kv unsupported: the first processed KV block "
                "must be fully visible for the online-softmax init"
            )
        if self.decompose and not self.causal:
            raise ValueError(
                "decompose requires causal masking (non-causal shapes are "
                "already one whole-KV single-shot call)")
        if self.q_offset < 0:
            raise ValueError(f"q_offset must be >= 0: {self.q_offset}")
        if self.q_offset and not self.causal:
            raise ValueError("q_offset only applies to causal masking")
        if self.window < 0:
            raise ValueError(f"window must be >= 0: {self.window}")
        if self.window and not self.causal:
            raise ValueError("window only applies to causal masking")
        if self.window and self.optimized_softmax:
            raise ValueError(
                "window + optimized_softmax unsupported: the first-block "
                "softmax specialization assumes KV block 0 is visible, but "
                "a window can hide it")
        if self.attn_softcap < 0:
            raise ValueError(f"attn_softcap must be >= 0: {self.attn_softcap}")
        if self.attn_softcap and self.fused_scale:
            raise ValueError(
                "attn_softcap needs the scaled scores materialized; "
                "fused_scale defers the scale into the exp pass")
        if self.kv_splits < 1:
            raise ValueError("kv_splits must be >= 1")
        if self.kv_splits > 1 and (
            self.block_kv % self.kv_splits or (self.block_kv // self.kv_splits) % 128
        ):
            raise ValueError(
                f"kv_splits {self.kv_splits} must divide block_kv {self.block_kv} "
                "into lane-aligned (multiple-of-128) sub-tiles"
            )
        if self.q_splits < 1:
            raise ValueError("q_splits must be >= 1")
        if self.q_splits > 1:
            sub = self.block_q // self.q_splits
            if self.block_q % self.q_splits or sub % self.dtype.min_tile[0]:
                raise ValueError(
                    f"q_splits {self.q_splits} must divide block_q "
                    f"{self.block_q} into sublane-aligned (multiple-of-"
                    f"{self.dtype.min_tile[0]}) sub-tiles"
                )
        if self.head_pack < 1:
            raise ValueError("head_pack must be >= 1")

    # Largest S/P fp32 tile the kernel should allocate: measured on v5e,
    # block (512, 16384) — a 32 MB tile — still wins (whole-sequence KV
    # blocks skip the online-softmax rescale entirely); the next doubling
    # fails to fit alongside the pipeline buffers.
    S_TILE_BUDGET_BYTES = 32 * 1024 * 1024

    # Best-known knobs per whole-seq-KV bucket, measured on v5e with the
    # in-jit chain timer (profiles/bench_sweep_r3.csv; 16 heads, the
    # reference's per-seq batch table). Columns: upper seq_kv bound ->
    # (preferred_q, kv_splits, q_splits, head_pack). The three overlap
    # levers trade off by shape: head_pack dominates while VMEM allows
    # whole extra heads, q_splits is nearly free everywhere, kv_splits
    # takes over once the S tile is big enough to slice lane-aligned.
    # Round-5 re-measurement (profiles/autotune_r5_shortseq.csv /
    # autotune_r5_seq1024.csv): the round-4 fold_batch lever does NOT move
    # the short-seq corner — at 512 the fb champion beats non-fb by 1.2
    # TFLOP/s (132.8 vs 131.6, inside trial noise), at 1024 fb measures
    # -2 to -4, and hp32+fb fails to compile. The 512 rung is shape
    # physics: a softmax-free XLA matmul chain at that shape sustains only
    # ~181, and the kernel holds ~73% of that shape ceiling.
    _SWEEP_TABLE = (
        (512,   (512, 1, 2, 16)),   # 136.6 TFLOP/s (r5: 131.6-132.8)
        (1024,  (512, 1, 1, 8)),    # 181.8 (r5: 178.5)
        (2048,  (1024, 1, 2, 4)),   # 185.8
        (4096,  (512, 2, 2, 2)),    # 188.5 (autotune_r4: hp2 tops 3 of 5)
        (8192,  (512, 4, 2, 2)),    # 188.9
        (None,  (512, 8, 2, 1)),    # 190.0 at 16384
    )

    @classmethod
    def for_shape(cls, seq_q: int, seq_kv: int, *, preferred_q: int | None = None,
                  preferred_kv: int | None = None, heads: int | None = None,
                  kv_heads: int | None = None, batch: int | None = None,
                  **kwargs) -> "KernelConfig":
        """Best-known config clamped so the blocks tile (seq_q, seq_kv).

        Blocks shrink to the largest hardware-legal divisor of the sequence
        (the runtime analogue of the reference's seq %% B_r == 0 input check,
        ``flash_attention.cu:52-58`` — but auto-adapting instead of erroring).
        KV blocks default to the whole sequence when the S tile fits the
        VMEM budget: one KV step per Q block means a single-shot softmax
        with no running-max rescale (measured +15-17% at seq 8192/16384 on
        v5e). The overlap knobs (kv_splits / q_splits / head_pack) come
        from ``_SWEEP_TABLE``, the measured v5e winners; head_pack needs
        ``heads`` (and no GQA) — without it the GQA-safe fallback adds the
        next overlap lever instead (q_splits, then kv_splits 2).
        """

        def clamp(pref: int, seq: int, quantum: int) -> int:
            b = min(pref, seq)
            b -= b % quantum
            while b > quantum and seq % b:
                b -= quantum
            if b < quantum or seq % b:
                raise ValueError(f"seq {seq} not tileable (quantum {quantum})")
            return b

        for bound, row in cls._SWEEP_TABLE:
            if bound is None or seq_kv <= bound:
                tbl_q, tbl_sp, tbl_qs, tbl_hp = row
                break

        # Q-block quantum: the dtype's native sublane tile (bf16 16, int8 32)
        # so chosen blocks never force a Mosaic relayout.
        dtype = kwargs.get("dtype", DType.BF16)
        if preferred_q is None:
            preferred_q = tbl_q
        bq = clamp(preferred_q, seq_q, dtype.min_tile[0])
        if preferred_kv is None:
            # Whole-sequence KV while the S tile fits the budget; beyond
            # that, the largest block the budget allows.
            preferred_kv = max(cls.S_TILE_BUDGET_BYTES // (4 * bq), 128)
        bkv = clamp(preferred_kv, seq_kv, 128)

        grid = kwargs.get("kv_loop", KVLoop.GRID) == KVLoop.GRID
        hp = 1
        if ("head_pack" not in kwargs and grid and heads
                and heads == (kv_heads or heads)):
            # The measured pack (tbl_hp) may exceed the per-sample head
            # count; batch folding relabels (b, h) -> b*h heads so the pack
            # can amortize across batch elements too (the seq-512 lever).
            pool = heads * (batch or 1)
            hp = next((c for c in (tbl_hp, tbl_hp // 2, tbl_hp // 4, 2)
                       if 1 < c <= tbl_hp and pool % c == 0), 1)
            if hp > 1:
                kwargs["head_pack"] = hp
                if batch and batch > 1 and (heads % hp or hp > heads):
                    kwargs.setdefault("fold_batch", True)
        if hp == 1 and tbl_hp > 1:
            # GQA / unknown-heads fallback: head packing was the bucket's
            # main overlap lever; the next best one is q_splits everywhere,
            # plus kv_splits 2 once the S tile is >= 2048 wide (measured:
            # seq 2048 GQA sp2+qs2 178 vs hp4+qs2 186; at seq <= 1024
            # kv_splits *hurts* — sub-tiles fall below a useful MXU shot).
            tbl_qs = max(tbl_qs, 2)
            if bkv >= 2048:
                tbl_sp = max(tbl_sp, 2)
        if ("kv_splits" not in kwargs and tbl_sp > 1
                and bkv % (tbl_sp * 128) == 0):
            kwargs["kv_splits"] = tbl_sp
        if ("q_splits" not in kwargs and grid and tbl_qs > 1
                and bq % (tbl_qs * dtype.min_tile[0]) == 0):
            kwargs["q_splits"] = tbl_qs
        cfg = cls(block_q=bq, block_kv=bkv, **kwargs)
        # The sweep-table packs were measured at d_head=128; at larger d_head
        # the same pack can blow the VMEM model (e.g. d_head=256 with hp=16
        # is ~100 MB vs the 64 MB limit — a compile-time failure on the
        # auto-config path). Degrade only the pack: when even head_pack=1
        # exceeds the model, the estimate is over-counting a measured-good
        # whole-seq config, so leave those alone.
        grp = heads // kv_heads if (heads and kv_heads) else 1
        if (cfg.head_pack > 1 and not cfg.fits_vmem(grp)
                and dataclasses.replace(cfg, head_pack=1).fits_vmem(grp)):
            while cfg.head_pack > 1 and not cfg.fits_vmem(grp):
                cfg = dataclasses.replace(cfg, head_pack=cfg.head_pack // 2)
        return cfg

    # -- derived properties (analogue of smem_bytes / num_ctas_per_sm,
    #    flash_attention.cuh:54-65) ------------------------------------------

    @property
    def resolved_out_dtype(self) -> DType:
        return self.out_dtype if self.out_dtype is not None else self.dtype

    def vmem_bytes(self, group: int = 1) -> int:
        """Estimated VMEM working set of one grid step.

        Counts the Pallas pipeline's double-buffered input/output windows
        plus the fp32 accumulator and row-statistics scratch. TPU analogue of
        ``FlashForwardKernelConfig::smem_bytes()`` (``flash_attention.cuh:54-56``).

        ``group`` is the GQA group size (q_heads // kv_heads): packed Q heads
        share their group's KV tile, so the kernel holds only
        ``max(1, head_pack // group)`` KV heads per block — charging KV at
        ``head_pack`` would overestimate by up to the group factor and prune
        GQA-packed configs that actually fit.
        """
        b = self.dtype.bytes
        hp = self.head_pack
        kv_pack = max(1, hp // group) if group > 1 else hp
        q = hp * self.block_q * self.d_head * b * 2  # double-buffered by pipeline
        kv = kv_pack * 2 * self.block_kv * self.d_head * b * max(2, self.num_kv_buffers)
        out = hp * self.block_q * self.d_head * self.resolved_out_dtype.bytes * 2
        acc = hp * self.block_q * self.d_head * 4
        stats = 2 * hp * self.block_q * 128 * 4  # m and l, lane-broadcast fp32
        # S/P tile in fp32, one per packed head: the head chains only
        # overlap because EVERY packed head's tile is live concurrently —
        # modeling a single live tile passed q1024_kv8192+sp8+hp2 through
        # the pruner, which then OOMed on chip at 75 MB vs the 64 MB limit.
        p = hp * self.block_q * self.block_kv * 4
        # Split-partials keeps one fp32 accumulator + (m, l) column per
        # sub-tile live until the end-of-block merge.
        partials = (hp * (self.kv_splits - 1)
                    * self.block_q * (self.d_head + 2) * 4)
        return q + kv + out + acc + stats + p + partials

    def fits_vmem(self, group: int = 1) -> bool:
        return self.vmem_bytes(group) <= self.vmem_limit_mb * 1024 * 1024

    # -- canonical short form (analogue of short_form()/parsers,
    #    kernel_configs.py:125-146,177-335) ----------------------------------

    def short_form(self) -> str:
        flags = []
        if self.use_exp2:
            flags.append("x2")
        if self.optimized_softmax:
            flags.append("os")
        if self.cast_p_to_dtype:
            flags.append("cp")
        if self.fused_scale:
            flags.append("fs")
        if self.mxu_row_sum:
            flags.append("ms")
        if self.scale_q:
            flags.append("sq")
        if self.kv_splits > 1:
            flags.append(f"sp{self.kv_splits}")
        if self.q_splits > 1:
            flags.append(f"qs{self.q_splits}")
        if self.head_pack > 1:
            flags.append(f"hp{self.head_pack}")
        if self.fold_batch:
            flags.append("fb")
        if self.mask_elide:
            flags.append("me")
        if self.decompose:
            flags.append("dc")
        if self.reverse_kv:
            flags.append("rk")
        if self.causal:
            flags.append("ca")
        if self.q_offset:
            flags.append(f"qo{self.q_offset}")
        if self.window:
            flags.append(f"wi{self.window}")
        if self.attn_softcap:
            # float-safe in the [a-z0-9+] short-form charset: '.' -> 'p',
            # trailing zeros dropped (50.0 -> sc50, 30.5 -> sc30p5).
            cap = f"{self.attn_softcap:g}".replace(".", "p")
            flags.append(f"sc{cap}")
        flag_s = "+".join(flags) if flags else "none"
        return (
            f"fa_{self.dtype.short}_q{self.block_q}_kv{self.block_kv}"
            f"_d{self.d_head}_{self.kv_loop.value}{self.num_kv_buffers}_{flag_s}"
        )

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return self.short_form()


_SHORT_RE = re.compile(
    r"fa_(?P<dtype>[a-z0-9]+)_q(?P<bq>\d+)_kv(?P<bkv>\d+)_d(?P<d>\d+)"
    r"_(?P<loop>grid|fori)(?P<nbuf>\d+)_(?P<flags>[a-z0-9+]+)"
)


def parse_short_form(s: str) -> KernelConfig:
    """Inverse of :meth:`KernelConfig.short_form`.

    The reference needed three parsers (demangled template, typed symbol,
    table row — ``kernel_configs.py:177-335``) because configs leaked into
    C++ symbol names; here one canonical string suffices.
    """
    m = _SHORT_RE.search(s)
    if not m:
        raise ValueError(f"cannot parse kernel short form from {s!r}")
    flags = set(m.group("flags").split("+")) - {"none"}
    kv_splits = q_splits = head_pack = 1
    q_offset = window = softcap = 0
    for f in flags:
        if f.startswith("sp") and f[2:].isdigit():
            kv_splits = int(f[2:])
        if f.startswith("qs") and f[2:].isdigit():
            q_splits = int(f[2:])
        if f.startswith("hp") and f[2:].isdigit():
            head_pack = int(f[2:])
        if f.startswith("qo") and f[2:].isdigit():
            q_offset = int(f[2:])
        if f.startswith("wi") and f[2:].isdigit():
            window = int(f[2:])
        if f.startswith("sc") and f[2:].replace("p", "").isdigit():
            softcap = float(f[2:].replace("p", "."))
    return KernelConfig(
        kv_splits=kv_splits,
        q_splits=q_splits,
        head_pack=head_pack,
        q_offset=q_offset,
        window=window,
        attn_softcap=float(softcap),
        block_q=int(m.group("bq")),
        block_kv=int(m.group("bkv")),
        d_head=int(m.group("d")),
        dtype=DType.from_short(m.group("dtype")),
        use_exp2="x2" in flags,
        optimized_softmax="os" in flags,
        cast_p_to_dtype="cp" in flags,
        fused_scale="fs" in flags,
        mxu_row_sum="ms" in flags,
        scale_q="sq" in flags,
        fold_batch="fb" in flags,
        mask_elide="me" in flags,
        decompose="dc" in flags,
        reverse_kv="rk" in flags,
        causal="ca" in flags,
        kv_loop=KVLoop(m.group("loop")),
        num_kv_buffers=int(m.group("nbuf")),
    )


# -- FLOP model (port of kernel_configs.py:61-103) ---------------------------


def calc_self_attn_flop(seq_len: int, d_head: int, n_heads: int, batch: int) -> int:
    """Standard attention FLOPs: ``4*s^2*d + 6*s^2`` per head per sample.

    Matches the reference's ``calc_self_attn_flop`` (``kernel_configs.py:102-103``)
    so TFLOPs numbers are comparable across frameworks.
    """
    return batch * n_heads * (4 * seq_len * seq_len * d_head + 6 * seq_len * seq_len)


def calc_causal_attn_flop(seq_len: int, d_head: int, n_heads: int, batch: int,
                          window: int = 0) -> int:
    """Causal attention FLOPs: only visible (q, kv) pairs count.

    Same per-pair cost as :func:`calc_self_attn_flop` (4*d + 6), but summed
    over the visible region: ``s*(s+1)/2`` pairs for plain causal, and
    ``w*s - w*(w-1)/2`` with a sliding window of width ``w`` (each row sees
    ``min(row+1, w)`` columns). The reference is non-causal only, so this has
    no counterpart there; the per-pair model matches so percentages stay
    comparable.
    """
    s = seq_len
    if window and window < s:
        pairs = window * s - window * (window - 1) // 2
    else:
        pairs = s * (s + 1) // 2
    return batch * n_heads * (4 * d_head + 6) * pairs


def calc_tile_softmax_flop(cfg: KernelConfig) -> int:
    """Per-(Q,KV)-tile softmax FLOPs, variant dependent.

    Port of the reference's optimized/unoptimized tile formulas
    (``kernel_configs.py:61-65``): the exp2 path saves one multiply per score
    and folds the running-max subtraction into the exponent scale.
    """
    br, bc, d = cfg.block_q, cfg.block_kv, cfg.d_head
    if cfg.use_exp2:
        return br * (4 * bc + d + 4)
    return br * (5 * bc + d + 2)


def calc_total_flop(cfg: KernelConfig, seq_len: int, n_heads: int, batch: int) -> int:
    """Implementation FLOPs (incl. online-softmax overhead) for the whole call.

    Port of ``calc_total_flop`` (``kernel_configs.py:87-99``).
    """
    n_q = seq_len // cfg.block_q
    n_kv = seq_len // cfg.block_kv
    gemm = 2 * (2 * cfg.block_q * cfg.block_kv * cfg.d_head)  # QK^T and PV
    per_tile = gemm + calc_tile_softmax_flop(cfg)
    return batch * n_heads * n_q * n_kv * per_tile


def calc_arithmetic_intensity(cfg: KernelConfig, seq_len: int) -> float:
    """FLOPs per HBM byte for one (batch, head) slice.

    Analogue of the reference's intensity model (``kernel_configs.py:77-84``):
    Q and O move once; K and V move once per Q block thanks to VMEM reuse
    within a block (the Pallas pipeline revisits them per Q row of the grid).
    """
    b = cfg.dtype.bytes
    flop = 4 * seq_len * seq_len * cfg.d_head
    n_q = seq_len // cfg.block_q
    bytes_moved = (
        2 * seq_len * cfg.d_head * b  # Q in, O out
        + 2 * seq_len * cfg.d_head * b * n_q  # K and V per Q block
    )
    return flop / bytes_moved


# -- autotuning space (port of kernel_configs.py:364-485) --------------------


def should_autotune_config(cfg: KernelConfig) -> bool:
    """Prune the autotune space with resource heuristics.

    The reference pruned on register pressure and CTA occupancy
    (``kernel_configs.py:364-386``); on TPU the budget is VMEM (pipeline
    working set must leave headroom for Mosaic) and MXU utilization (tiles
    smaller than the 128-wide systolic array waste the hot loop).
    """
    if not cfg.fits_vmem():
        return False
    # S tile must tile the MXU: both dims >= 128 keeps full systolic occupancy.
    if cfg.block_q < 128 or cfg.block_kv < 128:
        return False
    # S/P scratch beyond the measured budget fails to fit with the pipeline.
    if cfg.block_q * cfg.block_kv * 4 > KernelConfig.S_TILE_BUDGET_BYTES:
        return False
    return True


def get_autotuning_kernel_configs(
    dtypes: Sequence[DType] = (DType.BF16,),
    d_head: int = 128,
) -> list[KernelConfig]:
    """Cartesian config sweep, pruned (analogue of kernel_configs.py:389-423).

    Default dtype set is bf16-only: unlike sm_80 (where the reference builds
    fp16 and bf16 as equal citizens, ``flash_kernels.cuh:14-186``), the TPU
    v5e MXU has no fp16 mode — fp16 inputs get upconverted, so autotuning it
    doubles the sweep for numbers that merely shadow bf16 (measured platform
    fact, BASELINE.md). Pass ``dtypes=(DType.FP16,)`` explicitly to sweep it
    anyway (it runs fine, via upconvert, and stays interpret-testable).
    """
    out: list[KernelConfig] = []
    for dtype, bq, bkv, rev in itertools.product(
        dtypes, (128, 256, 512, 1024),
        (256, 512, 1024, 2048, 4096, 8192, 16384), (False, True)
    ):
        # Split counts that yield the measured sub-tile sweet spots (~1-2 K
        # lanes) plus the unsplit baseline.
        splits = {1} | {
            bkv // sub for sub in (1024, 2048) if bkv % sub == 0 and bkv > sub
        }
        for sp in sorted(splits):
            # The three overlap levers compose; sweep q_splits and
            # head_pack alongside kv_splits (hp > 1 only without rev —
            # reverse-KV is an independent axis and the combination never
            # measured a win; keeps the space ~2x, not 4x).
            for qs, hp in ((1, 1), (2, 1), (1, 2), (2, 2)):
                if hp > 1 and rev:
                    continue
                if qs > 1 and bq % (qs * dtype.min_tile[0]):
                    continue
                cfg = KernelConfig(
                    block_q=bq, block_kv=bkv, d_head=d_head, dtype=dtype,
                    reverse_kv=rev, kv_splits=sp, q_splits=qs, head_pack=hp,
                )
                if should_autotune_config(cfg):
                    out.append(cfg)
    return out


def get_kernel_progression_configs(dtype: DType = DType.BF16) -> list[tuple[str, KernelConfig]]:
    """The TPU optimization ladder, re-derived from the reference's 16 steps.

    Steps that are CUDA-specific (swizzling, ldmatrix register moves, SASS
    instruction dieting — ladder steps 2, 8-12) have no TPU analogue: VMEM has
    no bank conflicts and Mosaic owns vreg allocation. Steps that survive map
    as follows (reference step numbers in parens):
    """
    base = dict(dtype=dtype, block_q=128, block_kv=128, scale_q=False)
    ladder = [
        # (1) base: synchronous un-pipelined fori loop, no exp2, no
        # specialization. P is still converted to 16-bit before PV — in the
        # reference that conversion is mandatory for the mma
        # (load_store.cuh:314), so it is part of every rung here too.
        ("1_base", KernelConfig(**base, kv_loop=KVLoop.FORI, num_kv_buffers=1,
                                use_exp2=False, optimized_softmax=False)),
        # (3-5) pipelined grid loop: Pallas double-buffers HBM->VMEM.
        ("2_pipelined", KernelConfig(**base, use_exp2=False,
                                     optimized_softmax=False)),
        # (6) exp2 softmax with folded scale.
        ("3_exp2", KernelConfig(**base, use_exp2=True, optimized_softmax=False)),
        # (10) first-KV-block specialization.
        ("4_opt_softmax", KernelConfig(**base)),
        # (13) backwards KV iteration for cross-step locality.
        ("5_reverse_kv", KernelConfig(**base, reverse_kv=True)),
        # (3-5, hand-rolled) manual make_async_copy double buffering — the
        # literal analogue of the reference's cp.async pipeline, to compare
        # against the Pallas-managed one.
        ("6_manual_pipeline", KernelConfig(**base, kv_loop=KVLoop.FORI,
                                           num_kv_buffers=2)),
        # (7) autotuned block shape (refreshed by tools/autotune.py,
        # profiles/autotune_r2.csv).
        ("7_autotuned", KernelConfig(dtype=dtype, block_q=512, block_kv=1024,
                                     scale_q=False)),
        # (TPU-only) fold the softmax scale into the Q block instead of the
        # S tile: one fewer VPU pass over (block_q, block_kv) per step
        # (+13% at seq 4096 on v5e).
        ("8_scale_q", KernelConfig(dtype=dtype, block_q=512, block_kv=1024)),
        # (TPU-only) split-partials softmax: independent sub-tile max/sum
        # merged at block end so Mosaic overlaps the VPU exp pass with the
        # next sub-tile's MXU matmul (163 -> 179 TFLOP/s at seq 4096 on v5e).
        ("9_split_partials", KernelConfig(dtype=dtype, block_q=512,
                                          block_kv=2048, kv_splits=2)),
        # (TPU-only) whole-sequence KV block: one KV step per Q block means
        # a single-shot softmax with no running-max rescale at all. At seq
        # 4096 (the rung measurement shape) the S tile is (512, 4096) fp32 =
        # 8 MB — comfortably inside the 32 MB budget.
        ("10_whole_kv", KernelConfig(dtype=dtype, block_q=512,
                                     block_kv=4096, kv_splits=2)),
        # (TPU-only) q-row sub-tile splits: independent row chains with
        # zero merge cost; re-ranked the winners under the honest in-jit
        # chain timer (121 -> 189 TFLOP/s at seq 4096 combined with the
        # whole-KV rung, profiles/bench_sweep_r3.csv).
        ("11_q_splits", KernelConfig(dtype=dtype, block_q=512,
                                     block_kv=4096, kv_splits=2, q_splits=2)),
        # (TPU-only) whole-head packing: several heads' fully-independent
        # QK->softmax->PV chains per program — the short/mid-seq lever
        # (hp4: +8% at seq 2048; hp16+qs2: +29% at seq 512). At the rung
        # shape (seq 4096) it is VMEM-bound to hp2 and roughly ties rung
        # 11; it is measured here so the ladder records where packing
        # stops paying.
        ("12_head_pack", KernelConfig(dtype=dtype, block_q=512,
                                      block_kv=4096, kv_splits=4,
                                      head_pack=2)),
    ]
    return ladder


def get_kernels_to_build(dtypes: Sequence[DType] = (DType.BF16,)) -> list[KernelConfig]:
    """Everything the test suite parameterizes over (ref kernel_configs.py:457-462)."""
    seen: dict[KernelConfig, None] = {}
    for dt in dtypes:
        for _, cfg in get_kernel_progression_configs(dt):
            seen[cfg] = None
    for cfg in get_autotuning_kernel_configs(dtypes):
        seen[cfg] = None
    return list(seen)


def get_kernel_configs(kind: str | None = None) -> list[KernelConfig]:
    """Env-var driven config selection (ref ``KERNELS=``, kernel_configs.py:465-485).

    ``kind`` (or ``$KERNELS``) is one of ``prog``, ``all``, ``tune``, or an
    explicit ``"<block_q>,<block_kv>"`` pair.
    """
    kind = kind or os.environ.get("KERNELS", "prog")
    if "fa_" in kind:
        # Explicit short-form config(s), ';'-separated — lets any tool be
        # pointed at exactly the kernels a profile row names.
        return [parse_short_form(s) for s in kind.split(";") if s.strip()]
    if kind == "prog":
        return [cfg for _, cfg in get_kernel_progression_configs()]
    if kind == "all":
        return get_kernels_to_build()
    if kind == "tune":
        return get_autotuning_kernel_configs()
    m = re.fullmatch(r"(\d+),(\d+)", kind)
    if m:
        return [KernelConfig(block_q=int(m.group(1)), block_kv=int(m.group(2)))]
    raise ValueError(f"unknown KERNELS selector: {kind!r}")
