"""The optimization ladder: per-rung x per-seq table with harmonic means.

The reference's headline artifact is a 16-rung x 6-seq table of kernel
versions, each rung adding one optimization, with harmonic means per rung
(ref README.md:38-62). This is that table for the TPU ladder: every rung
is a *feature set*, and its block sizes adapt per sequence length the same
way the rung's kernel would be deployed (whole-seq KV means block_kv=seq
at every seq, not one frozen number) — so a rung's column is the rung's
honest best at that shape, and the harmonic-mean column ranks rungs the
way the reference's does.

CUDA-only reference rungs (swizzling, cp.async tuning, register
double-buffering, SASS-level scheduling — steps 2 and 8-12) have no TPU
analogue; their findings are recorded in PARITY.md. In their place the
ladder carries the five TPU-only rungs the CUDA ladder couldn't have:
whole-seq KV single-shot softmax, scale-folded-into-Q, split partial
accumulators (kv_splits), Q sub-tiling (q_splits), and head packing with
GQA group KV sharing.

Timing is the in-jit unrolled chain (`dispatch.chain_runtime`) — pure
device seconds. FLOPs are the non-causal self-attention model, matching
the reference table's convention.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.bench_ladder \
        --csv profiles/ladder_v5e.csv
"""

from __future__ import annotations

import argparse
import csv as csv_mod
import os
import statistics
import subprocess
import sys

import jax

from ..dispatch import chain_runtime
from ..ops.configs import DType, KernelConfig, KVLoop, calc_self_attn_flop
from ..ops.flash_forward import flash_forward
from ..utils.chip import chip_sol_tflops, device_kind, measured_matmul_tflops
from ..utils.testing import BATCH_SIZE_FOR_SEQ_LEN, generate_qkv

__all__ = ["RUNGS", "bench_ladder", "main"]


def _git_commit():
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(__file__), text=True).strip()
    except Exception:  # pragma: no cover
        return "unknown"


def _sp_for(seq: int) -> int:
    """kv_splits winner for whole-seq KV at this length (_SWEEP_TABLE)."""
    return {512: 1, 1024: 1, 2048: 2, 4096: 2, 8192: 4}.get(seq, 8)


def _hp_for(seq: int) -> int:
    """head_pack winner at this length (_SWEEP_TABLE, heads=16 no GQA)."""
    return {512: 16, 1024: 8, 2048: 4, 4096: 2, 8192: 2}.get(seq, 1)


# Each rung: (label, builder(seq, heads, batch) -> KernelConfig). Rungs are
# cumulative — each adds exactly one feature to the previous — EXCEPT the
# three side-quest rungs (same as the reference's shared-memory detours):
# the two FORI rungs (01/06) and 05-reverse-kv. 05 probes the reference's
# step-13 reversed-walk locality at the small-tile shape where it is
# measurable; the mainline resumes from 04 at rung 07 without it, because
# the big-tile rungs' fewer/larger KV steps erase the prefetch-locality
# edge and the whole-seq rungs (09+) have no walk to reverse at all (see
# PARITY.md). Builders may return None to skip a shape.
RUNGS = [
    ("01-naive-fori", lambda s, h, b: KernelConfig(
        block_q=128, block_kv=128, kv_loop=KVLoop.FORI, num_kv_buffers=1,
        use_exp2=False, optimized_softmax=False, scale_q=False)),
    ("02-grid-pipeline", lambda s, h, b: KernelConfig(
        block_q=128, block_kv=128, use_exp2=False, optimized_softmax=False,
        scale_q=False)),
    ("03-exp2", lambda s, h, b: KernelConfig(
        block_q=128, block_kv=128, optimized_softmax=False, scale_q=False)),
    ("04-online-softmax", lambda s, h, b: KernelConfig(
        block_q=128, block_kv=128, scale_q=False)),
    ("05-reverse-kv", lambda s, h, b: KernelConfig(
        block_q=128, block_kv=128, scale_q=False, reverse_kv=True)),
    ("06-fori-dma2", lambda s, h, b: KernelConfig(
        block_q=128, block_kv=128, scale_q=False, kv_loop=KVLoop.FORI,
        num_kv_buffers=2)),
    ("07-big-tiles", lambda s, h, b: KernelConfig(
        block_q=min(512, s), block_kv=min(1024, s), scale_q=False)),
    ("08-scale-q", lambda s, h, b: KernelConfig(
        block_q=min(512, s), block_kv=min(1024, s))),
    ("09-whole-seq-kv", lambda s, h, b: KernelConfig(
        block_q=min(512, s), block_kv=s, kv_splits=_sp_for(s))),
    ("10-q-splits", lambda s, h, b: KernelConfig(
        block_q=min(512, s), block_kv=s, kv_splits=_sp_for(s),
        q_splits=2 if s >= 1024 else 1)),
    ("11-head-pack", lambda s, h, b: KernelConfig(
        block_q=min(512, s), block_kv=s, kv_splits=_sp_for(s),
        q_splits=2 if s >= 1024 else 1, head_pack=_hp_for(s))),
    ("12-champion", lambda s, h, b: KernelConfig.for_shape(
        s, s, heads=h, kv_heads=h, batch=b)),
]


def bench_ladder(seq_lens, heads: int = 16, iters: int = 5, rungs=None,
                 log=print):
    """Returns [(label, {seq: tflops})] in rung order."""
    rungs = rungs if rungs is not None else RUNGS
    out = []
    for label, build in rungs:
        per_seq = {}
        for seq in seq_lens:
            batch = BATCH_SIZE_FOR_SEQ_LEN.get(seq, 4)
            cfg = build(seq, heads, batch)
            if cfg is None or seq % cfg.block_q or seq % cfg.block_kv:
                continue
            q, k, v = generate_qkv(seq, n_heads=heads, batch=batch)
            flops = calc_self_attn_flop(seq, cfg.d_head, heads, batch)
            try:
                secs = chain_runtime(
                    lambda x, k_, v_, cfg=cfg: flash_forward(x, k_, v_, cfg),
                    q, k, v, iters=iters, est_secs=flops / 100e12)
            except Exception as e:
                log(f"  {label} seq {seq}: FAILED {type(e).__name__}")
                continue
            per_seq[seq] = flops / secs / 1e12
            log(f"  {label:<18} seq {seq:>6} {per_seq[seq]:7.2f} TFLOP/s "
                f"({cfg.short_form()})")
        out.append((label, per_seq))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--seq-lens", default="512,1024,2048,4096,8192,16384")
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args(argv)
    seq_lens = [int(s) for s in args.seq_lens.split(",")]

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sol = chip_sol_tflops()
    mm = measured_matmul_tflops()
    print(f"device={device_kind()} commit={_git_commit()} "
          f"nominal SoL={sol} measured matmul ceiling={mm:.1f}")
    results = bench_ladder(seq_lens, heads=args.heads, iters=args.iters)

    header = f"{'rung':<20}" + "".join(f"{s:>9}" for s in seq_lens) + \
             f"{'harm.':>9}{'%mm':>7}"
    print("\n" + header)
    rows = []
    for label, per_seq in results:
        if not per_seq:
            continue
        hm = statistics.harmonic_mean(per_seq.values())
        print(f"{label:<20}" + "".join(
            f"{per_seq[s]:>9.1f}" if s in per_seq else f"{'—':>9}"
            for s in seq_lens) + f"{hm:>9.1f}{100 * hm / mm:>7.1f}")
        rows.append({
            "rung": label,
            **{f"seq{s}": round(per_seq.get(s, 0), 2) for s in seq_lens},
            "harmonic_mean": round(hm, 2),
            "pct_sol": round(100 * hm / sol, 2),
            "pct_matmul": round(100 * hm / mm, 2),
            "n_seqs": len(per_seq), "timing": "chain",
            "commit": _git_commit(),
        })
    if args.csv and rows:
        os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
        with open(args.csv, "w", newline="") as f:
            w = csv_mod.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
