"""Per-seq headline sweep: best-known config vs the production baseline.

Generates the repo's analogue of the reference's README benchmark table
(``README.md:38-62``): one row per sequence length with the framework's
best-known kernel (``KernelConfig.for_shape``), JAX's production TPU flash
kernel at the same shape (the official-FA2 baseline role), percent of the
chip's measured matmul ceiling, and harmonic means over the sweep. Batch
per seq follows the reference's table (``test/utils.py:9-16``).

All timing is the in-jit unrolled chain (``dispatch.chain_runtime``) — pure
device seconds, no host/tunnel costs.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.bench_sweep \
        --csv profiles/bench_sweep_r3.csv
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
from ..ops.configs import KernelConfig, calc_self_attn_flop
from ..ops.flash_forward import flash_forward
from ..tools.bench_attention import _bench_jax_builtin
from ..utils.chip import chip_sol_tflops, device_kind, measured_matmul_tflops
from ..utils.testing import BATCH_SIZE_FOR_SEQ_LEN, generate_qkv

__all__ = ["sweep", "main"]


def sweep(seq_lens, heads: int = 16, d_head: int = 128, iters: int = 7,
          log=print):
    """One row per seq: ours vs baseline vs ceiling. Returns row dicts."""
    rows = []
    for seq in seq_lens:
        batch = BATCH_SIZE_FOR_SEQ_LEN.get(seq, 4)
        q, k, v = generate_qkv(seq, d_head=d_head, n_heads=heads, batch=batch,
                               dtype=jax.numpy.bfloat16)
        cfg = KernelConfig.for_shape(seq, seq, heads=heads, kv_heads=heads,
                                     d_head=d_head, batch=batch)
        flops = calc_self_attn_flop(seq, d_head, heads, batch)
        secs = chain_runtime(
            lambda x, k, v: flash_forward(x, k, v, cfg), q, k, v,
            iters=iters, est_secs=flops / 140e12)
        ours = flops / secs / 1e12
        base_secs = _bench_jax_builtin(q, k, v, flops, causal=False)
        base = flops / base_secs / 1e12 if base_secs else 0.0
        mm = measured_matmul_tflops()
        rows.append({
            "seq": seq, "batch": batch, "heads": heads,
            "config": cfg.short_form(),
            "ms": round(secs * 1e3, 4),
            "tflops": round(ours, 2),
            "baseline_jax_tflops": round(base, 2),
            "vs_baseline": round(ours / base, 4) if base else None,
            "pct_matmul_ceiling": round(100 * ours / mm, 2),
            "pct_sol": round(100 * ours / chip_sol_tflops(), 2),
        })
        log(f"  seq {seq:>6} {cfg.short_form():<54} {secs*1e3:9.3f} ms "
            f"{ours:7.2f} TFLOP/s  ({rows[-1]['pct_matmul_ceiling']:5.1f}% mm, "
            f"{rows[-1]['vs_baseline'] or 0:4.2f}x jax)")
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seq-lens", default="512,1024,2048,4096,8192,16384")
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    seq_lens = [int(s) for s in args.seq_lens.split(",")]
    mm = measured_matmul_tflops()
    print(f"device={device_kind()} measured matmul ceiling={mm:.1f} TFLOP/s "
          f"nominal SoL={chip_sol_tflops()}")
    rows = sweep(seq_lens, heads=args.heads, iters=args.iters)

    ours_hm = statistics.harmonic_mean([r["tflops"] for r in rows])
    base_vals = [r["baseline_jax_tflops"] for r in rows
                 if r["baseline_jax_tflops"]]
    base_hm = statistics.harmonic_mean(base_vals) if base_vals else 0.0
    print(f"\nharmonic mean: ours {ours_hm:.1f} TFLOP/s "
          f"({100 * ours_hm / mm:.1f}% of matmul ceiling)"
          + (f", jax builtin {base_hm:.1f} -> {ours_hm / base_hm:.2f}x"
             if base_hm else ""))

    if args.csv:
        try:
            commit = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
                text=True, cwd=os.path.dirname(__file__)).stdout.strip()
        except Exception:
            commit = "unknown"
        for r in rows:
            r["commit"] = commit
            r["device"] = device_kind()
        os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
        with open(args.csv, "w", newline="") as f:
            w = csv_mod.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
