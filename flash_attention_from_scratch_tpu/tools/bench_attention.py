"""Hermetic attention benchmark: seq sweep, ladder table, harmonic mean.

Port of the capabilities of ``tools/benchmark/pt_bench.py`` and
``ncu_bench.py``: per-(kernel, seq_len) timing under controlled conditions,
TFLOP/s with the reference's FLOP model, percent-of-baseline columns, and the
harmonic-mean summary the reference's README table uses (``README.md:38-62``).
On TPU the baseline is the chip's MXU: both nominal SoL and a measured matmul
ceiling (the role official FA2 played for the reference). Hermetic-timing
notes: no clock locking exists on TPU; fencing is by host readback
(see ``dispatch.median_runtime``), and each sample amortizes several
dispatches to undo tunnel latency.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.bench_attention \
        --kernels prog --seq-lens 512,1024,2048,4096 --csv profiles/bench.csv
"""

from __future__ import annotations

import argparse
import csv as csv_mod
import json
import os
import statistics
import subprocess
import sys

import jax

from ..dispatch import median_runtime
from ..ops.configs import DType, calc_self_attn_flop, get_kernel_configs
from ..ops.flash_forward import flash_forward
from ..utils.chip import chip_sol_tflops, device_kind, measured_matmul_tflops
from ..utils.testing import BATCH_SIZE_FOR_SEQ_LEN, generate_qkv

__all__ = ["bench", "main"]


def _git_commit() -> str:
    """Stamp results with the current commit (ref ncu_bench.py:59-68)."""
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(__file__),
        ).stdout.strip()
    except Exception:
        return "unknown"


def bench(configs, seq_lens, heads: int = 16, iters: int = 7, log=print):
    """Returns {config_short_form: {seq_len: tflops}} plus harmonic means."""
    results: dict[str, dict[int, float]] = {}
    for seq in seq_lens:
        batch = BATCH_SIZE_FOR_SEQ_LEN.get(seq, 4)
        by_key = {}
        for cfg in configs:
            if seq % cfg.block_q or seq % cfg.block_kv:
                continue
            key = (cfg.dtype, cfg.d_head)
            if key not in by_key:
                by_key[key] = generate_qkv(
                    seq, d_head=cfg.d_head, n_heads=heads, batch=batch,
                    dtype=cfg.dtype.jnp_dtype,
                )
            q, k, v = by_key[key]
            secs = median_runtime(
                lambda: flash_forward(q, k, v, cfg), warmup=2, iters=iters,
                chain_fn=lambda prev, cfg=cfg: flash_forward(prev, k, v, cfg),
            )
            tflops = calc_self_attn_flop(seq, cfg.d_head, heads, batch) / secs / 1e12
            results.setdefault(cfg.short_form(), {})[seq] = tflops
            log(f"  seq {seq:>6} {cfg.short_form():<44} {secs*1e3:9.3f} ms "
                f"{tflops:7.2f} TFLOP/s")
    return results


def harmonic_mean(vals):
    vals = [v for v in vals if v > 0]
    return statistics.harmonic_mean(vals) if vals else 0.0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kernels", default="prog")
    ap.add_argument("--seq-lens", default="512,1024,2048,4096")
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--json", action="store_true", help="emit one JSON line per kernel")
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dtype = DType.from_short(args.dtype)
    seq_lens = [int(s) for s in args.seq_lens.split(",")]
    configs = [c for c in get_kernel_configs(args.kernels) if c.dtype == dtype]

    sol = chip_sol_tflops()
    print(f"device={device_kind()} commit={_git_commit()} nominal SoL={sol}")
    results = bench(configs, seq_lens, heads=args.heads, iters=args.iters)
    mm = measured_matmul_tflops()

    header = f"{'config':<44}" + "".join(f"{s:>9}" for s in seq_lens) + \
             f"{'harm.':>9}{'%SoL':>7}{'%mm':>7}"
    print(f"\nmeasured matmul ceiling: {mm:.1f} TFLOP/s\n{header}")
    rows = []
    for name, per_seq in results.items():
        hm = harmonic_mean(list(per_seq.values()))
        partial = len(per_seq) < len(seq_lens)
        line = f"{name:<44}" + "".join(
            f"{per_seq.get(s, float('nan')):>9.1f}" for s in seq_lens
        ) + f"{hm:>9.1f}{100*hm/sol:>7.1f}{100*hm/mm:>7.1f}" +             ("  (partial: skipped non-tileable seqs)" if partial else "")
        print(line)
        row = {"config": name, **{f"seq{s}": round(per_seq.get(s, 0), 2) for s in seq_lens},
               "harmonic_mean": round(hm, 2), "pct_sol": round(100 * hm / sol, 2),
               "pct_matmul": round(100 * hm / mm, 2),
               "n_seqs": len(per_seq), "commit": _git_commit()}
        rows.append(row)
        if args.json:
            print(json.dumps(row))

    if args.csv and not rows:
        print("no configs ran; CSV not written")
    elif args.csv:
        os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
        with open(args.csv, "w", newline="") as f:
            w = csv_mod.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
