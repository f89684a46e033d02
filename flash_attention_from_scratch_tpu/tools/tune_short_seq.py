"""Short-sequence retune: fold_batch / head_pack sweep at seq 512-1024.

Round 4 built ``fold_batch`` (relabel (b, h) -> (1, b*h) so head packing
amortizes across batch elements — the lever for the short-seq end of the
harmonic mean) and never timed it (VERDICT r4 weakness #2: seq 512 sits at
131.9 = 67.8% of the shape ceiling and is the whole gap to the >= 95% hm
target). This driver sweeps the fb x hp x qs x block space at seq 512/1024
through :func:`tools.autotune.tune` and prints the `_SWEEP_TABLE` rows the
winners imply.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.tune_short_seq \
        --csv profiles/autotune_r5_shortseq.csv
"""

from __future__ import annotations

import argparse
import csv as csv_mod
import sys

import jax

from ..ops.configs import KernelConfig
from ..tools.autotune import tune
from ..utils.chip import measured_matmul_tflops
from ..utils.testing import BATCH_SIZE_FOR_SEQ_LEN

__all__ = ["candidates", "main"]


def candidates(seq: int):
    """fb/hp/qs/block candidates for one short seq (heads=16 assumed).

    VMEM model: a packed program holds hp x (Q + S + acc + its own KV
    stream — no GQA sharing at 16/16 heads), ~1.5 MB per head at kv 512;
    hp32 fits the 64 MB limit, hp64 does not (pruned by fits_vmem).
    """
    out = []
    for bq in (256, 512):
        for bkv in (512, 1024):
            if bkv > seq or bq > seq:
                continue
            # kv_splits measured a loss below seq 2048 (sub-tiles fall
            # under a useful MXU shot, _SWEEP_TABLE comment) — sweep only
            # the pack/fold/qsplit axes that short shapes respond to.
            for hp, fb in ((8, False), (16, False), (16, True), (32, True),
                           (64, True)):
                for qs in (1, 2):
                    try:
                        cfg = KernelConfig(
                            block_q=bq, block_kv=bkv, head_pack=hp,
                            fold_batch=fb, q_splits=qs)
                    except ValueError:
                        continue
                    if not cfg.fits_vmem():
                        continue
                    out.append(cfg)
    return list(dict.fromkeys(out))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--seq-lens", default="512,1024")
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    mm = measured_matmul_tflops()
    all_rows = []
    for seq in [int(s) for s in args.seq_lens.split(",")]:
        batch = BATCH_SIZE_FOR_SEQ_LEN.get(seq, 16)
        cfgs = candidates(seq)
        print(f"seq {seq}: {len(cfgs)} candidates (batch {batch}, "
              f"heads {args.heads}, ceiling {mm:.1f})")
        rows = tune(cfgs, seq, args.heads, batch, iters=args.iters)
        for r in rows:
            r["seq"] = seq
        all_rows.extend(rows[:args.top])
        for r in rows[:args.top]:
            print(f"  {r['config']:<52} {r['tflops']:>7.2f} TFLOP/s "
                  f"({100 * r['tflops'] / mm:5.1f}% mm)")
    if args.csv and all_rows:
        with open(args.csv, "w", newline="") as f:
            w = csv_mod.DictWriter(f, fieldnames=list(all_rows[0].keys()))
            w.writeheader()
            w.writerows(all_rows)
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
