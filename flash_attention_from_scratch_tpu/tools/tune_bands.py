"""Band-schedule retune for the causal row-band decomposition at 12K+.

The round-4 decompose rung dips at seq 16384: 153.0 TFLOP/s vs 173.9 at
8192 (profiles/causal_llama_r4.csv) — the widest bands fall back to the
sp8+hp1 non-causal sweep winner, untested at band granularity (VERDICT r4
weakness #4 / task #9). This sweeps, at Llama-GQA shapes:

  * band count (band rows 512 / 1024 / 2048),
  * per-band block_q (256 shrinks the S tile so wide bands keep kv_splits
    headroom),
  * the wide-band (kv_splits, head_pack) rule via the ``band_rules`` hook,

and prints/commits the winners. A control column at seq 8192 guards
against regressing the band schedule where it already wins.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.tune_bands \
        --csv profiles/causal_llama_r5.csv
"""

from __future__ import annotations

import argparse
import csv as csv_mod
import functools
import os
import subprocess
import sys

import jax

from ..dispatch import chain_runtime
from ..ops.causal_decomp import causal_forward_banded
from ..ops.configs import KernelConfig, calc_causal_attn_flop
from ..utils.chip import measured_matmul_tflops, device_kind
from ..utils.testing import BATCH_SIZE_FOR_SEQ_LEN, generate_qkv

__all__ = ["main"]


def _git_commit():
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(__file__), text=True).strip()
    except Exception:  # pragma: no cover
        return "unknown"


# Named wide-band rules: width -> (kv_splits target, head_pack target).
# "default" mirrors the in-tree thresholds (ops/causal_decomp.py).
RULES = {
    "default": None,
    "sp16w": lambda w: (16, 1) if w >= 12288 else (
        (4, 2) if w > 8192 else ((2, 4) if w >= 4096 else (2, 4))),
    "sp8hp2": lambda w: (8, 2) if w >= 12288 else (
        (4, 2) if w > 8192 else ((2, 4) if w >= 4096 else (2, 4))),
    "sp4w": lambda w: (4, 1) if w >= 12288 else (
        (4, 2) if w > 8192 else ((2, 4) if w >= 4096 else (2, 4))),
    "sp4hp2w": lambda w: (4, 2) if w > 8192 else (
        (2, 4) if w >= 4096 else (2, 4)),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--seq-lens", default="8192,16384")
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rules", default=None,
                    help="comma list from: " + ",".join(RULES))
    ap.add_argument("--window", type=int, default=0,
                    help="sliding window (bands clip their KV slice; the "
                         "16K windowed dip is band-count-sensitive)")
    ap.add_argument("--band-rows", default="512,1024,2048")
    ap.add_argument("--block-q", default="256,512")
    ap.add_argument("--csv", default=None)
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    mm = measured_matmul_tflops()
    rules = (args.rules.split(",") if args.rules else list(RULES))
    rows = []
    print(f"device={device_kind()} commit={_git_commit()} ceiling={mm:.1f}")
    for seq in [int(s) for s in args.seq_lens.split(",")]:
        batch = BATCH_SIZE_FOR_SEQ_LEN.get(seq, 4)
        q, _, _ = generate_qkv(seq, n_heads=args.heads, batch=batch)
        _, k, v = generate_qkv(seq, n_heads=args.kv_heads, batch=batch,
                               seed=1)
        flops = calc_causal_attn_flop(seq, 128, args.heads, batch,
                                      window=args.window)
        for br in [int(b) for b in args.band_rows.split(",")]:
            bands = max(1, seq // br)
            for bq in [int(b) for b in args.block_q.split(",")]:
                group = args.heads // args.kv_heads
                hp = next((c for c in (4, 2)
                           if args.heads % c == 0 and group % c == 0), 1)
                cfg = KernelConfig(block_q=bq, block_kv=2048, causal=True,
                                   kv_splits=2, q_splits=2, head_pack=hp,
                                   window=args.window,
                                   optimized_softmax=not args.window)
                for rname in rules:
                    rule = RULES[rname]
                    fn = jax.jit(functools.partial(
                        causal_forward_banded, cfg=cfg, bands=bands,
                        band_rules=rule, interpret=False))
                    try:
                        secs = chain_runtime(
                            lambda x, k_, v_, fn=fn: fn(x, k_, v_)[0],
                            q, k, v, iters=args.iters,
                            est_secs=flops / 120e12)
                    except Exception as e:
                        print(f"  seq {seq} rows{br} bq{bq} {rname}: "
                              f"FAILED {type(e).__name__}: {str(e)[:60]}")
                        continue
                    tf = flops / secs / 1e12
                    rows.append(dict(seq=seq, batch=batch, heads=args.heads,
                                     kv_heads=args.kv_heads, band_rows=br,
                                     bands=bands, block_q=bq, rule=rname,
                                     tflops=round(tf, 2),
                                     pct_matmul=round(100 * tf / mm, 2),
                                     timing="chain", commit=_git_commit()))
                    print(f"  seq {seq} rows{br} bq{bq} {rname:>8}: "
                          f"{tf:7.2f} TFLOP/s ({100 * tf / mm:5.1f}% mm)")
    rows.sort(key=lambda r: (r["seq"], -r["tflops"]))
    if args.csv and rows:
        with open(args.csv, "w", newline="") as f:
            w = csv_mod.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
