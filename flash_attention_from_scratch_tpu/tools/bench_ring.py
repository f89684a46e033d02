"""Ring-attention merge-overhead bound, measured on ONE chip.

The ring itself is correctness-tested on the virtual 8-device CPU mesh
(tests/test_ring_attention.py); what a single v5e chip CAN measure honestly
is the ring's *compute-side* overhead: each device of a P-way ring runs P
hop kernels on (L/P x L/P) tiles plus P-1 LSE merges, instead of one
monolithic (L x L) kernel. This tool times exactly that — both shards
resident on one chip, the same per-hop kernels and `_merge` math the
shard_map path runs — so the multi-chip projection rests on a measured
merge cost rather than assumption (VERDICT r3 #10). What it cannot see is
ICI latency; on real multi-chip the ppermute overlaps the previous hop's
kernel (XLA latency-hiding scheduler), so the compute-side overhead is the
floor.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.bench_ring \
        --seq 8192 --shards 2 --csv profiles/ring_overhead_v5e.csv
"""

from __future__ import annotations

import argparse
import csv as csv_mod
import os
import subprocess
import sys

import jax
import jax.numpy as jnp

from ..dispatch import chain_runtime
from ..ops.configs import KernelConfig, calc_self_attn_flop
from ..ops.flash_forward import flash_forward, flash_forward_with_lse
from ..parallel.ring_attention import _merge
from ..utils.chip import device_kind, measured_matmul_tflops
from ..utils.testing import BATCH_SIZE_FOR_SEQ_LEN, generate_qkv

__all__ = ["bench_ring_sim", "main"]


def _git_commit():
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(__file__), text=True).strip()
    except Exception:  # pragma: no cover
        return "unknown"


def _ring_sim_step(cfg: KernelConfig, n_shards: int, shard_len: int):
    """One device's ring work, both/all shards resident: P hop kernels +
    P-1 LSE merges per Q shard, summed over the P Q-shards a P-device ring
    would distribute. Total FLOPs = the monolithic kernel's, so TFLOP/s
    are directly comparable."""

    def step(q, k, v):
        outs = []
        for qi in range(n_shards):
            qs = q[:, :, qi * shard_len:(qi + 1) * shard_len, :]
            o_acc = lse_acc = None
            for hop in range(n_shards):
                ks = k[:, :, hop * shard_len:(hop + 1) * shard_len, :]
                vs = v[:, :, hop * shard_len:(hop + 1) * shard_len, :]
                o, lse = flash_forward_with_lse(qs, ks, vs, cfg)
                of = o.astype(jnp.float32)
                if o_acc is None:
                    o_acc, lse_acc = of, lse
                else:
                    o_acc, lse_acc = _merge(o_acc, lse_acc, of, lse)
            outs.append(o_acc.astype(q.dtype))
        return jnp.concatenate(outs, axis=2)

    return step


def bench_ring_sim(seq: int, shards_list, heads=16, iters=5, log=print):
    batch = BATCH_SIZE_FOR_SEQ_LEN.get(seq, 4)
    q, k, v = generate_qkv(seq, n_heads=heads, batch=batch,
                           dtype=jnp.bfloat16)
    flops = calc_self_attn_flop(seq, 128, heads, batch)
    mm = measured_matmul_tflops()
    rows = []

    mono_cfg = KernelConfig.for_shape(seq, seq, heads=heads, kv_heads=heads,
                                      batch=batch)
    mono_secs = chain_runtime(
        lambda x, k_, v_: flash_forward(x, k_, v_, mono_cfg), q, k, v,
        iters=iters, est_secs=flops / 150e12)
    mono_tf = flops / mono_secs / 1e12
    rows.append({"seq": seq, "batch": batch, "heads": heads, "shards": 1,
                 "config": mono_cfg.short_form(),
                 "ms": round(mono_secs * 1e3, 4),
                 "tflops": round(mono_tf, 2), "overhead_pct": 0.0,
                 "pct_matmul_ceiling": round(100 * mono_tf / mm, 2)})
    log(f"  monolithic          {mono_secs*1e3:9.3f} ms {mono_tf:7.2f} TFLOP/s")

    for n in shards_list:
        shard_len = seq // n
        cfg = KernelConfig.for_shape(shard_len, shard_len, heads=heads,
                                     kv_heads=heads, batch=batch)
        step = _ring_sim_step(cfg, n, shard_len)
        secs = chain_runtime(step, q, k, v, iters=iters,
                             est_secs=flops / 120e12)
        tf = flops / secs / 1e12
        over = 100.0 * (secs - mono_secs) / mono_secs
        rows.append({"seq": seq, "batch": batch, "heads": heads, "shards": n,
                     "config": cfg.short_form(),
                     "ms": round(secs * 1e3, 4), "tflops": round(tf, 2),
                     "overhead_pct": round(over, 2),
                     "pct_matmul_ceiling": round(100 * tf / mm, 2)})
        log(f"  ring-sim {n}-shard   {secs*1e3:9.3f} ms {tf:7.2f} TFLOP/s "
            f"(+{over:.1f}% vs monolithic)")
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--shards", default="2,4")
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device={device_kind()} commit={_git_commit()} timing=in-jit chain")
    rows = bench_ring_sim(args.seq, [int(s) for s in args.shards.split(",")],
                          heads=args.heads, iters=args.iters)
    if args.csv and rows:
        with open(args.csv, "w", newline="") as f:
            w = csv_mod.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
