"""Backward-pass rung table: split vs fused, tile sweep, seq sweep.

The forward got a 12-rung ladder; round 3's verdict called out that the
backward got one tile sweep (72.9% of the matmul ceiling — exactly the
5/7 cap the split dQ/dKV layout imposes by recomputing S^T and dP^T
twice). This tool measures the backward's own rungs:

  1. split kernels (round-3 baseline layout, 7 matmuls per tile pair)
  2. fused kernel (round 4: one shared recompute, 5 matmuls per pair)
  x  tile sizes, q_splits sub-tiling, causal and GQA shapes

FLOP accounting is the ideal 3.5x forward model (2 fwd + 5 bwd matmuls)
regardless of what the implementation executes — the same
ideal-work convention the causal benches use for visible pairs, so a
layout that wastes recompute shows up as lost TFLOP/s, not hidden in the
denominator. Timing is the in-jit unrolled chain (pure device seconds).

Usage:
    python -m flash_attention_from_scratch_tpu.tools.bench_backward \
        --seq-lens 2048,4096 --csv profiles/backward_v5e.csv
"""

from __future__ import annotations

import argparse
import csv as csv_mod
import math
import os
import subprocess
import sys

import jax
import jax.numpy as jnp

from ..dispatch import chain_runtime
from ..ops.configs import (
    KernelConfig, calc_causal_attn_flop, calc_self_attn_flop,
)
from ..ops.flash_backward import flash_backward
from ..ops.flash_forward import flash_forward_with_lse
from ..utils.chip import chip_sol_tflops, device_kind, measured_matmul_tflops
from ..utils.testing import BATCH_SIZE_FOR_SEQ_LEN, generate_qkv

__all__ = ["bench_backward", "main"]


def _git_commit():
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(__file__), text=True).strip()
    except Exception:  # pragma: no cover
        return "unknown"


def bench_backward(seq_lens, heads=16, kv_heads=None, causal=False,
                   iters=5, variants=None, log=print):
    """Rows: (variant, tiles, seq) -> fwd+bwd TFLOP/s on the 3.5x model."""
    kv_heads = kv_heads or heads
    mm = measured_matmul_tflops()
    rows = []
    variants = variants or ([
        # (label, fused, block_q, block_kv, splits)
        ("split_2048", False, 2048, 2048, None),   # round-3 baseline
        ("fused_512", True, 512, 512, None),
        ("fused_1024", True, 1024, 1024, None),
        ("fused_2048", True, 2048, 2048, None),
        ("fused_1024_qs2", True, 1024, 1024, 2),
    ] + ([
        # Round-5 banded causal backward; the last column is band_rows
        # (None = the _bwd_band_count default of 1024).
        ("banded", "banded", None, None, None),
        ("banded_2048", "banded", None, None, 2048),
    ] if causal else []))
    for seq in seq_lens:
        batch = BATCH_SIZE_FOR_SEQ_LEN.get(seq, 4)
        q, _, _ = generate_qkv(seq, n_heads=heads, batch=batch,
                               dtype=jnp.bfloat16)
        _, k, v = generate_qkv(seq, n_heads=kv_heads, batch=batch,
                               dtype=jnp.bfloat16, seed=1)
        do = generate_qkv(seq, n_heads=heads, batch=batch,
                          dtype=jnp.bfloat16, seed=2)[0]
        fwd_flops = (calc_causal_attn_flop(seq, 128, heads, batch) if causal
                     else calc_self_attn_flop(seq, 128, heads, batch))
        flops = int(3.5 * fwd_flops)
        cfg = KernelConfig.for_shape(seq, seq, heads=heads, kv_heads=kv_heads,
                                     causal=causal)
        o, lse = flash_forward_with_lse(q, k, v, cfg)

        for label, fused, bq, bkv, splits in variants:
            from ..ops.flash_backward import (
                make_flash_backward, make_flash_backward_fused,
            )

            scale = 1.0 / math.sqrt(128)
            if fused == "banded":
                import dataclasses as _dc

                from ..ops.flash_backward import flash_backward

                band_rows = splits or 1024
                if seq // band_rows < 2:
                    continue
                dcfg = _dc.replace(cfg, causal=True, decompose=True,
                                   window=0, q_offset=0)
                bands = max(2, seq // band_rows)

                def step(do_, q_, k_, v_, o_, lse_, dsum_, dcfg=dcfg,
                         bands=bands):
                    dq, dk, dv = flash_backward(
                        q_, k_, v_, o_, lse_[:, :, 0, :], do_, dcfg,
                        interpret=False, bands=bands)
                    return (do_ + dq * 1e-9
                            + (dk[0, 0, 0, 0] + dv[0, 0, 0, 0]) * 1e-9)

                kw = None
            else:
                kw = dict(block_q=min(bq, seq), block_kv=min(bkv, seq),
                          splits=splits)
            if kw is None:
                pass
            elif fused:
                call = make_flash_backward_fused(
                    cfg, batch, heads, seq, seq, kv_heads, scale, False, **kw)

                def step(do_, q_, k_, v_, o_, lse_, dsum_, call=call):
                    dq, dk, dv = call(q_, k_, v_, do_, lse_, dsum_)
                    # Chain through do so the unrolled steps serialize.
                    # EVERY output must feed the carry: a pallas call none
                    # of whose outputs are used is dead code and XLA
                    # deletes it wholesale (first run of this tool timed
                    # the split dKV kernel at an impossible 328 TFLOP/s —
                    # it was never executing). One scalar element each is
                    # enough to keep a call alive at zero bandwidth cost.
                    return (do_ + dq * 1e-9
                            + (dk[0, 0, 0, 0] + dv[0, 0, 0, 0]) * 1e-9)
            else:
                dq_call, dkv_call = make_flash_backward(
                    cfg, batch, heads, seq, seq, kv_heads, scale, False, **kw)

                def step(do_, q_, k_, v_, o_, lse_, dsum_,
                         dq_call=dq_call, dkv_call=dkv_call):
                    dq = dq_call(q_, k_, v_, do_, lse_, dsum_)
                    dk, dv = dkv_call(q_, k_, v_, do_, lse_, dsum_)
                    # dk/dv must reach the carry or the dkv pallas call is
                    # dead code (see the fused branch's comment).
                    return (do_ + dq * 1e-9
                            + (dk[0, 0, 0, 0] + dv[0, 0, 0, 0]) * 1e-9)

            dsum = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                           axis=-1)
            try:
                secs = chain_runtime(
                    step, do, q, k, v, o, lse[:, :, None, :],
                    dsum[:, :, None, :],
                    iters=iters, est_secs=flops / 100e12)
            except Exception as e:  # OOM / compile failure: record and move on
                log(f"  seq {seq:>6} {label:<16} FAILED: {type(e).__name__}")
                continue
            # secs covers bwd only; add the forward for the fwd+bwd metric.
            # The forward must be the cfg the MODEL dispatches: for causal
            # shapes that is the banded decomposition (158-180 TFLOP/s at
            # Llama shapes), not for_shape's monolithic whole-KV walk
            # (~79) — round 5's first causal rows under-reported fwd+bwd
            # by timing the wrong forward (VERDICT r4 #4 accounting).
            fwd_cfg = cfg
            if causal and seq % 512 == 0 and seq >= 2048:
                import dataclasses as _dc

                group = heads // kv_heads
                hp = next((c for c in (4, 2)
                           if heads % c == 0 and group % c == 0), 1)
                fwd_cfg = KernelConfig(
                    block_q=512, block_kv=2048, causal=True, decompose=True,
                    kv_splits=2, q_splits=2, head_pack=hp)
            fsecs = chain_runtime(
                lambda x, k_, v_: flash_forward_with_lse(x, k_, v_,
                                                         fwd_cfg)[0],
                q, k, v, iters=iters, est_secs=fwd_flops / 150e12)
            tot = secs + fsecs
            tflops = flops / 1e12 / tot
            bwd_tflops = (flops - fwd_flops) / 1e12 / secs
            rows.append({
                "seq": seq, "batch": batch, "heads": heads,
                "kv_heads": kv_heads, "causal": causal, "variant": label,
                "bwd_ms": round(secs * 1e3, 4),
                "fwd_ms": round(fsecs * 1e3, 4),
                "fwdbwd_tflops": round(tflops, 2),
                "bwd_tflops": round(bwd_tflops, 2),
                "pct_matmul_ceiling": round(100 * tflops / mm, 2),
            })
            log(f"  seq {seq:>6} {label:<16} bwd {secs*1e3:9.3f} ms "
                f"fwd+bwd {tflops:7.2f} TFLOP/s "
                f"({rows[-1]['pct_matmul_ceiling']:5.1f}% mm)")
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seq-lens", default="2048,4096")
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=None)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--csv", default=None)
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"device={device_kind()} commit={_git_commit()} "
          f"nominal SoL={chip_sol_tflops()} timing=in-jit chain "
          f"flop_model=3.5x_fwd_ideal")
    rows = bench_backward([int(s) for s in args.seq_lens.split(",")],
                          heads=args.heads, kv_heads=args.kv_heads,
                          causal=args.causal, iters=args.iters)
    if args.csv and rows:
        with open(args.csv, "w", newline="") as f:
            w = csv_mod.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
