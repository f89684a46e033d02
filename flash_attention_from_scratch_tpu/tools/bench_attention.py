"""Hermetic attention benchmark: seq sweep, ladder table, harmonic mean.

Port of the capabilities of ``tools/benchmark/pt_bench.py`` and
``ncu_bench.py``: per-(kernel, seq_len) timing under controlled conditions,
TFLOP/s with the reference's FLOP model, percent-of-baseline columns, and the
harmonic-mean summary the reference's README table uses (``README.md:38-62``).
On TPU the baseline is the chip's MXU: both nominal SoL and a measured matmul
ceiling (the role official FA2 played for the reference).

Timing is pure-device by default: N chained kernel calls unrolled inside a
single jit (``dispatch.chain_runtime``), so per-call
host/tunnel dispatch cost — which dwarfs a sub-millisecond seq-512 kernel
through the axon relay — cancels out of the slope. This is the measurement
role NCU kernel Duration played for the reference (``ncu_bench.py:31-56``).
``--host-timing`` falls back to fenced host timing (``median_runtime``).

``--causal`` benches the causal kernels with causal FLOP accounting (only
visible pairs count), optionally with ``--window``/GQA ``--kv-heads`` — the
shapes the model family actually runs. The ``GB/s`` column is model-based
achieved HBM bandwidth (bytes the kernel's DMA pattern moves / time): for
causal FORI only visited KV blocks count, for GRID every block is fetched
(predicated compute) — making the GRID-vs-FORI DMA-waste tradeoff visible.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.bench_attention \
        --kernels prog --seq-lens 512,1024,2048,4096 --csv profiles/bench.csv
"""

from __future__ import annotations

import argparse
import csv as csv_mod
import dataclasses
import json
import os
import statistics
import subprocess
import sys

import jax

from ..dispatch import median_runtime, chain_runtime
from ..ops.configs import (
    DType,
    KernelConfig,
    KVLoop,
    calc_causal_attn_flop,
    calc_self_attn_flop,
    get_kernel_configs,
)
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


def _kv_blocks_visited(cfg: KernelConfig, seq_q: int, seq_kv: int) -> int:
    """KV blocks the kernel actually DMAs, mirroring the kernel's own logic.

    GRID fetches every block (above-diagonal blocks are predicated but still
    pipelined in); FORI's causal walk visits only [first_block, last_excl)
    per Q block (``flash_forward._fori_kernel``).
    """
    num_q = seq_q // cfg.block_q
    num_kv = seq_kv // cfg.block_kv
    if cfg.causal and cfg.decompose:
        # Row-band decomposition: band i's programs each stream its
        # visible KV slice once — the prefix [0, (i+1)*rows), clipped from
        # below by a sliding window (ops/causal_decomp.py geometry).
        from ..ops.causal_decomp import band_count

        n = band_count(seq_q)
        rows = seq_q // n
        total = 0.0
        for i in range(n):
            width_end = (i + 1) * rows + cfg.q_offset
            if cfg.window:
                lo = max(0, i * rows + cfg.q_offset - cfg.window + 1)
                width = min(width_end, -(-(width_end - lo) // 128) * 128)
            else:
                width = width_end
            total += (rows / cfg.block_q) * (width / cfg.block_kv)
        return int(total)
    if not (cfg.causal and cfg.kv_loop == KVLoop.FORI):
        return num_q * num_kv
    total = 0
    for qi in range(num_q):
        span = qi * cfg.block_q + cfg.q_offset
        last_excl = min(
            (span + cfg.block_q + cfg.block_kv - 1) // cfg.block_kv, num_kv)
        first = (max(span - cfg.window + 1, 0) // cfg.block_kv
                 if cfg.window else 0)
        total += max(last_excl - first, 0)
    return total


def _hbm_bytes(cfg: KernelConfig, batch: int, heads: int, kv_heads: int,
               seq_q: int, seq_kv: int) -> int:
    """Model of HBM bytes one call moves: Q+O once, K/V per visited block."""
    b = cfg.dtype.bytes
    qo = batch * heads * seq_q * cfg.d_head * (b + cfg.resolved_out_dtype.bytes)
    visited = _kv_blocks_visited(cfg, seq_q, seq_kv)
    kv = batch * kv_heads * 2 * visited * cfg.block_kv * cfg.d_head * b
    return qo + kv


def _flops(cfg: KernelConfig, seq: int, heads: int, batch: int) -> int:
    if cfg.causal:
        return calc_causal_attn_flop(seq, cfg.d_head, heads, batch,
                                     window=cfg.window)
    return calc_self_attn_flop(seq, cfg.d_head, heads, batch)


def _bench_jax_builtin(q, k, v, flops: float, causal: bool) -> float | None:
    """JAX's production TPU flash kernel — the official-FA2 baseline role."""
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention,
        )
    except Exception:
        return None
    import math

    seq = q.shape[2]
    sm = 1.0 / math.sqrt(q.shape[-1])
    bs = BlockSizes(block_q=min(512, seq), block_k_major=min(1024, seq),
                    block_k=min(1024, seq), block_b=1)
    fn = jax.jit(lambda x, k, v: flash_attention(
        x, k, v, causal=causal, sm_scale=sm, block_sizes=bs))
    try:
        return chain_runtime(fn, q, k, v, iters=5, est_secs=flops / 120e12)
    except Exception:
        return None


def bench(configs, seq_lens, heads: int = 16, kv_heads: int | None = None,
          iters: int = 5, in_jit: bool = True, baseline: bool = False,
          causal: bool = False, grad: bool = False, log=print):
    """Returns {config_short_form: {seq_len: row_dict}}.

    With ``grad=True`` the timed step is the full fwd+bwd (``jax.grad`` of
    the differentiable entry wrt q/k/v): 7 MXU matmuls of 2*s^2*d each
    (QK, PV forward; S-recompute, dV, dP, dQ, dK backward) vs the
    forward's 2 — the FLOP model scales by 3.5. The chain feeds dQ back in
    as the next Q (same shape/dtype).
    """
    results: dict[str, dict[int, dict]] = {}
    for seq in seq_lens:
        batch = BATCH_SIZE_FOR_SEQ_LEN.get(seq, 4)
        by_key = {}
        for cfg in configs:
            if seq % cfg.block_q or seq % cfg.block_kv:
                continue
            if cfg.window and cfg.window >= seq:
                continue  # window >= seq degenerates to plain causal
            kvh = kv_heads or heads
            key = (cfg.dtype, cfg.d_head, kvh)
            if key not in by_key:
                q, _, _ = generate_qkv(seq, d_head=cfg.d_head, n_heads=heads,
                                       batch=batch, dtype=cfg.dtype.jnp_dtype)
                _, k, v = generate_qkv(seq, d_head=cfg.d_head, n_heads=kvh,
                                       batch=batch, dtype=cfg.dtype.jnp_dtype)
                by_key[key] = (q, k, v)
            q, k, v = by_key[key]
            flops = _flops(cfg, seq, heads, batch)
            if grad:
                flops = int(flops * 3.5)
            est = flops / 120e12  # sizing guess only: ~120 TFLOP/s
            if grad:
                from ..ops.autodiff import flash_attention as _fa_diff

                def _grad_step(x, k, v, cfg=cfg):
                    jnp = jax.numpy
                    dq, dk, dv = jax.grad(
                        lambda q, k, v: _fa_diff(q, k, v, cfg).astype(
                            jnp.float32).sum(), argnums=(0, 1, 2))(x, k, v)
                    # Fold dK/dV in through a scalar so the dKV kernel
                    # cannot be dead-code-eliminated; cost is one reduce.
                    s = (dk.astype(jnp.float32).sum()
                         + dv.astype(jnp.float32).sum()) * 0.0
                    return (dq.astype(jnp.float32) + s).astype(x.dtype)

                secs = chain_runtime(_grad_step, q, k, v, iters=iters,
                                     est_secs=est)
            elif in_jit:
                secs = chain_runtime(
                    lambda x, k, v, cfg=cfg: flash_forward(x, k, v, cfg),
                    q, k, v, iters=iters, est_secs=est,
                )
            else:
                secs = median_runtime(
                    lambda cfg=cfg: flash_forward(q, k, v, cfg),
                    warmup=2, iters=iters,
                    chain_fn=lambda prev, cfg=cfg: flash_forward(prev, k, v, cfg),
                )
            tflops = flops / secs / 1e12
            gbps = _hbm_bytes(cfg, batch, heads, kvh, seq, seq) / secs / 1e9
            results.setdefault(cfg.short_form(), {})[seq] = {
                "tflops": tflops, "ms": secs * 1e3, "gbps": gbps,
            }
            log(f"  seq {seq:>6} {cfg.short_form():<48} {secs*1e3:9.3f} ms "
                f"{tflops:7.2f} TFLOP/s {gbps:7.1f} GB/s")
        if baseline and by_key:
            # One baseline row per seq at the first (dtype, d_head) group's
            # operands — the reference benches official FA2 alongside every
            # sweep (run_kernels.py:114-136).
            q, k, v = next(iter(by_key.values()))
            d = q.shape[-1]
            flops = (calc_causal_attn_flop(seq, d, heads, batch) if causal
                     else calc_self_attn_flop(seq, d, heads, batch))
            secs = _bench_jax_builtin(q, k, v, flops, causal)
            if secs is not None:
                tflops = flops / secs / 1e12
                results.setdefault("jax_builtin_flash", {})[seq] = {
                    "tflops": tflops, "ms": secs * 1e3, "gbps": 0.0,
                }
                log(f"  seq {seq:>6} {'jax_builtin_flash':<48} "
                    f"{secs*1e3:9.3f} ms {tflops:7.2f} TFLOP/s")
    return results


def harmonic_mean(vals):
    vals = [v for v in vals if v > 0]
    return statistics.harmonic_mean(vals) if vals else 0.0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kernels", default="prog",
                    help="prog | all | tune | '<bq>,<bkv>' | 'fa_...;fa_...'")
    ap.add_argument("--seq-lens", default="512,1024,2048,4096")
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=None,
                    help="GQA KV heads (default = --heads)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--causal", action="store_true",
                    help="bench causal kernels with causal FLOP accounting")
    ap.add_argument("--window", type=int, default=0,
                    help="sliding window (implies --causal)")
    ap.add_argument("--fori", action="store_true",
                    help="force the FORI kv loop on every config")
    ap.add_argument("--host-timing", action="store_true",
                    help="fenced host timing instead of the in-jit chain")
    ap.add_argument("--baseline", action="store_true",
                    help="also bench JAX's production TPU flash kernel per "
                         "seq (the official-FA2 baseline role)")
    ap.add_argument("--grad", action="store_true",
                    help="time the full fwd+bwd step (jax.grad wrt q/k/v; "
                         "FLOP model x3.5 for the 7 matmuls)")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--json", action="store_true", help="emit one JSON line per kernel")
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dtype = DType.from_short(args.dtype)
    seq_lens = [int(s) for s in args.seq_lens.split(",")]
    configs = [c for c in get_kernel_configs(args.kernels) if c.dtype == dtype]
    if args.causal or args.window:
        patched = []
        for c in configs:
            kw = dict(causal=True, window=args.window, reverse_kv=False)
            if args.window:
                kw["optimized_softmax"] = False
            patched.append(dataclasses.replace(c, **kw))
        configs = patched
    if args.fori:
        configs = [dataclasses.replace(c, kv_loop=KVLoop.FORI, q_splits=1)
                   for c in configs]
    # dataclasses.replace can produce duplicates; keep first occurrence.
    configs = list(dict.fromkeys(configs))

    sol = chip_sol_tflops()
    print(f"device={device_kind()} commit={_git_commit()} nominal SoL={sol} "
          f"timing={'host' if args.host_timing else 'in-jit chain'}")
    results = bench(configs, seq_lens, heads=args.heads, kv_heads=args.kv_heads,
                    iters=args.iters, in_jit=not args.host_timing,
                    baseline=args.baseline, grad=args.grad,
                    causal=bool(args.causal or args.window))
    mm = measured_matmul_tflops()

    header = f"{'config':<48}" + "".join(f"{s:>9}" for s in seq_lens) + \
             f"{'harm.':>9}{'%SoL':>7}{'%mm':>7}"
    print(f"\nmeasured matmul ceiling: {mm:.1f} TFLOP/s\n{header}")
    rows = []
    for name, per_seq in results.items():
        hm = harmonic_mean([r["tflops"] for r in per_seq.values()])
        partial = len(per_seq) < len(seq_lens)
        line = f"{name:<48}" + "".join(
            f"{per_seq[s]['tflops']:>9.1f}" if s in per_seq else f"{'—':>9}"
            for s in seq_lens
        ) + f"{hm:>9.1f}{100*hm/sol:>7.1f}{100*hm/mm:>7.1f}" + \
            ("  (partial: skipped non-tileable seqs)" if partial else "")
        print(line)
        row = {"config": name,
               **{f"seq{s}": round(per_seq[s]["tflops"], 2) if s in per_seq else 0
                  for s in seq_lens},
               **{f"gbps{s}": round(per_seq[s]["gbps"], 1) if s in per_seq else 0
                  for s in seq_lens},
               "harmonic_mean": round(hm, 2), "pct_sol": round(100 * hm / sol, 2),
               "pct_matmul": round(100 * hm / mm, 2),
               "n_seqs": len(per_seq),
               "timing": "host" if args.host_timing else "chain",
               "commit": _git_commit()}
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
