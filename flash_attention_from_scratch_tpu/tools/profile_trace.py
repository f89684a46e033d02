"""Per-kernel profiler traces + device-duration summary (NCU's trace role).

The reference's NCU harness captures per-kernel Duration and memory-workload
metrics (``tools/benchmark/ncu_bench.py:31-56,311-330``). The TPU analogue is
an Xprof trace: this tool runs each selected kernel under
``jax.profiler.trace`` writing TensorBoard xplane files under
``profiles/traces/<config>/`` (gitignored — traces are tens of MB), parses
the xplane with ``jax.profiler.ProfileData`` when possible, and writes a
small committed JSON summary per kernel: device duration per call (from the
trace when parseable, otherwise from the in-jit ``chain_runtime`` chain),
TFLOP/s, and model-based HBM GB/s.

Capture runs in a SUBPROCESS with a hard timeout: on some tunneled device
platforms (axon) the device tracer blocks forever on start; a wedged
profiler must degrade to the timing-only summary, not hang the harness.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.profile_trace \
        --kernels prog --seq 4096 --out profiles/traces \
        --summary profiles/trace_summary.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

__all__ = ["capture_trace", "summarize_xplane", "main"]

_CAPTURE_SNIPPET = """
import sys, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
from flash_attention_from_scratch_tpu.ops.configs import parse_short_form
from flash_attention_from_scratch_tpu.ops.flash_forward import flash_forward
from flash_attention_from_scratch_tpu.utils.testing import generate_qkv
from flash_attention_from_scratch_tpu.dispatch import sync

cfg = parse_short_form(sys.argv[1])
seq, heads, batch, out_dir = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5]
q, k, v = generate_qkv(seq, d_head=cfg.d_head, n_heads=heads, batch=batch,
                       dtype=cfg.dtype.jnp_dtype)
sync(flash_forward(q, k, v, cfg))  # compile + warm outside the trace
with jax.profiler.trace(out_dir):
    r = flash_forward(q, k, v, cfg)
    for _ in range(4):
        r = flash_forward(r, k, v, cfg)
    sync(r)
print("TRACE_OK")
"""


def capture_trace(cfg_short: str, seq: int, heads: int, batch: int,
                  out_dir: str, timeout_s: int = 300) -> tuple[bool, str]:
    """Capture one kernel's trace in a killable subprocess.

    Returns (ok, message). A hang (tracer never starts on this platform) is
    reported as failure after ``timeout_s``, never propagated.
    """
    os.makedirs(out_dir, exist_ok=True)
    try:
        p = subprocess.run(
            [sys.executable, "-c", _CAPTURE_SNIPPET,
             cfg_short, str(seq), str(heads), str(batch), out_dir],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"profiler hung > {timeout_s}s (tunneled device tracer)"
    if "TRACE_OK" not in p.stdout:
        return False, (p.stderr or p.stdout)[-300:]
    return True, "ok"


def summarize_xplane(trace_dir: str) -> dict:
    """Pull per-event device durations out of the newest xplane file."""
    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        return {"xplane": None}
    import jax

    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[-1], "rb").read())
    device_events: dict[str, list[int]] = {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                device_events.setdefault(ev.name, []).append(ev.duration_ns)
    top = sorted(((sum(v), n, len(v)) for n, v in device_events.items()),
                 reverse=True)[:10]
    return {
        "xplane": os.path.relpath(files[-1]),
        "device_event_totals_ns": [
            {"name": n, "total_ns": t, "count": c} for t, n, c in top],
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kernels", default="prog")
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--out", default="profiles/traces")
    ap.add_argument("--summary", default="profiles/trace_summary.json")
    ap.add_argument("--timeout", type=int, default=300)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")

    from ..dispatch import chain_runtime
    from ..ops.configs import DType, calc_self_attn_flop, get_kernel_configs
    from ..ops.flash_forward import flash_forward
    from ..tools.bench_attention import _hbm_bytes
    from ..utils.chip import device_kind
    from ..utils.testing import BATCH_SIZE_FOR_SEQ_LEN, generate_qkv

    dtype = DType.from_short(args.dtype)
    batch = args.batch or BATCH_SIZE_FOR_SEQ_LEN.get(args.seq, 4)
    rows = []
    for cfg in get_kernel_configs(args.kernels):
        if cfg.dtype != dtype or args.seq % cfg.block_q or args.seq % cfg.block_kv:
            continue
        name = cfg.short_form()
        tdir = os.path.join(args.out, name)
        ok, msg = capture_trace(name, args.seq, args.heads, batch, tdir,
                                args.timeout)
        summary = summarize_xplane(tdir) if ok else {"xplane": None,
                                                     "error": msg}
        # Device timing from the in-jit chain regardless — the Duration
        # column must exist even where the tracer cannot run.
        q, k, v = generate_qkv(args.seq, d_head=cfg.d_head, n_heads=args.heads,
                               batch=batch, dtype=cfg.dtype.jnp_dtype)
        flops = calc_self_attn_flop(args.seq, cfg.d_head, args.heads, batch)
        secs = chain_runtime(
            lambda x, k, v, cfg=cfg: flash_forward(x, k, v, cfg),
            q, k, v, iters=3, est_secs=flops / 120e12)
        rows.append({
            "config": name, "seq": args.seq, "heads": args.heads,
            "batch": batch, "trace_captured": ok,
            "device_ms_per_call": round(secs * 1e3, 4),
            "tflops": round(flops / secs / 1e12, 2),
            "hbm_gbps_model": round(
                _hbm_bytes(cfg, batch, args.heads, args.heads, args.seq,
                           args.seq) / secs / 1e9, 1),
            **summary,
        })
        print(json.dumps(rows[-1]))

    os.makedirs(os.path.dirname(args.summary) or ".", exist_ok=True)
    with open(args.summary, "w") as f:
        json.dump({"device": device_kind(), "rows": rows}, f, indent=1)
    print(f"wrote {args.summary}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
