"""Xplane evidence for the int8-COMPUTE prefill verdict (round 5).

profiles/quant_prefill_v5e.csv shows int8c topping out at ~137-145 TFLOP/s
(effective-bf16 model) — ABOVE every bf16 multi-step causal walk but BELOW
the ~190 TFLOP/s bf16 whole-KV champion, even though the chip's raw int8
matmul rate is 255 TOP/s vs the 187 TFLOP/s bf16 ceiling (utils/chip.py).
This tool captures the committed explanation: an xplane trace of the int8c
kernel and of the bf16 champion at the same shape, plus a VPU-chain
decomposition — time the int8c kernel with the P-requantization round+cast
replaced by progressively cheaper stand-ins to attribute the gap between
the 1.36x dot speedup and the measured slowdown.

Writes a small committed JSON (``profiles/quant_xplane_r5.json``); raw
traces stay gitignored under profiles/traces/.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.quant_trace \
        --seq 4096 --summary profiles/quant_xplane_r5.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

__all__ = ["main"]

# Subprocess capture (same rationale as profile_trace: a wedged tunneled
# tracer must time out, not hang the harness).
_SNIPPET = """
import sys, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
from flash_attention_from_scratch_tpu.ops.configs import KernelConfig
from flash_attention_from_scratch_tpu.ops.flash_forward import flash_forward
from flash_attention_from_scratch_tpu.ops.flash_quant import flash_forward_quantized
from flash_attention_from_scratch_tpu.ops.quant import quantize_kv
from flash_attention_from_scratch_tpu.utils.testing import (
    BATCH_SIZE_FOR_SEQ_LEN, generate_qkv)
from flash_attention_from_scratch_tpu.dispatch import sync

which, seq, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
batch = BATCH_SIZE_FOR_SEQ_LEN.get(seq, 4)
q, k, v = generate_qkv(seq, n_heads=16, batch=batch)
if which == "int8c":
    qq, kq, vq = (quantize_kv(t, "int8") for t in (q, k, v))
    cfg = KernelConfig(block_q=512, block_kv=min(4096, seq),
                       kv_splits=4 if seq >= 4096 else 2)
    run = lambda: flash_forward_quantized(qq, kq, vq, cfg, int8_compute=True)
else:
    cfg = KernelConfig.for_shape(seq, seq, heads=16, kv_heads=16, batch=batch)
    run = lambda: flash_forward(q, k, v, cfg)
sync(run())  # compile + warm outside the trace
with jax.profiler.trace(out_dir):
    for _ in range(6):
        r = run()
    sync(r)
print("TRACE_OK")
"""


def _capture(which: str, seq: int, out_dir: str, timeout_s: int = 420):
    os.makedirs(out_dir, exist_ok=True)
    try:
        p = subprocess.run(
            [sys.executable, "-c", _SNIPPET, which, str(seq), out_dir],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"profiler hung > {timeout_s}s"
    if "TRACE_OK" not in p.stdout:
        return False, (p.stderr or p.stdout)[-300:]
    return True, "ok"


def _vpu_ablation(seq: int, iters: int = 5):
    """Chain-time the three endpoints that bracket the int8c gap.

      * int8c           — the full quantized-COMPUTE kernel
      * int8u           — identical tensors, bf16 upcast dots on the SAME
                          kernel skeleton (1x MXU, no P-requant chain)
      * bf16 champion   — the dense whole-KV single-shot winner

    int8c vs int8u isolates what the int8 dots buy on this skeleton;
    bf16-champion vs int8c is the committed headline gap (the extra VPU
    chain — P round+cast, int32->fp32 converts, l matvec — minus the dot
    speedup).
    """
    from ..dispatch import chain_runtime
    from ..ops.configs import KernelConfig, calc_self_attn_flop
    from ..ops.flash_forward import flash_forward
    from ..ops.quant import quantize_kv
    from ..tools.bench_quant import _time_variant
    from ..utils.testing import BATCH_SIZE_FOR_SEQ_LEN, generate_qkv

    batch = BATCH_SIZE_FOR_SEQ_LEN.get(seq, 4)
    q, k, v = generate_qkv(seq, n_heads=16, batch=batch)
    qq, kq, vq = (quantize_kv(t, "int8") for t in (q, k, v))
    flops = calc_self_attn_flop(seq, 128, 16, batch)
    qcfg = KernelConfig(block_q=512, block_kv=min(4096, seq),
                        kv_splits=4 if seq >= 4096 else 2)
    rows = {}
    for name in ("int8c", "int8u", "bf16_champion"):
        if name == "bf16_champion":
            cfg = KernelConfig.for_shape(seq, seq, heads=16, kv_heads=16,
                                         batch=batch)
            secs = chain_runtime(
                lambda x, k_, v_: flash_forward(x, k_, v_, cfg), q, k, v,
                iters=iters, est_secs=flops / 150e12)
        else:
            secs = _time_variant(qcfg, qq, kq, vq, name == "int8c", flops,
                                 iters)
        rows[name] = {"secs_per_call": secs,
                      "eff_bf16_tflops": round(flops / secs / 1e12, 2)}
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--out", default="profiles/traces")
    ap.add_argument("--summary", default="profiles/quant_xplane_r5.json")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")

    from ..tools.profile_trace import summarize_xplane
    from ..utils.chip import device_kind, measured_matmul_tflops

    out = {"device": device_kind(),
           "bf16_matmul_ceiling_tflops": measured_matmul_tflops(),
           "seq": args.seq}
    for which in ("int8c", "bf16"):
        tdir = os.path.join(args.out, f"quant_{which}")
        ok, msg = _capture(which, args.seq, tdir)
        out[f"trace_{which}"] = summarize_xplane(tdir) if ok else {
            "xplane": None, "error": msg}
        print(which, "trace:", "ok" if ok else msg)
    out["chain_timing"] = _vpu_ablation(args.seq)
    print(json.dumps(out["chain_timing"], indent=1))

    os.makedirs(os.path.dirname(args.summary) or ".", exist_ok=True)
    with open(args.summary, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.summary}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
