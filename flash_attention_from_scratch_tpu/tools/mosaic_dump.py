"""Kernel IR introspection: dump, histogram, and diff lowered kernels.

TPU-native replacement for the reference's SASS toolchain
(``tools/build/extract_sass.py``, ``tools/analysis/count_sass_instructions.sh``,
``tools/analysis/compare_sass_instruction_counts.py``, ``kernel_sass/``):
instead of cuobjdump/nvdisasm on cubins, we capture what the TPU stack gives
us —

- the Mosaic MLIR module embedded in the ``tpu_custom_call`` (the kernel
  "assembly" the Mosaic compiler consumes),
- the optimized HLO around it,
- XLA's cost/memory analysis,

then build per-op histograms and before/after delta tables, which is exactly
how the reference measured ladder steps 8-12 (instruction dieting). Dumps are
filed under ``kernel_ir/<short_form>.*`` like the reference's
``kernel_sass/{step}_{GPU}.asm``.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.mosaic_dump \
        --kernels prog --out kernel_ir           # dump every ladder rung
    python -m flash_attention_from_scratch_tpu.tools.mosaic_dump \
        --diff kernel_ir/a.mosaic.mlir kernel_ir/b.mosaic.mlir
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

import jax
import jax.numpy as jnp

from ..ops.configs import DType, get_kernel_configs
from ..ops.flash_forward import make_flash_forward
from ..utils.testing import generate_qkv

__all__ = ["lower_kernel", "op_histogram", "diff_histograms", "main"]

_MOSAIC_RE = re.compile(r'custom_call_config\s*=?\s*.*?"', re.S)


def lower_kernel(cfg, seq: int = 2048, heads: int = 4, batch: int = 1):
    """Lower one config; returns dict of IR texts and analyses."""
    q, k, v = generate_qkv(seq, d_head=cfg.d_head, n_heads=heads, batch=batch,
                           dtype=cfg.dtype.jnp_dtype)
    call = make_flash_forward(cfg, batch, heads, seq, seq, interpret=False)
    lowered = jax.jit(lambda q, k, v: call(q, k, v)).lower(q, k, v)
    out = {"stablehlo": lowered.as_text()}
    try:
        compiled = lowered.compile()
        out["optimized_hlo"] = compiled.as_text()
        try:
            out["cost_analysis"] = dict(compiled.cost_analysis() or {})
        except Exception:
            out["cost_analysis"] = {}
        try:
            mem = compiled.memory_analysis()
            out["memory_analysis"] = str(mem)
        except Exception:
            out["memory_analysis"] = ""
    except Exception as e:
        out["optimized_hlo"] = f"// compile failed: {e}"
    out["mosaic"] = extract_mosaic_module(cfg, q, k, v)
    return out


def extract_mosaic_module(cfg, q, k, v) -> str:
    """Capture the Mosaic MLIR module via ``pallas_call(debug=True)``.

    Pallas prints the kernel jaxpr and the Mosaic module to stdout at trace
    time; we rebuild the call with debug enabled and capture it — the TPU
    analogue of extracting embedded PTX from a cubin
    (``tools/build/get_embedded_ptx_from_cubin.py``). The backend_config
    payload in the stablehlo is MLIR *bytecode* (base64), so this is the
    readable path.
    """
    import contextlib
    import io

    call = make_flash_forward(cfg, q.shape[0], q.shape[1], q.shape[2], k.shape[2],
                              interpret=False, debug=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        jax.jit(lambda q, k, v: call(q, k, v)).lower(q, k, v)
    text = buf.getvalue()
    m = re.search(r"The Mosaic module for [^\n]*\n(module @.*)", text, re.S)
    return m.group(1) if m else "// mosaic module not captured:\n" + text


def op_histogram(ir_text: str) -> collections.Counter:
    """Histogram of MLIR/HLO op mnemonics — the opcode-count analogue."""
    counts: collections.Counter = collections.Counter()
    # MLIR ops: `%x = dialect.op ...` or bare `dialect.op`.
    for m in re.finditer(r"(?:^|\s|=\s*)\"?([a-z_]+\.[a-z_0-9]+)\"?\s*[(\s]", ir_text):
        op = m.group(1)
        if op.split(".")[0] in {"vector", "arith", "tpu", "memref", "scf", "math",
                                "func", "llo", "stablehlo", "mhlo"}:
            counts[op] += 1
    return counts


def diff_histograms(before: collections.Counter, after: collections.Counter) -> str:
    """Markdown delta table (analogue of compare_sass_instruction_counts.py)."""
    ops = sorted(set(before) | set(after),
                 key=lambda o: -(abs(after.get(o, 0) - before.get(o, 0))))
    lines = ["| op | before | after | delta |", "|---|---|---|---|"]
    for op in ops:
        b, a = before.get(op, 0), after.get(op, 0)
        if b == a == 0:
            continue
        lines.append(f"| {op} | {b} | {a} | {a - b:+d} |")
    total_b, total_a = sum(before.values()), sum(after.values())
    lines.append(f"| **total** | {total_b} | {total_a} | {total_a - total_b:+d} |")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kernels", default="prog")
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--out", default="kernel_ir")
    ap.add_argument("--diff", nargs=2, metavar=("BEFORE", "AFTER"),
                    help="diff op histograms of two dump files")
    args = ap.parse_args(argv)

    if args.diff:
        before = op_histogram(open(args.diff[0]).read())
        after = op_histogram(open(args.diff[1]).read())
        print(diff_histograms(before, after))
        return 0

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    dtype = DType.from_short(args.dtype)
    os.makedirs(args.out, exist_ok=True)
    for cfg in get_kernel_configs(args.kernels):
        if cfg.dtype != dtype:
            continue
        if args.seq % cfg.block_q or args.seq % cfg.block_kv:
            print(f"skipping {cfg.short_form()}: seq {args.seq} not tileable")
            continue
        name = cfg.short_form()
        print(f"lowering {name} ...")
        dump = lower_kernel(cfg, seq=args.seq)
        for kind in ("stablehlo", "optimized_hlo", "mosaic"):
            path = os.path.join(args.out, f"{name}.{kind}.mlir")
            with open(path, "w") as f:
                f.write(dump[kind])
        hist = op_histogram(dump["mosaic"])
        top = ", ".join(f"{op}:{n}" for op, n in hist.most_common(8))
        print(f"  mosaic ops: {sum(hist.values())} total; top: {top}")
        if dump.get("cost_analysis"):
            ca = dump["cost_analysis"]
            flops = ca.get("flops", 0)
            print(f"  xla cost: flops={flops:.3e} bytes={ca.get('bytes accessed', 0):.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
