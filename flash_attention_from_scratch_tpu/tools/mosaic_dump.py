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
import glob
import os
import re
import sys

import jax
import jax.numpy as jnp

from ..ops.configs import DType, get_kernel_configs, parse_short_form
from ..ops.flash_forward import make_flash_forward
from ..utils.testing import generate_qkv

__all__ = ["lower_kernel", "op_histogram", "diff_histograms", "slice_ir",
           "check_regression", "main"]

_MOSAIC_RE = re.compile(r'custom_call_config\s*=?\s*.*?"', re.S)


def dump_shape(cfg, seq: int = 2048, heads: int = 4):
    """(seq, heads) that the config can actually run at.

    Blocks must tile the sequence (whole-seq-KV configs need seq >=
    block_kv) and head packing needs heads % head_pack == 0.
    """
    seq = max(seq, cfg.block_q, cfg.block_kv)
    if seq % cfg.block_q or seq % cfg.block_kv:
        seq = max(cfg.block_q, cfg.block_kv)
        while seq % cfg.block_q or seq % cfg.block_kv:
            seq += max(cfg.block_q, cfg.block_kv)
    if heads % cfg.head_pack:
        heads = cfg.head_pack
    return seq, heads


def lower_kernel(cfg, seq: int = 2048, heads: int = 4, batch: int = 1):
    """Lower one config; returns dict of IR texts and analyses."""
    seq, heads = dump_shape(cfg, seq, heads)
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


_SSA_DEF_RE = re.compile(r"^\s*(%[A-Za-z0-9_$.-]+(?:,\s*%[A-Za-z0-9_$.-]+)*)(?::\d+)?\s*=")
_SSA_USE_RE = re.compile(r"%[A-Za-z0-9_$.-]+")


def _ssa_base(tok: str) -> str:
    """Normalize a use token: ``%5#1`` (multi-result projection) -> ``%5``."""
    return tok.split("#", 1)[0]


def slice_ir(ir_text: str, value: str, *, forward: bool = False,
             max_depth: int | None = None) -> str:
    """Def-use slice of a dumped MLIR module around one SSA value.

    The analogue of the reference's PTX->SASS dependency slicer
    (``tools/analysis/ptx_sass_filter.py:13-117``), which answers "why is
    this instruction here" by backward-slicing a register's def chain.
    Mosaic IR is SSA text, so the same question is a def-use walk:

    - backward (default): the transitive producers of ``value`` — every op
      whose result feeds it, back to block/function arguments;
    - forward: the transitive consumers — every op whose operands depend
      on it.

    Returns the sliced ops in module line order, each prefixed with its
    line number and distance (in def-use hops) from the seed. Values that
    bottom out in block arguments (loop-carried iter_args, kernel
    parameters) are listed at the end, since those have no defining op in
    the text.
    """
    lines = ir_text.splitlines()
    defs: dict[str, int] = {}
    uses: dict[str, set[int]] = {}
    line_ops: dict[int, tuple[set[str], set[str]]] = {}  # i -> (results, operands)
    for i, ln in enumerate(lines):
        if not ln.strip() or ln.lstrip().startswith("//"):
            continue
        m = _SSA_DEF_RE.match(ln)
        results = set()
        rhs = ln
        if m:
            results = {r.strip() for r in m.group(1).split(",")}
            rhs = ln.split("=", 1)[1]
        operands = {_ssa_base(t) for t in _SSA_USE_RE.findall(rhs)} - results
        for r in results:
            defs[r] = i
        for o in operands:
            uses.setdefault(o, set()).add(i)
        line_ops[i] = (results, operands)

    seed = _ssa_base(value if value.startswith("%") else "%" + value)
    if seed not in defs and seed not in uses:
        return f"// {seed}: not found in module"

    depth_of: dict[int, int] = {}  # line -> hop distance
    frontier = {seed}
    loose_ends: set[str] = set()
    depth = 0
    while frontier and (max_depth is None or depth <= max_depth):
        nxt: set[str] = set()
        for val in frontier:
            if forward:
                for i in uses.get(val, ()):
                    if i not in depth_of:
                        depth_of[i] = depth
                        nxt.update(line_ops[i][0])
            else:
                if val in defs:
                    i = defs[val]
                    if i not in depth_of:
                        depth_of[i] = depth
                        nxt.update(line_ops[i][1])
                else:
                    loose_ends.add(val)
        frontier = nxt
        depth += 1

    out = [f"// {'forward' if forward else 'backward'} slice of {seed}: "
           f"{len(depth_of)} ops"]
    for i in sorted(depth_of):
        out.append(f"{i + 1:>6} [d{depth_of[i]}] {lines[i].strip()}")
    if loose_ends and not forward:
        out.append("// bottomed out at block/function arguments: "
                   + ", ".join(sorted(loose_ends)))
    return "\n".join(out)


def check_regression(ir_dir: str = "kernel_ir", seq: int = 2048,
                     total_growth: float = 0.05, op_growth: float = 0.25,
                     op_slack: int = 8, log=print) -> list[str]:
    """Op-count regression gate against the committed Mosaic dumps.

    Automated analogue of the reference's register-pressure regression tool
    (``tools/build/parse_ptx_build.py:31-141``): re-lowers every kernel that
    has a committed ``<short_form>.mosaic.mlir`` (at the dump shape,
    seq 2048 x 4 heads) and compares op histograms. A kernel FAILS when its
    total Mosaic op count grew more than ``total_growth`` (5%), or any
    single op mnemonic grew by more than ``max(op_slack, op_growth * old)``
    — slack absorbs compiler-version noise; real codegen regressions (an
    accidental relayout, a loop that stopped unrolling) blow well past it.
    Returns the list of failure messages (empty = green). Shrinkage is
    always fine — re-dump to ratchet the baseline down.
    """
    failures = []
    paths = sorted(glob.glob(os.path.join(ir_dir, "*.mosaic.mlir")))
    if not paths:
        return [f"no committed *.mosaic.mlir under {ir_dir}"]
    for path in paths:
        name = os.path.basename(path)[: -len(".mosaic.mlir")]
        try:
            cfg = parse_short_form(name)
        except ValueError:
            log(f"  {name}: unparseable name, skipping")
            continue
        # The dump shape must match what lower_kernel used (whole-seq-KV
        # and head-packed configs adapt it), or op counts won't compare.
        cseq, cheads = dump_shape(cfg, seq)
        committed = op_histogram(open(path).read())
        q, k, v = generate_qkv(cseq, d_head=cfg.d_head, n_heads=cheads,
                               batch=1, dtype=cfg.dtype.jnp_dtype)
        fresh = op_histogram(extract_mosaic_module(cfg, q, k, v))
        t_old, t_new = sum(committed.values()), sum(fresh.values())
        msgs = []
        if t_new > t_old * (1 + total_growth):
            msgs.append(f"total ops {t_old} -> {t_new} "
                        f"(+{100 * (t_new - t_old) / t_old:.1f}%)")
        for op, n_new in fresh.items():
            n_old = committed.get(op, 0)
            if n_new > n_old + max(op_slack, op_growth * n_old):
                msgs.append(f"{op} {n_old} -> {n_new}")
        if msgs:
            failures.append(f"{name}: " + "; ".join(msgs))
            log(f"  {name}: REGRESSED ({'; '.join(msgs)})")
            log(diff_histograms(committed, fresh))
        else:
            log(f"  {name}: ok ({t_old} -> {t_new} ops)")
    return failures


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kernels", default="prog")
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--out", default="kernel_ir")
    ap.add_argument("--diff", nargs=2, metavar=("BEFORE", "AFTER"),
                    help="diff op histograms of two dump files")
    ap.add_argument("--slice", nargs=2, metavar=("FILE", "VALUE"),
                    help="def-use slice of an SSA value in a dump file "
                         "(ptx_sass_filter analogue)")
    ap.add_argument("--forward", action="store_true",
                    help="slice consumers instead of producers")
    ap.add_argument("--depth", type=int, default=None,
                    help="max def-use hops for --slice")
    ap.add_argument("--check", action="store_true",
                    help="regression gate: re-lower committed kernels and "
                         "fail on op-count growth (parse_ptx_build role)")
    args = ap.parse_args(argv)

    if args.check:
        failures = check_regression(args.out, seq=args.seq)
        if failures:
            print(f"\n{len(failures)} kernel(s) regressed:")
            for f in failures:
                print(f"  {f}")
            return 1
        print("\nall committed kernels within op-count budget")
        return 0

    if args.diff:
        before = op_histogram(open(args.diff[0]).read())
        after = op_histogram(open(args.diff[1]).read())
        print(diff_histograms(before, after))
        return 0

    if args.slice:
        print(slice_ir(open(args.slice[0]).read(), args.slice[1],
                       forward=args.forward, max_depth=args.depth))
        return 0

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    dtype = DType.from_short(args.dtype)
    os.makedirs(args.out, exist_ok=True)
    for cfg in get_kernel_configs(args.kernels):
        if cfg.dtype != dtype:
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
