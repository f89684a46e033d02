"""Step-by-step kernel debugger: diff the kernel against the block mirror.

Port of ``tools/debug/debug.py``: the reference ran a pure-PyTorch
block-by-block flash attention mirroring the kernel's view (reversed block
order, exp2 softmax) and diffed its printed intermediates against device
printf output. Here the mirror is ``ops.reference.block_flash_attention``
(same recurrence, same flags) and the kernel side is run twice:

1. interpret mode with the same block schedule — intermediates are exactly
   reproducible, and the final outputs are diffed per (q_block, kv_step);
2. optionally compiled on hardware, diffing the final output only.

Per-row/per-column diff maps locate which block of the recurrence diverges
(analogue of ``debug.py:240-248``'s diff maps).

Usage:
    python -m flash_attention_from_scratch_tpu.tools.debug_steps --kernel 3 --small
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.configs import DType, get_kernel_configs
from ..ops.flash_forward import flash_forward
from ..ops.reference import block_flash_attention, reference_attention
from ..utils.testing import generate_qkv

__all__ = ["main"]


def _diff_map(out, ref, block: int, axis: int):
    """Max abs diff per block along ``axis`` (rows=q blocks)."""
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    n = d.shape[axis] // block
    return [float(np.max(np.take(d, range(i * block, (i + 1) * block), axis=axis)))
            for i in range(n)]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kernels", default="prog")
    ap.add_argument("--kernel", type=int, default=0, help="index into config list")
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--trace", action="store_true",
                    help="print every per-block intermediate of the mirror")
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    if args.small:
        args.seq = 512

    dtype = DType.from_short(args.dtype)
    cfgs = [c for c in get_kernel_configs(args.kernels) if c.dtype == dtype]
    cfg = cfgs[args.kernel]
    print(f"debugging {cfg.short_form()} at seq {args.seq}")

    q, k, v = generate_qkv(args.seq, n_heads=1, batch=1, dtype=dtype.jnp_dtype)

    # The jnp mirror with the kernel's exact schedule.
    mirror = block_flash_attention(
        q, k, v, block_q=cfg.block_q, block_kv=cfg.block_kv,
        use_exp2=cfg.use_exp2, reverse_kv=cfg.reverse_kv,
        collect_trace=args.trace,
    )
    if args.trace:
        mirror, trace = mirror
        for t in trace:
            print(f"-- q_block {t['q_block']} kv_block {t['kv_block']}: "
                  f"S range [{float(t['S'].min()):+.4f}, {float(t['S'].max()):+.4f}] "
                  f"m max {float(t['m'].max()):+.4f} l max {float(t['l'].max()):.4f} "
                  f"O max {float(np.abs(np.asarray(t['O'])).max()):.4f}")

    ref = reference_attention(q, k, v)

    # Kernel, interpreted (bit-repeatable) and compiled (hardware).
    out_interp = flash_forward(q, k, v, cfg, interpret=True)
    rows_i = _diff_map(out_interp, mirror, cfg.block_q, axis=2)
    print(f"interpret-vs-mirror per-q-block max diff: "
          f"{['%.2e' % r for r in rows_i]}")

    if jax.default_backend() != "cpu":
        out_hw = flash_forward(q, k, v, cfg, interpret=False)
        rows_h = _diff_map(out_hw, mirror, cfg.block_q, axis=2)
        print(f"hardware-vs-mirror per-q-block max diff:  "
              f"{['%.2e' % r for r in rows_h]}")
        print(f"hardware-vs-interpret max diff: "
              f"{float(jnp.max(jnp.abs(out_hw.astype(jnp.float32) - out_interp.astype(jnp.float32)))):.3e}")

    print(f"mirror-vs-plain-softmax max diff: "
          f"{float(jnp.max(jnp.abs(mirror.astype(jnp.float32) - ref.astype(jnp.float32)))):.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
