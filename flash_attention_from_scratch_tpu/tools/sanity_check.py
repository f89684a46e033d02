"""Quick numerics sanity check across kernel configs.

Port of ``tools/debug/sanity_check.py:15-77``: run selected configs against
the oracle, print mismatch counts / max-abs-diff per config, with a
``--small`` mode (batch 1, one head, seq 512) for racecheck-style fast runs.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.sanity_check --kernels prog
    python -m flash_attention_from_scratch_tpu.tools.sanity_check --small --kernel 3
"""

from __future__ import annotations

import argparse
import sys

import jax

from ..ops.configs import DType, get_kernel_configs
from ..ops.flash_forward import flash_forward
from ..ops.reference import reference_pair
from ..utils.testing import adaptive_tolerance_check, error_stats, generate_qkv

__all__ = ["main"]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kernels", default="prog")
    ap.add_argument("--kernel", type=int, default=None,
                    help="index into the selected config list (ref --kernel=N)")
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--small", action="store_true",
                    help="batch 1, seq 512, 1 head (ref sanity_check.py --small)")
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")

    if args.small:
        args.batch, args.seq, args.heads = 1, 512, 1

    dtype = DType.from_short(args.dtype)
    configs = [c for c in get_kernel_configs(args.kernels) if c.dtype == dtype]
    if not configs:
        print(f"no configs matched --kernels {args.kernels} --dtype {args.dtype}")
        return 2  # nothing checked must not read as a pass
    if args.kernel is not None:
        configs = [configs[args.kernel]]

    q, k, v = generate_qkv(args.seq, n_heads=args.heads, batch=args.batch,
                           dtype=dtype.jnp_dtype)
    ref_native, ref_fp32 = reference_pair(q, k, v)

    n_bad = 0
    n_ran = 0
    for cfg in configs:
        if args.seq % cfg.block_q or args.seq % cfg.block_kv:
            print(f"{cfg.short_form():<44} SKIP (seq {args.seq} not tileable)")
            continue
        out = flash_forward(q, k, v, cfg)
        ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
        stats = error_stats(out, ref_native)
        verdict = "OK " if ok else "BAD"
        n_bad += not ok
        print(f"{cfg.short_form():<44} {verdict} kerr={kerr:.3e} "
              f"(2x-bound from {berr:.3e}) {stats}")
        n_ran += 1
    if n_ran == 0:
        print("every config was skipped (tileability): nothing checked")
        return 2
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
