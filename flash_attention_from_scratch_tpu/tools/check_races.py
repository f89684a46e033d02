"""Hazard checking for the hand-rolled DMA kernels.

TPU-native analogue of the reference's ``tools/debug/check_race.sh``
(compute-sanitizer racecheck over a small workload). Two tiers:

1. **eager (default, fast)**: the generic Pallas interpreter vs the jnp
   oracle — catches slot-indexing and wrong-buffer bugs that corrupt
   results under the eager DMA schedule.
2. **on-wait**: the TPU emulator with ``dma_execution_mode='on_wait'``
   (copies land only at their wait — the least-eager legal schedule) and
   NaN-poisoned memory; a slot reused before its wait or a read of an
   un-DMA'd region surfaces as NaN/divergence. Slow (minutes per kernel).
3. **vector-clocks**: true happens-before race detection
   (``InterpretParams(detect_races=True)``). Precise but hours-slow even on
   toy shapes — the opt-in deep check.

Covers the kernels that drive their own DMAs (Pallas-pipelined GRID
variants are hazard-free by construction): the FORI forward kernel and
both paged-decode variants (cross-program pipelined + per-page loop).

Usage:
    JAX_PLATFORMS=cpu python -m flash_attention_from_scratch_tpu.tools.check_races
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.configs import KernelConfig, KVLoop
from ..ops.flash_forward import make_flash_forward
from ..ops.reference import reference_attention
from ..utils.testing import generate_qkv

__all__ = ["main"]


def _interpret_params(mode: str):
    if mode == "eager":
        # Generic Pallas interpreter: fast; catches indexing/slot bugs that
        # corrupt results under the eager DMA schedule.
        return True
    from jax.experimental.pallas import tpu as pltpu

    # The TPU emulator: orders of magnitude slower, but models DMA/semaphore
    # ordering ("on-wait") or full happens-before races ("vector-clocks").
    return pltpu.InterpretParams(
        detect_races=mode == "vector-clocks",
        skip_floating_point_ops=mode == "vector-clocks",
        dma_execution_mode="on_wait",
        uninitialized_memory="nan",
    )


def check_fori_forward(num_kv_buffers: int, mode: str, log=print) -> bool:
    cfg = KernelConfig(block_q=128, block_kv=128, kv_loop=KVLoop.FORI,
                       num_kv_buffers=num_kv_buffers)
    q, k, v = generate_qkv(384, n_heads=1, batch=1, dtype=jnp.bfloat16)
    call = make_flash_forward(cfg, 1, 1, 384, 384,
                              interpret=_interpret_params(mode))
    out = jax.block_until_ready(call(q, k, v))
    if mode == "vector-clocks":  # completing without raising is the verdict
        log(f"  fori forward nbuf={num_kv_buffers}: no races detected")
        return True
    ref = reference_attention(q, k, v)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    ok = np.isfinite(err) and err < 0.05
    log(f"  fori forward nbuf={num_kv_buffers}: on_wait max|diff|={err:.3e} "
        f"{'ok' if ok else 'HAZARD'}")
    return ok


def check_paged_decode(pages_per_seq: int, mode: str, log=print,
                       window: int = 0) -> bool:
    from ..ops.paged_attention import paged_decode_attention

    batch, kv_heads, heads, d, page_size = 2, 1, 2, 128, 128
    num_pages = batch * pages_per_seq
    lengths = [pages_per_seq * page_size - 3, page_size + 1]
    pt = jnp.asarray(np.arange(num_pages, dtype=np.int32).reshape(
        batch, pages_per_seq))
    q = jax.random.normal(jax.random.PRNGKey(0), (batch, heads, d),
                          jnp.float32).astype(jnp.bfloat16)
    kp, vp = (jax.random.normal(kk, (kv_heads, num_pages, page_size, d),
                                jnp.float32).astype(jnp.bfloat16)
              for kk in jax.random.split(jax.random.PRNGKey(1)))
    out = jax.block_until_ready(paged_decode_attention(
        q, kp, vp, jnp.asarray(lengths), pt, window=window,
        interpret=_interpret_params(mode)))
    tag = f"pages={pages_per_seq}" + (f" window={window}" if window else "")
    if mode == "vector-clocks":
        log(f"  paged decode {tag}: no races detected")
        return True
    # Dense oracle from the page pool.
    kd = kp.reshape(kv_heads, batch, pages_per_seq * page_size, d).transpose(1, 0, 2, 3)
    vd = vp.reshape(kv_heads, batch, pages_per_seq * page_size, d).transpose(1, 0, 2, 3)
    group = heads // kv_heads
    kf = jnp.repeat(kd, group, 1).astype(jnp.float32)
    vf = jnp.repeat(vd, group, 1).astype(jnp.float32)
    s = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32), kf) / jnp.sqrt(1.0 * d)
    pos = jnp.arange(kf.shape[2])[None, None, :]
    lens = jnp.asarray(lengths)[:, None, None]
    mask = pos < lens
    if window:
        mask &= pos >= lens - window
    p = jax.nn.softmax(jnp.where(mask, s, -jnp.inf), axis=-1)
    ref = jnp.einsum("bhk,bhkd->bhd", p, vf)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    ok = np.isfinite(err) and err < 0.05
    log(f"  paged decode {tag}: on_wait max|diff|={err:.3e} "
        f"{'ok' if ok else 'HAZARD'}")
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", default="eager",
                    choices=["eager", "on-wait", "vector-clocks"],
                    help="eager: fast generic interpreter vs oracle; "
                         "on-wait: TPU emulator with least-eager DMA "
                         "schedule (slow); vector-clocks: precise "
                         "happens-before detection (hours)")
    args = ap.parse_args(argv)
    print(f"hazard check: mode={args.mode}", flush=True)
    ok = True
    for nbuf in (1, 2, 3):
        ok &= check_fori_forward(nbuf, args.mode)
    for pages in (2, 6):
        ok &= check_paged_decode(pages, args.mode)
    # Sliding window: below-window pages are never DMA'd — with poisoned
    # interpreter memory any mask slip or 0 * NaN leak shows up here.
    ok &= check_paged_decode(6, args.mode, window=200)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
