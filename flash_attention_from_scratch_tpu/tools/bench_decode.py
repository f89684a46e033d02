"""Decode throughput benchmark: Llama with quantized weights + paged KV.

The BASELINE north-star serving metric (Llama-3-8B, INT8 KV decode,
tokens/s/chip) against an HBM roofline: decode is bandwidth-bound, so the
ceiling is ``HBM_bw / bytes_moved_per_token`` where bytes = quantized weight
stream + the KV window each step reads + writes. Random weights are
generated directly in int8 (``init_quantized_params``) — the dense 8B model
would not fit a 16 GB chip, which is the point of the quantized path.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.bench_decode \
        --model 8b --batch 16 --context 1024 --steps 32 --kv int8
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..dispatch import sync
from ..models.decode import decode_loop, decode_step, init_cache
from ..models.llama import (
    LLAMA3_8B, LLAMA31_8B, MISTRAL_7B, LlamaConfig, fuse_projections,
    init_quantized_params, init_params,
)
from ..ops.quant_matmul import QuantizedWeight
from ..utils.chip import chip_int8_tops, chip_sol_tflops, device_kind, hbm_gbps

__all__ = ["main"]

MODELS = {
    "8b": LLAMA3_8B,
    "8b-3.1": LLAMA31_8B,
    "mistral-7b": MISTRAL_7B,
    "1b": LlamaConfig(vocab_size=128256, dim=2048, n_layers=16, n_heads=16,
                      n_kv_heads=8, d_head=128, hidden_dim=8192),
    "tiny": LlamaConfig(vocab_size=2048, dim=512, n_layers=4, n_heads=4,
                        n_kv_heads=2, d_head=128, hidden_dim=2048),
}


def _param_bytes(params):
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(params))


def _dense_matmul_params(params) -> int:
    """Total elements of the dense (streamed-through-the-MXU) weights.

    Everything 2-D except the embedding table (a gather, not a matmul);
    quantized weights count their logical (K, N), not packed bytes.
    """
    rest = {k: v for k, v in params.items() if k != "embed"}
    leaves = jax.tree_util.tree_flatten(
        rest, is_leaf=lambda x: isinstance(x, QuantizedWeight))[0]
    total = 0
    for leaf in leaves:
        if isinstance(leaf, QuantizedWeight):
            total += leaf.shape[0] * leaf.shape[1]
        elif getattr(leaf, "ndim", 0) == 2:
            total += leaf.size
    return total


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="8b", choices=sorted(MODELS))
    ap.add_argument("--weights", default="int8",
                    choices=["int8", "int4", "bf16"])
    ap.add_argument("--act", default="bf16", choices=["bf16", "int8"],
                    help="activation handling in the dense layers: bf16 = "
                         "weight-only dequant matmuls; int8 = W8A8/W4A8 "
                         "(per-row activation quant, int8 MXU dots)")
    ap.add_argument("--kv", default="int8",
                    choices=["dense", "int8", "fp8"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--context", type=int, default=1024,
                    help="KV tokens already in cache per sequence")
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--scan", action="store_true",
                    help="run all steps inside one jit (lax.scan): measures "
                         "pure device throughput without per-step dispatch "
                         "(compile cost explodes beyond small models)")
    ap.add_argument("--window", type=int, default=0,
                    help="override sliding_window (paged kernel skips pages "
                         "below the window; big lever at long context)")
    ap.add_argument("--attn-int8", action="store_true",
                    help="int8-compute paged attention: quantized q/P MXU "
                         "dots, no K/V upconverts (int8 KV only)")
    ap.add_argument("--fuse", action="store_true",
                    help="fuse QKV and gate|up projections into single "
                         "weight streams (models.llama.fuse_projections)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="decode steps per jit call (python-unrolled): "
                         "amortizes the per-call host dispatch")
    ap.add_argument("--trace", default=None,
                    help="AFTER the timed run, capture an Xprof xplane of a "
                         "few decode steps into this dir and print a per-op "
                         "device-time summary (the roofline-gap attribution "
                         "tool). NOTE: the device tracer can wedge on "
                         "tunneled platforms; the JSON result is printed "
                         "first so a wedge cannot lose the numbers.")
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = MODELS[args.model]
    if args.window:
        cfg = dataclasses.replace(cfg, sliding_window=args.window)
    key = jax.random.PRNGKey(0)
    if args.weights == "bf16":
        params = init_params(cfg, key)
    else:
        params = init_quantized_params(cfg, key, args.weights, act=args.act)
    if args.fuse:
        params = fuse_projections(params)
    pbytes = _param_bytes(params)

    pages_per_seq = -(-(args.context + 2 * args.steps + args.warmup + 1)
                      // args.page_size)
    num_pages = args.batch * pages_per_seq + 1
    cache = init_cache(cfg, num_pages, args.page_size, args.kv)
    cbytes = cache.nbytes()
    print(f"device={device_kind()} params={pbytes/1e9:.2f} GB "
          f"cache={cbytes/1e9:.2f} GB pages={num_pages}", file=sys.stderr)

    # Page tables: sequence i owns pages [i*pps, (i+1)*pps).
    tables = np.arange(args.batch * pages_per_seq, dtype=np.int32).reshape(
        args.batch, pages_per_seq)
    tables_j = jnp.asarray(tables)
    lengths0 = np.full(args.batch, args.context, np.int32)
    tokens = jnp.zeros(args.batch, jnp.int32)

    attn_int8 = bool(args.attn_int8)

    def step(cache, lengths):
        logits, cache = decode_step(params, tokens, cfg, cache,
                                    lengths, tables_j, interpret=False,
                                    attn_int8=attn_int8)
        return jnp.argmax(logits, -1).astype(jnp.int32), cache

    if args.scan:
        # The library chunked-decode path (models.decode.decode_loop) — the
        # same code the serving loop's chunk mode dispatches.
        def run_n(toks, cache, lengths):
            out, cache, lengths = decode_loop(
                params, toks, cfg, cache, lengths, tables_j, args.steps,
                interpret=False, attn_int8=attn_int8)
            return out[:, -1], cache, lengths

        carry = (tokens, cache, jnp.asarray(lengths0))
        carry = run_n(*carry)  # compile + warm
        sync(carry[0])
        t0 = time.perf_counter()
        carry = run_n(*carry)
        sync(carry[0])
        dt = time.perf_counter() - t0
        cache = carry[1]
    elif args.unroll > 1:
        # params must be an ARGUMENT, not a closure: closed-over weights
        # lower as 4.8 GB of inline constants and the remote compiler
        # breaks its pipe (measured round 5, unroll 8 and 2 both).
        @functools.partial(jax.jit, donate_argnums=(2,),
                           static_argnums=())
        def run_u(p, toks, cache, lengths):
            for _ in range(args.unroll):
                lengths = lengths + 1
                logits, cache = decode_step(p, toks, cfg, cache,
                                            lengths, tables_j, interpret=False,
                                            attn_int8=attn_int8)
                toks = jnp.argmax(logits, -1).astype(jnp.int32)
            return toks, cache, lengths

        assert args.steps % args.unroll == 0, "--steps must divide by --unroll"
        carry = (tokens, cache, jnp.asarray(lengths0))
        carry = run_u(params, *carry)  # compile + warm
        sync(carry[0])
        t0 = time.perf_counter()
        for _ in range(args.steps // args.unroll):
            carry = run_u(params, *carry)
        sync(carry[0])
        dt = time.perf_counter() - t0
        cache = carry[1]
    else:
        # Warmup (compiles; also fills a few cache slots).
        lengths = lengths0.copy()
        for _ in range(args.warmup):
            lengths += 1
            tokens, cache = step(cache, jnp.asarray(lengths))
        sync(tokens)

        t0 = time.perf_counter()
        for _ in range(args.steps):
            lengths += 1
            tokens, cache = step(cache, jnp.asarray(lengths))
        sync(tokens)
        dt = time.perf_counter() - t0

    toks = args.batch * args.steps
    tps = toks / dt
    ms_per_step = dt / args.steps * 1e3

    # HBM roofline: per step the chip reads all weights once (batch amortizes
    # the weight stream across sequences) plus each sequence's KV window.
    kv_bytes_per_tok = cache.k_pages[0].dtype.itemsize * cfg.d_head * 2
    # Mean context of the *timed* window per mode: scan/unroll warm with a
    # full extra pass of args.steps before timing; per-step warms args.warmup.
    warm_tokens = (args.steps if args.scan
                   else args.unroll if args.unroll > 1 else args.warmup)
    mean_ctx = args.context + warm_tokens + args.steps / 2
    if cfg.sliding_window:
        # The paged kernel only streams pages inside the window.
        mean_ctx = min(mean_ctx, cfg.sliding_window)
    kv_read = args.batch * mean_ctx * cfg.n_kv_heads * cfg.n_layers * kv_bytes_per_tok
    step_bytes = pbytes + kv_read
    roofline_tps = hbm_gbps() * 1e9 / step_bytes * args.batch

    # MXU bound: a (batch, K) x (K, N) decode dot pads batch to the 128-row
    # systolic array, so below batch 128 the dense stack costs a fixed
    # 2 * 128 * sum(K*N) ops per step regardless of weight dtype. W8A8/W4A8
    # issue int8 x int8 dots, which the v5e MXU runs at ~2x the bf16 rate
    # (255 TOP/s measured vs the 187 bf16 ceiling) — so the padding bound
    # uses the int8 peak when activations are quantized. At batch 16 / 8B
    # that's ~4.9 ms vs a 7.2 ms int4 HBM stream: the stream binds, and
    # tokens/s scales with batch until the 128 rows fill.
    padded_m = max(128, -(-args.batch // 128) * 128)
    mxu_rate = (chip_int8_tops() if args.act == "int8"
                else chip_sol_tflops())
    mxu_s = 2.0 * padded_m * _dense_matmul_params(params) / (mxu_rate * 1e12)
    hbm_s = step_bytes / (hbm_gbps() * 1e9)
    bound_s = max(mxu_s, hbm_s)
    print(json.dumps({
        "metric": (f"decode_tokens_per_s_{args.model}_w{args.weights}"
                       + (f"a8" if args.act == "int8" else "")
                       + f"_kv{args.kv}"
                       + ("i8" if attn_int8 else "")
                       + (f"_w{cfg.sliding_window}" if cfg.sliding_window
                          else "")),
        "value": round(tps, 2),
        "unit": "tokens/s/chip",
        "ms_per_step": round(ms_per_step, 3),
        "batch": args.batch,
        "context": args.context,
        "tokens_per_s_per_seq": round(tps / args.batch, 2),
        "hbm_roofline_tokens_per_s": round(roofline_tps, 2),
        "pct_of_roofline": round(100 * tps / roofline_tps, 2),
        "hbm_bound_ms": round(hbm_s * 1e3, 3),
        "mxu_bound_ms": round(mxu_s * 1e3, 3),
        "binding_constraint": "mxu_padding" if mxu_s > hbm_s else "hbm",
        "pct_of_bound": round(100 * bound_s / (dt / args.steps), 2),
        "param_gb": round(pbytes / 1e9, 3),
        "cache_gb": round(cbytes / 1e9, 3),
        "device": device_kind(),
    }))

    if args.trace:
        # Per-op attribution of the decode step (VERDICT r3 #4): which ops
        # carry the 25% between measured ms/step and the HBM roofline.
        import os as _os

        import jax.profiler as _prof

        _os.makedirs(args.trace, exist_ok=True)
        lengths_t = (np.asarray(carry[2]) if args.scan or args.unroll > 1
                     else lengths)
        cache_t = cache
        toks_t = jnp.asarray(tokens)
        with _prof.trace(args.trace):
            for _ in range(3):
                lengths_t = lengths_t + 1
                logits, cache_t = decode_step(
                    params, toks_t, cfg, cache_t, jnp.asarray(lengths_t),
                    tables_j, interpret=False, attn_int8=attn_int8)
                toks_t = jnp.argmax(logits, -1).astype(jnp.int32)
            sync(toks_t)
        from .profile_trace import summarize_xplane

        summary = summarize_xplane(args.trace)
        print(json.dumps({"trace_summary": summary}), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
