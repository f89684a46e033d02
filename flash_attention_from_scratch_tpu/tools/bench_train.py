"""Training throughput benchmark: full Llama train step, tokens/s and MFU.

Exercises the whole training path — flash forward with LSE residuals, the
dQ/dKV backward kernels, dense matmuls and their grads, AdamW — and scores
it as model FLOPs utilization against the chip's bf16 peak. The transformer
FLOP model is the standard 6·N·tokens (fwd+bwd) plus attention's
``2 · 6 · s² · d · heads / 2(causal)`` term.

Usage:
    python -m flash_attention_from_scratch_tpu.tools.bench_train \
        --dim 2048 --layers 8 --seq 2048 --batch 4 --steps 8
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

from ..dispatch import sync
from ..models.llama import LlamaConfig, init_params
from ..models.train import make_optimizer, make_train_step
from ..utils.chip import chip_sol_tflops, device_kind

__all__ = ["main"]


def train_flops(cfg: LlamaConfig, batch: int, seq: int) -> float:
    """fwd+bwd FLOPs per step: 6·params·tokens + attention term."""
    n_params = (
        cfg.vocab_size * cfg.dim  # lm_head only: embedding is a gather,
        + cfg.n_layers * (        # not a matmul — no FLOPs to count

            cfg.dim * cfg.n_heads * cfg.d_head * 2      # wq, wo
            + cfg.dim * cfg.n_kv_heads * cfg.d_head * 2  # wk, wv
            + 3 * cfg.dim * cfg.hidden_dim               # gate, up, down
        )
    )
    tokens = batch * seq
    dense = 6 * n_params * tokens
    # attention: fwd 2·2·s²·d per head (QK^T, PV), bwd 2.5x fwd; causal halves.
    attn_fwd = 2 * 2 * seq * seq * cfg.d_head * cfg.n_heads * batch / 2
    return dense + attn_fwd * 3.5 * cfg.n_layers


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=8192)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = LlamaConfig(
        vocab_size=args.vocab, dim=args.dim, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.kv_heads, d_head=args.dim // args.heads
        if args.dim // args.heads >= 128 else 128,
        hidden_dim=args.hidden, block_q=512, block_kv=512,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer()
    opt_state = opt.init(params)
    tokens = jax.random.randint(jax.random.PRNGKey(1),
                                (args.batch, args.seq + 1), 0, cfg.vocab_size)
    step = jax.jit(make_train_step(cfg, opt, interpret=False), donate_argnums=(0, 1))

    for _ in range(args.warmup):
        params, opt_state, loss = step(params, opt_state, tokens)
    sync(loss)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        params, opt_state, loss = step(params, opt_state, tokens)
    sync(loss)
    dt = time.perf_counter() - t0

    per_step = dt / args.steps
    flops = train_flops(cfg, args.batch, args.seq)
    tflops = flops / per_step / 1e12
    sol = chip_sol_tflops()
    print(json.dumps({
        "metric": "train_step_mfu",
        "value": round(100 * tflops / sol, 2),
        "unit": "% MFU",
        "model_tflops_per_s": round(tflops, 2),
        "tokens_per_s": round(args.batch * args.seq / per_step, 1),
        "ms_per_step": round(per_step * 1e3, 2),
        "loss": round(float(loss), 4),
        "dim": args.dim, "layers": args.layers, "seq": args.seq,
        "batch": args.batch,
        "device": device_kind(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
