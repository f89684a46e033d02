"""Tensor-parallel decode scaling report over a (virtual or real) mesh.

The multi-chip analogue of ``bench_decode``'s roofline: decode throughput
per chip is HBM-stream bound, so sharding the weight stream over tp chips
scales tokens/s by ~tp until the replicated work (embedding gather, final
norm, collectives) binds. With one physical chip attached we cannot *time*
tp > 1 — instead this tool grounds the scaling claim in compiled artifacts:

1. Executes one real tensor-parallel ``decode_step`` on an n-device mesh
   (virtual CPU devices unless real chips exist) — the sharding compiles
   and runs, not just type-checks.
2. Measures **exact** per-device HBM bytes from the placed arrays
   (``addressable_shards``), not from an analytic model.
3. Counts the collectives XLA/GSPMD actually inserted in the compiled HLO
   (all-reduce/all-gather/reduce-scatter/collective-permute) and sizes the
   per-layer activation all-reduces.
4. Combines measured single-chip step time (from ``bench_decode``, if
   given) with the per-device byte ratio and an ICI latency model to
   project tokens/s at each tp — reported as *projection*, clearly
   separated from measurement.

No reference analogue (the reference is single-GPU; SURVEY.md §5.7/5.8) —
this serves BASELINE.md's "decode scaling >= 1.8x from 1 -> 2 hosts" north
star with the strongest evidence a 1-chip environment can produce.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decode import decode_step, init_cache
from ..models.llama import LlamaConfig, init_params, init_quantized_params
from ..parallel.mesh import MODEL_AXIS, make_mesh, shard_params
from ..utils.chip import hbm_gbps

__all__ = ["tp_decode_report", "main"]

# Approximate per-chip, per-axis ICI bandwidth (bytes/s, bidirectional).
# v5e: 1D/2D torus, ~45 GB/s per link per direction. Used only for the
# *projection* column; the byte counts above it are exact.
_ICI_BYTES_PER_S = 9e10


def _device_bytes(tree) -> int:
    """Bytes resident on device 0 — exact, from the placed shards."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        first = leaf.addressable_shards[0]
        total += int(np.prod(first.data.shape)) * leaf.dtype.itemsize
    return total


def _collective_counts(hlo_text: str) -> dict:
    counts = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        # Match the op's call paren: async lowering emits {op}-start /
        # {op}-done pairs, which a bare substring would double-count.
        counts[op] = (hlo_text.count(f" {op}(")
                      + hlo_text.count(f" {op}-start("))
    return counts


def tp_decode_report(cfg: LlamaConfig, tps=(1, 2, 4, 8), *, batch: int = 16,
                     context: int = 1024, page_size: int = 128,
                     weights: str = "int8", kv: str = "int8",
                     single_chip_ms: float | None = None,
                     hbm_gbps_val: float | None = None,
                     exec_batch: int | None = None) -> list[dict]:
    """One report row per tp degree. Executes each step once for real.

    ``exec_batch`` (default min(batch, 4)): batch used for the proving
    execution/compile only — the per-sequence cache-write unroll makes the
    CPU compile of a big model at batch 16 intractable, and batch does not
    change the sharding. Byte accounting and projections use ``batch``.
    """
    if hbm_gbps_val is None:
        hbm_gbps_val = hbm_gbps()
    tps = sorted(tps)
    if single_chip_ms is not None and tps[0] != 1:
        raise ValueError("single_chip_ms anchors projections on a tp=1 "
                         "measurement; include 1 in tps")
    if exec_batch is None:
        exec_batch = min(batch, 4)
    rows = []
    pages_per_seq = -(-(context + 8) // page_size)
    num_pages = exec_batch * pages_per_seq + 1

    key = jax.random.PRNGKey(0)
    if weights == "bf16":
        params = init_params(cfg, key)
    else:
        params = init_quantized_params(cfg, key, weights, act="int8")

    for tp in tps:
        mesh = make_mesh(1, tp)
        p_sh = shard_params(params, mesh)
        cache = init_cache(cfg, num_pages, page_size, kv)
        # KV pool: kv-head dim shards over tp like the attention kernel.
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))

        # Match decode's shard_map specs: KV heads (pool dim 0) over tp.
        cache = jax.tree_util.tree_map(
            lambda x: put(x, P(MODEL_AXIS, None, None, None))
            if x.ndim == 4 else put(x, P(MODEL_AXIS, None)), cache)

        tokens = jnp.zeros(exec_batch, jnp.int32)
        lengths = jnp.full((exec_batch,), context, jnp.int32)
        tables = jnp.asarray(
            np.arange(exec_batch * pages_per_seq, dtype=np.int32)
            .reshape(exec_batch, pages_per_seq))

        interp = jax.devices()[0].platform == "cpu" or \
            mesh.devices.flat[0].platform == "cpu"
        param_bytes_dev = _device_bytes(p_sh)
        lowered = decode_step.lower(p_sh, tokens, cfg, cache, lengths,
                                    tables, interpret=interp, mesh=mesh)
        compiled = lowered.compile()
        # Execute through the compiled object — one compile per tp, and the
        # run is the same executable whose HLO the collectives are read from.
        logits, _ = compiled(p_sh, tokens, cache, lengths, tables)
        jax.block_until_ready(logits)
        kv_elem_bytes = {"int8": 1.0, "fp8": 1.0, "int4": 0.5}.get(kv, 2.0)
        kv_window = int(batch * context * cfg.n_kv_heads * cfg.n_layers
                        * 2 * cfg.d_head * kv_elem_bytes) // tp
        step_bytes_dev = param_bytes_dev + kv_window
        colls = _collective_counts(compiled.as_text())

        row = {
            "tp": tp,
            "param_bytes_per_dev": param_bytes_dev,
            "kv_bytes_per_dev": kv_window,
            "step_bytes_per_dev": step_bytes_dev,
            "collectives": colls,
            "executed": bool(np.isfinite(
                np.asarray(logits, dtype=np.float32)).all()),
        }
        rows.append(row)

    # Projections off the smallest-tp row (tp=1 when single_chip_ms is
    # given): HBM time scales with measured bytes; ICI adds 2 activation
    # all-reduces per layer (Megatron pattern).
    base = rows[0]
    for row in rows:
        tp = row["tp"]
        byte_ratio = row["step_bytes_per_dev"] / base["step_bytes_per_dev"]
        ici_s = 0.0
        if tp > 1:
            ar_bytes = 2 * cfg.n_layers * batch * cfg.dim * 2  # bf16 acts
            ici_s = ar_bytes * 2 * (tp - 1) / tp / _ICI_BYTES_PER_S
        if single_chip_ms is not None:
            # Split the measured step into HBM-proportional and fixed parts
            # conservatively: everything scales with bytes except attention
            # softmax/sampling (~fixed), approximated by the measured
            # overhead above the tp=1 HBM bound.
            hbm_s1 = base["step_bytes_per_dev"] / (hbm_gbps_val * 1e9)
            fixed_s = max(single_chip_ms / 1e3 - hbm_s1, 0.0) / tp ** 0.5
            proj_s = hbm_s1 * byte_ratio + fixed_s + ici_s
            row["projected_ms_per_step"] = round(proj_s * 1e3, 3)
            row["projected_tokens_per_s"] = round(batch / proj_s, 1)
            row["projected_scaling_vs_tp1"] = round(
                (single_chip_ms / 1e3) / proj_s, 3)
        row["ici_ms"] = round(ici_s * 1e3, 4)
        row["byte_ratio_vs_tp1"] = round(byte_ratio, 4)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="1b")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--context", type=int, default=1024)
    # int4 is not offered: row-parallel (wo/w_down) packed-int4 sharding
    # would split the K-dim nibble pairing (shard_params raises).
    ap.add_argument("--weights", default="int8", choices=["int8", "bf16"])
    ap.add_argument("--kv", default="int8", choices=["dense", "int8", "int4"])
    ap.add_argument("--tps", default="1,2,4,8")
    ap.add_argument("--single-chip-ms", type=float, default=None,
                    help="measured ms/step at tp=1 from bench_decode, to "
                         "anchor the projection")
    args = ap.parse_args(argv)

    from .bench_decode import MODELS

    cfg = MODELS[args.model]
    tps = tuple(int(t) for t in args.tps.split(","))
    n_dev = max(len(jax.devices()), len(jax.devices("cpu")))
    if max(tps) > n_dev:
        raise SystemExit(
            f"need {max(tps)} devices for --tps but only {n_dev} exist; "
            f"set XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{max(tps)} (before python starts) for a virtual CPU mesh")
    rows = tp_decode_report(cfg, tps, batch=args.batch, context=args.context,
                            weights=args.weights, kv=args.kv,
                            single_chip_ms=args.single_chip_ms)
    for row in rows:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
