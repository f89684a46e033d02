"""One-command on-chip validation of everything built off-chip.

During the 2026-08-17 TPU-tunnel outage a large feature set landed with
CPU-interpret validation only. This runs each deferred on-chip check in
sequence on the real chip and prints one PASS/FAIL line per item plus a
JSON summary — run it (no args) the moment `jax.devices()` answers.

    python -m flash_attention_from_scratch_tpu.tools.onchip_checklist
"""

from __future__ import annotations

import json
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["main"]


def _check_offset_causal():
    from ..ops.configs import KernelConfig
    from ..ops.flash_forward import flash_forward
    from ..ops.reference import reference_pair
    from ..utils.testing import adaptive_tolerance_check, generate_qkv

    qf, k, v = generate_qkv(1024, n_heads=4, batch=2, dtype=jnp.bfloat16)
    q = qf[:, :, 256:512]
    cfg = KernelConfig(block_q=128, block_kv=128, causal=True, q_offset=256)
    out = flash_forward(q, k[:, :, :512], v[:, :, :512], cfg, interpret=False)
    ref_n, ref_f = reference_pair(q, k[:, :, :512], v[:, :, :512],
                                  causal=True, q_offset=256)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_n, ref_f)
    assert ok, (kerr, berr)


def _check_sliding_window():
    from ..ops.configs import KernelConfig
    from ..ops.flash_forward import flash_forward
    from ..ops.reference import reference_pair
    from ..utils.testing import adaptive_tolerance_check, generate_qkv

    q, k, v = generate_qkv(2048, n_heads=4, batch=2, dtype=jnp.bfloat16)
    cfg = KernelConfig(block_q=128, block_kv=256, causal=True, window=512,
                       optimized_softmax=False)
    out = flash_forward(q, k, v, cfg, interpret=False)
    ref_n, ref_f = reference_pair(q, k, v, causal=True, q_offset=0,
                                  window=512)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_n, ref_f)
    assert ok, (kerr, berr)


def _check_softcap():
    from ..ops.configs import KernelConfig
    from ..ops.flash_forward import flash_forward
    from ..ops.reference import reference_pair
    from ..utils.testing import adaptive_tolerance_check, generate_qkv

    q, k, v = generate_qkv(1024, n_heads=4, batch=2, dtype=jnp.bfloat16)
    q = (q.astype(jnp.float32) * 8).astype(jnp.bfloat16)
    cfg = KernelConfig(block_q=128, block_kv=128, causal=True,
                       attn_softcap=50.0)
    out = flash_forward(q, k, v, cfg, interpret=False)
    ref_n, ref_f = reference_pair(q, k, v, causal=True, q_offset=0,
                                  softcap=50.0)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_n, ref_f)
    assert ok, (kerr, berr)


def _check_multi_token_paged():
    from ..ops.paged_attention import paged_decode_attention

    batch, kv_heads, heads, d, ps, t = 4, 4, 16, 128, 128, 4
    n_pages = 16
    kk, kv, kq = jax.random.split(jax.random.PRNGKey(0), 3)
    kp = jax.random.normal(kk, (kv_heads, n_pages, ps, d),
                           jnp.float32).astype(jnp.bfloat16)
    vp = jax.random.normal(kv, kp.shape, jnp.float32).astype(jnp.bfloat16)
    q = jax.random.normal(kq, (batch, heads, t, d),
                          jnp.float32).astype(jnp.bfloat16)
    pt = jnp.asarray(np.arange(batch * 4, dtype=np.int32).reshape(batch, 4))
    lengths = jnp.asarray([512, 300, 130, 17], jnp.int32)
    out = paged_decode_attention(q, kp, vp, lengths, pt, interpret=False)
    single = paged_decode_attention(q[:, :, -1], kp, vp, lengths, pt,
                                    interpret=False)
    drift = float(jnp.max(jnp.abs(out[:, :, -1].astype(jnp.float32)
                                  - single.astype(jnp.float32))))
    assert drift < 5e-3, drift


def _check_windowed_paged():
    from ..ops.paged_attention import paged_decode_attention

    batch, kv_heads, heads, d, ps = 4, 4, 16, 128, 128
    n_pages = 32
    kp = jax.random.normal(jax.random.PRNGKey(0),
                           (kv_heads, n_pages, ps, d),
                           jnp.float32).astype(jnp.bfloat16)
    vp = jax.random.normal(jax.random.PRNGKey(1), kp.shape,
                           jnp.float32).astype(jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(2), (batch, heads, d),
                          jnp.float32).astype(jnp.bfloat16)
    pt = jnp.asarray(np.arange(batch * 8, dtype=np.int32).reshape(batch, 8))
    lengths = jnp.asarray([1024, 700, 300, 64], jnp.int32)
    out_w = paged_decode_attention(q, kp, vp, lengths, pt, window=256,
                                   interpret=False)
    assert bool(jnp.isfinite(out_w.astype(jnp.float32)).all())


def _check_serving_tiny():
    from ..models.llama import LlamaConfig, init_params
    from ..models.lora import init_lora_adapters
    from ..serving.generate import GenerationServer

    cfg = LlamaConfig(vocab_size=512, dim=512, n_layers=2, n_heads=4,
                      n_kv_heads=2, d_head=128, hidden_dim=1024,
                      block_q=128, block_kv=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    lora = init_lora_adapters(cfg, 2, 8, jax.random.PRNGKey(1), zero_b=False)
    for kwargs in ({"spec_k": 4}, {"prefix_cache": True},
                   {"prefill_chunk_tokens": 128},
                   {"lora": lora, "chunk": 4}):
        server = GenerationServer(params, cfg, num_pages=64, page_size=128,
                                  max_batch=4, pages_per_seq=8,
                                  interpret=False, **kwargs)
        for sid in range(3):
            server.submit(sid, [(sid * 31 + i) % 512 for i in range(200)], 8,
                          adapter=sid % 2 if "lora" in kwargs else -1)
        got = server.run()
        assert all(len(got[sid]) == 8 for sid in range(3)), kwargs


def _check_decode_regression():
    """8B W4A8 decode must still be >= 1500 tok/s (was 1658 pre-outage)."""
    from .bench_decode import main as bench

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench(["--model", "8b", "--weights", "int4", "--act", "int8",
               "--kv", "int8", "--attn-int8", "--fuse", "--scan",
               "--steps", "32", "--batch", "16"])
    row = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert row["value"] >= 1500, row
    return row


CHECKS = [
    ("offset_causal_kernel", _check_offset_causal),
    ("sliding_window_kernel", _check_sliding_window),
    ("attn_softcap_kernel", _check_softcap),
    ("multi_token_paged", _check_multi_token_paged),
    ("windowed_paged_dma_skip", _check_windowed_paged),
    ("serving_spec_prefix_chunked", _check_serving_tiny),
    ("decode_8b_w4a8_regression", _check_decode_regression),
]


def main(argv=None):
    jax.config.update("jax_compilation_cache_dir", "/tmp/fa_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    results = {}
    for name, fn in CHECKS:
        try:
            extra = fn()
            results[name] = "PASS"
            print(f"  {name}: PASS" + (f" {extra}" if extra else ""),
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — report, keep going
            results[name] = f"FAIL: {e}"
            traceback.print_exc()
            print(f"  {name}: FAIL {e}", file=sys.stderr)
    print(json.dumps(results))
    return 0 if all(v == "PASS" for v in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
