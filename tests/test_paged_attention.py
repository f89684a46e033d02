"""Paged decode attention vs a masked dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_from_scratch_tpu.ops.paged_attention import (
    paged_decode_attention,
)


def _make_paged_cache(key, batch, kv_heads, lengths, page_size, num_pages, d,
                      dtype=jnp.bfloat16):
    """Random contiguous K/V per sequence scattered into a page pool.

    Returns (k_pages, v_pages, page_tables, k_dense, v_dense) where the dense
    copies are (batch, kv_heads, max_len, d) zero-padded past each length.
    """
    max_len = max(lengths)
    pages_per_seq = -(-max_len // page_size)
    kd, vd = jax.random.normal(key, (2, batch, kv_heads, max_len, d), jnp.float32)
    k_dense = kd.astype(dtype)
    v_dense = vd.astype(dtype)

    k_pages = np.zeros((kv_heads, num_pages, page_size, d), np.float32)
    v_pages = np.zeros_like(k_pages)
    page_tables = -np.ones((batch, pages_per_seq), np.int32)
    next_page = 0
    for b in range(batch):
        n = -(-lengths[b] // page_size)
        for i in range(n):
            page_tables[b, i] = next_page
            lo = i * page_size
            hi = min(lo + page_size, lengths[b])
            k_pages[:, next_page, : hi - lo] = np.asarray(
                k_dense[b, :, lo:hi], np.float32)
            v_pages[:, next_page, : hi - lo] = np.asarray(
                v_dense[b, :, lo:hi], np.float32)
            next_page += 1
    assert next_page <= num_pages
    return (jnp.asarray(k_pages, dtype), jnp.asarray(v_pages, dtype),
            jnp.asarray(page_tables), k_dense, v_dense)


def _dense_reference(q, k_dense, v_dense, lengths):
    """Masked softmax attention; q (batch, heads, d)."""
    batch, heads, d = q.shape
    kv_heads = k_dense.shape[1]
    group = heads // kv_heads
    k = jnp.repeat(k_dense, group, axis=1).astype(jnp.float32)
    v = jnp.repeat(v_dense, group, axis=1).astype(jnp.float32)
    s = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32), k) / jnp.sqrt(1.0 * d)
    mask = jnp.arange(k.shape[2])[None, None, :] < jnp.asarray(lengths)[:, None, None]
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhk,bhkd->bhd", p, v)


@pytest.mark.parametrize("lengths", [[128, 333, 256], [1, 17, 512]])
def test_paged_decode_dense(lengths):
    batch, kv_heads, heads, d, page_size, num_pages = len(lengths), 2, 4, 128, 128, 16
    q = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, d),
                          jnp.float32).astype(jnp.bfloat16)
    k_pages, v_pages, pt, k_dense, v_dense = _make_paged_cache(
        jax.random.PRNGKey(0), batch, kv_heads, lengths, page_size, num_pages, d)
    out = paged_decode_attention(q, k_pages, v_pages,
                                 jnp.asarray(lengths), pt)
    ref = _dense_reference(q, k_dense, v_dense, lengths)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    assert err < 3e-2, float(err)


@pytest.mark.parametrize("mode", ["int8", "fp8", "int4"])
def test_paged_decode_quantized(mode):
    from flash_attention_from_scratch_tpu.ops.quant import quantize_kv_pages

    lengths = [256, 128]
    batch, kv_heads, heads, d, page_size, num_pages = 2, 2, 8, 128, 128, 8
    q = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, d),
                          jnp.float32).astype(jnp.bfloat16)
    k_pages, v_pages, pt, k_dense, v_dense = _make_paged_cache(
        jax.random.PRNGKey(0), batch, kv_heads, lengths, page_size, num_pages, d)

    kq, ks = quantize_kv_pages(k_pages, mode)
    vq, vs = quantize_kv_pages(v_pages, mode)
    out = paged_decode_attention(q, kq, vq, jnp.asarray(lengths), pt,
                                 mode=mode, k_scales=ks, v_scales=vs)
    ref = _dense_reference(q, k_dense, v_dense, lengths)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    tol = {"int8": 0.06, "fp8": 0.08, "int4": 0.35}[mode]
    assert err < tol, f"{mode}: {float(err)}"


def test_paged_decode_int8_compute():
    """int8-compute mode (quantized q and P MXU dots) vs the dense oracle."""
    from flash_attention_from_scratch_tpu.ops.quant import quantize_kv_pages

    lengths = [256, 129, 1]
    batch, kv_heads, heads, d, page_size, num_pages = 3, 2, 8, 128, 128, 8
    q = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, d),
                          jnp.float32).astype(jnp.bfloat16)
    k_pages, v_pages, pt, k_dense, v_dense = _make_paged_cache(
        jax.random.PRNGKey(0), batch, kv_heads, lengths, page_size, num_pages, d)

    kq, ks = quantize_kv_pages(k_pages, "int8")
    vq, vs = quantize_kv_pages(v_pages, "int8")
    out = paged_decode_attention(q, kq, vq, jnp.asarray(lengths), pt,
                                 mode="int8", k_scales=ks, v_scales=vs,
                                 int8_compute=True)
    ref = _dense_reference(q, k_dense, v_dense, lengths)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    # int8 KV (~0.06) plus the q/P quantization adds a small extra budget.
    assert err < 0.09, float(err)

    exact = paged_decode_attention(q, kq, vq, jnp.asarray(lengths), pt,
                                   mode="int8", k_scales=ks, v_scales=vs)
    drift = jnp.max(jnp.abs(out.astype(jnp.float32)
                            - exact.astype(jnp.float32)))
    assert drift < 0.05, float(drift)

    with pytest.raises(ValueError, match="int8_compute"):
        paged_decode_attention(q, k_pages, v_pages, jnp.asarray(lengths), pt,
                               int8_compute=True)


def test_paged_decode_int8_compute_loop_variant(monkeypatch):
    """int8-compute through the per-page online-softmax fallback."""
    import flash_attention_from_scratch_tpu.ops.paged_attention as pa
    from flash_attention_from_scratch_tpu.ops.quant import quantize_kv_pages

    monkeypatch.setattr(pa, "_FULL_VARIANT_VMEM_CAP", 0)
    pa._build_decode_call.cache_clear()
    lengths = [256, 128]
    batch, kv_heads, heads, d, page_size, num_pages = 2, 2, 8, 128, 128, 8
    q = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, d),
                          jnp.float32).astype(jnp.bfloat16)
    k_pages, v_pages, pt, k_dense, v_dense = _make_paged_cache(
        jax.random.PRNGKey(0), batch, kv_heads, lengths, page_size, num_pages, d)
    kq, ks = quantize_kv_pages(k_pages, "int8")
    vq, vs = quantize_kv_pages(v_pages, "int8")
    out = paged_decode_attention(q, kq, vq, jnp.asarray(lengths), pt,
                                 mode="int8", k_scales=ks, v_scales=vs,
                                 int8_compute=True)
    ref = _dense_reference(q, k_dense, v_dense, lengths)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    assert err < 0.09, float(err)
    pa._build_decode_call.cache_clear()


@pytest.mark.parametrize("mode", ["dense", "int8", "int4"])
def test_paged_decode_loop_variant(mode, monkeypatch):
    """Force the per-page online-softmax fallback (long-window path)."""
    import flash_attention_from_scratch_tpu.ops.paged_attention as pa
    from flash_attention_from_scratch_tpu.ops.quant import quantize_kv_pages

    monkeypatch.setattr(pa, "_FULL_VARIANT_VMEM_CAP", 0)
    pa._build_decode_call.cache_clear()
    try:
        lengths = [200, 128]
        batch, kv_heads, heads, d, page_size, num_pages = 2, 2, 4, 128, 128, 8
        q = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, d),
                              jnp.float32).astype(jnp.bfloat16)
        k_pages, v_pages, pt, k_dense, v_dense = _make_paged_cache(
            jax.random.PRNGKey(0), batch, kv_heads, lengths, page_size,
            num_pages, d)
        ref = _dense_reference(q, k_dense, v_dense, lengths)
        if mode == "dense":
            out = paged_decode_attention(q, k_pages, v_pages,
                                         jnp.asarray(lengths), pt)
            tol = 3e-2
        else:
            kq, ks = quantize_kv_pages(k_pages, mode)
            vq, vs = quantize_kv_pages(v_pages, mode)
            out = paged_decode_attention(q, kq, vq, jnp.asarray(lengths), pt,
                                         mode=mode, k_scales=ks, v_scales=vs)
            tol = 0.06 if mode == "int8" else 0.35
        err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
        assert err < tol, f"loop variant {mode}: {float(err)}"
    finally:
        pa._build_decode_call.cache_clear()


def test_paged_decode_group1():
    """MHA decode (group == 1)."""
    lengths = [128, 256]
    batch, kv_heads, heads, d, page_size, num_pages = 2, 2, 2, 128, 128, 8
    q = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, d),
                          jnp.float32).astype(jnp.bfloat16)
    k_pages, v_pages, pt, k_dense, v_dense = _make_paged_cache(
        jax.random.PRNGKey(0), batch, kv_heads, lengths, page_size, num_pages, d)
    out = paged_decode_attention(q, k_pages, v_pages, jnp.asarray(lengths), pt)
    ref = _dense_reference(q, k_dense, v_dense, lengths)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    assert err < 3e-2, float(err)


def _dense_reference_multi(q, k_dense, v_dense, lengths, t):
    """q (batch, heads, t, d): token j at position lengths - t + j."""
    batch, heads, _, d = q.shape
    kv_heads = k_dense.shape[1]
    group = heads // kv_heads
    k = jnp.repeat(k_dense, group, axis=1).astype(jnp.float32)
    v = jnp.repeat(v_dense, group, axis=1).astype(jnp.float32)
    s = jnp.einsum("bhjd,bhkd->bhjk", q.astype(jnp.float32), k) / jnp.sqrt(1.0 * d)
    pos = (jnp.asarray(lengths)[:, None] - t
           + jnp.arange(t)[None, :])  # (batch, t)
    mask = (jnp.arange(k.shape[2])[None, None, None, :]
            <= pos[:, None, :, None])
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhjk,bhkd->bhjd", p, v)


@pytest.mark.parametrize("mode", ["dense", "int8"])
def test_paged_decode_multi_token(mode):
    """Multi-token (speculative-verify) queries: per-token causal masks."""
    from flash_attention_from_scratch_tpu.ops.quant import quantize_kv_pages

    t = 4
    lengths = [256, 133, 17]  # includes the t new tokens
    batch, kv_heads, heads, d, page_size, num_pages = 3, 2, 8, 128, 128, 8
    q = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, t, d),
                          jnp.float32).astype(jnp.bfloat16)
    k_pages, v_pages, pt, k_dense, v_dense = _make_paged_cache(
        jax.random.PRNGKey(0), batch, kv_heads, lengths, page_size,
        num_pages, d)

    if mode == "int8":
        kq, ks = quantize_kv_pages(k_pages, "int8")
        vq, vs = quantize_kv_pages(v_pages, "int8")
        out = paged_decode_attention(q, kq, vq, jnp.asarray(lengths), pt,
                                     mode="int8", k_scales=ks, v_scales=vs)
        tol = 0.08
    else:
        out = paged_decode_attention(q, k_pages, v_pages,
                                     jnp.asarray(lengths), pt)
        tol = 0.02
    assert out.shape == (batch, heads, t, d)
    ref = _dense_reference_multi(q, k_dense, v_dense, lengths, t)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    assert err < tol, float(err)

    # The last token must agree with the single-token kernel exactly.
    single = paged_decode_attention(
        q[:, :, -1], k_pages, v_pages, jnp.asarray(lengths), pt) \
        if mode == "dense" else None
    if single is not None:
        drift = jnp.max(jnp.abs(out[:, :, -1].astype(jnp.float32)
                                - single.astype(jnp.float32)))
        assert drift < 5e-3, float(drift)


def test_paged_decode_multi_token_loop_variant(monkeypatch):
    import flash_attention_from_scratch_tpu.ops.paged_attention as pa

    monkeypatch.setattr(pa, "_FULL_VARIANT_VMEM_CAP", 0)
    pa._build_decode_call.cache_clear()
    t = 3
    lengths = [256, 129]
    batch, kv_heads, heads, d, page_size, num_pages = 2, 2, 4, 128, 128, 8
    q = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, t, d),
                          jnp.float32).astype(jnp.bfloat16)
    k_pages, v_pages, pt, k_dense, v_dense = _make_paged_cache(
        jax.random.PRNGKey(0), batch, kv_heads, lengths, page_size,
        num_pages, d)
    out = paged_decode_attention(q, k_pages, v_pages, jnp.asarray(lengths), pt)
    ref = _dense_reference_multi(q, k_dense, v_dense, lengths, t)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    assert err < 0.02, float(err)
    pa._build_decode_call.cache_clear()


def _dense_reference_window(q, k_dense, v_dense, lengths, window):
    batch, heads, d = q.shape
    kv_heads = k_dense.shape[1]
    group = heads // kv_heads
    k = jnp.repeat(k_dense, group, axis=1).astype(jnp.float32)
    v = jnp.repeat(v_dense, group, axis=1).astype(jnp.float32)
    s = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32), k) / jnp.sqrt(1.0 * d)
    pos = jnp.arange(k.shape[2])[None, None, :]
    L = jnp.asarray(lengths)[:, None, None]
    mask = (pos < L) & (pos >= L - window)
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhk,bhkd->bhd", p, v)


@pytest.mark.parametrize("variant", ["full", "loop"])
def test_paged_decode_sliding_window(variant, monkeypatch):
    """Window masks + below-window pages never fetched (both variants)."""
    import flash_attention_from_scratch_tpu.ops.paged_attention as pa

    if variant == "loop":
        monkeypatch.setattr(pa, "_FULL_VARIANT_VMEM_CAP", 0)
        pa._build_decode_call.cache_clear()
    window = 200
    lengths = [512, 300, 64]
    batch, kv_heads, heads, d, page_size, num_pages = 3, 2, 4, 128, 128, 12
    q = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, d),
                          jnp.float32).astype(jnp.bfloat16)
    k_pages, v_pages, pt, k_dense, v_dense = _make_paged_cache(
        jax.random.PRNGKey(0), batch, kv_heads, lengths, page_size,
        num_pages, d)
    # Poison the below-window pages with NaN: if the kernel fetches or fails
    # to mask them, the output goes NaN.
    k_pages = k_pages.at[:, 0].set(jnp.nan)  # page 0 = seq 0 tokens [0,128)
    v_pages = v_pages.at[:, 0].set(jnp.nan)
    out = paged_decode_attention(q, k_pages, v_pages, jnp.asarray(lengths),
                                 pt, window=window)
    ref = _dense_reference_window(q, k_dense, v_dense, lengths, window)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
    assert err < 0.02, float(err)
    if variant == "loop":
        pa._build_decode_call.cache_clear()


def test_paged_decode_window_multi_token():
    """Sliding window composes with multi-token (speculative) queries."""
    t, window = 3, 150
    lengths = [384, 200]
    batch, kv_heads, heads, d, page_size, num_pages = 2, 2, 4, 128, 128, 8
    q = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, t, d),
                          jnp.float32).astype(jnp.bfloat16)
    k_pages, v_pages, pt, k_dense, v_dense = _make_paged_cache(
        jax.random.PRNGKey(0), batch, kv_heads, lengths, page_size,
        num_pages, d)
    out = paged_decode_attention(q, k_pages, v_pages, jnp.asarray(lengths),
                                 pt, window=window)
    # reference: token j at position L - t + j sees (pos - window, pos]
    kv_headsq = k_dense.shape[1]
    group = heads // kv_headsq
    k = jnp.repeat(k_dense, group, axis=1).astype(jnp.float32)
    v = jnp.repeat(v_dense, group, axis=1).astype(jnp.float32)
    s = jnp.einsum("bhjd,bhkd->bhjk", q.astype(jnp.float32), k) / jnp.sqrt(1.0 * d)
    pos = (jnp.asarray(lengths)[:, None] - t + jnp.arange(t)[None, :])
    col = jnp.arange(k.shape[2])[None, None, None, :]
    mask = (col <= pos[:, None, :, None]) & (col > pos[:, None, :, None] - window)
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhjk,bhkd->bhjd", p, v)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    assert err < 0.02, float(err)


def test_paged_decode_softcap():
    """Gemma-2 logit softcap in the decode kernel vs a capped dense oracle."""
    lengths = [256, 100]
    batch, kv_heads, heads, d, page_size, num_pages = 2, 2, 4, 128, 128, 8
    q = (jax.random.normal(jax.random.PRNGKey(1), (batch, heads, d),
                           jnp.float32) * 8).astype(jnp.bfloat16)
    k_pages, v_pages, pt, k_dense, v_dense = _make_paged_cache(
        jax.random.PRNGKey(0), batch, kv_heads, lengths, page_size,
        num_pages, d)
    out = paged_decode_attention(q, k_pages, v_pages, jnp.asarray(lengths),
                                 pt, softcap=20.0)
    group = heads // kv_heads
    k = jnp.repeat(k_dense, group, 1).astype(jnp.float32)
    v = jnp.repeat(v_dense, group, 1).astype(jnp.float32)
    s = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32), k) / jnp.sqrt(1.0 * d)
    s = jnp.tanh(s / 20.0) * 20.0
    mask = jnp.arange(k.shape[2])[None, None, :] < jnp.asarray(lengths)[:, None, None]
    p = jax.nn.softmax(jnp.where(mask, s, -jnp.inf), axis=-1)
    ref = jnp.einsum("bhk,bhkd->bhd", p, v)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    assert err < 0.02, float(err)
    # The cap must bite.
    out_nc = paged_decode_attention(q, k_pages, v_pages,
                                    jnp.asarray(lengths), pt)
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                 - out_nc.astype(jnp.float32)))) > 1e-3
