"""Numerics suite for the Pallas flash-forward kernel.

The structure ports the reference's unit suite (``py/flash_helpers/test/
test.py``): parameterized over every config in the build set, checked against
the double oracle with the official adaptive tolerance rule
(``test.py:57-61``). Runs in interpret mode on CPU (see conftest).
"""

import jax.numpy as jnp
import pytest

from flash_attention_from_scratch_tpu.ops.configs import (
    DType,
    KernelConfig,
    KVLoop,
    get_kernel_progression_configs,
)
from flash_attention_from_scratch_tpu.ops.flash_forward import flash_forward
from flash_attention_from_scratch_tpu.ops.reference import reference_pair
from flash_attention_from_scratch_tpu.utils.testing import (
    adaptive_tolerance_check,
    generate_qkv,
)

# Small-but-representative default test shape (reference uses seq 2048 x
# batch 16 on hardware, test.py:19-24; interpret mode needs smaller — what
# matters is exercising several blocks of the online-softmax recurrence).
SEQ, HEADS, BATCH = 256, 2, 1


def _check(cfg, seq=SEQ, heads=HEADS, batch=BATCH, causal=False):
    seq = max(seq, 2 * cfg.block_q, cfg.block_kv)
    q, k, v = generate_qkv(seq, d_head=cfg.d_head, n_heads=heads, batch=batch,
                           dtype=cfg.dtype.jnp_dtype)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=causal)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, (
        f"{cfg.short_form()}: kernel max err {kerr:.3e} > 2x baseline {berr:.3e}"
    )


LADDER = get_kernel_progression_configs(DType.BF16)


@pytest.mark.parametrize("name,cfg", LADDER, ids=[n for n, _ in LADDER])
def test_ladder_bf16(name, cfg):
    _check(cfg)


def test_fp32_config():
    _check(KernelConfig(dtype=DType.FP32, block_q=128, block_kv=128))


def test_fp16_config():
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("fp16 matmul unsupported on TPU MXU; bf16 is the native type")
    _check(KernelConfig(dtype=DType.FP16, block_q=128, block_kv=128))


@pytest.mark.parametrize("block_q,block_kv", [(128, 256), (256, 128)])
def test_rectangular_blocks(block_q, block_kv):
    _check(KernelConfig(block_q=block_q, block_kv=block_kv), seq=512)


def test_uneven_q_kv_lengths():
    cfg = KernelConfig(block_q=128, block_kv=128)
    q, _, _ = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16, seed=1)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"cross-attention: {kerr:.3e} vs baseline {berr:.3e}"


@pytest.mark.parametrize("kv_loop", [KVLoop.GRID, KVLoop.FORI])
def test_causal(kv_loop):
    cfg = KernelConfig(block_q=128, block_kv=128, causal=True, kv_loop=kv_loop)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=True)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"causal {kv_loop}: {kerr:.3e} vs baseline {berr:.3e}"


@pytest.mark.parametrize("kv_loop", [KVLoop.GRID, KVLoop.FORI])
@pytest.mark.parametrize("q_offset", [128, 256, 384])
def test_offset_causal(kv_loop, q_offset):
    """Chunked-prefill masking: q row i sees kv [0, q_offset + i].

    Cross-checks the kernel against a dense-mask oracle AND against the
    equivalent full causal pass restricted to the chunk's rows.
    """
    import jax

    seq_kv, chunk = 512, 128
    cfg = KernelConfig(block_q=128, block_kv=128, causal=True,
                       q_offset=q_offset, kv_loop=kv_loop)
    qf, k, v = generate_qkv(seq_kv, n_heads=2, batch=1, dtype=jnp.bfloat16)
    q = qf[:, :, q_offset:q_offset + chunk]
    out = flash_forward(q, k[:, :, :q_offset + chunk],
                        v[:, :, :q_offset + chunk], cfg)
    ref_native, ref_fp32 = reference_pair(
        q, k[:, :, :q_offset + chunk], v[:, :, :q_offset + chunk],
        causal=True, q_offset=q_offset)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"offset {q_offset} {kv_loop}: {kerr:.3e} vs {berr:.3e}"

    # The same rows of a full causal pass must match exactly in semantics.
    full = flash_forward(qf, k, v, KernelConfig(
        block_q=128, block_kv=128, causal=True, kv_loop=kv_loop))
    err = float(jax.numpy.max(jax.numpy.abs(
        out.astype(jnp.float32)
        - full[:, :, q_offset:q_offset + chunk].astype(jnp.float32))))
    assert err < 0.02, err


@pytest.mark.parametrize("kv_loop", [KVLoop.GRID, KVLoop.FORI])
@pytest.mark.parametrize("window", [128, 256, 400])
def test_sliding_window(kv_loop, window):
    """Mistral-style window: q position p attends kv (p - window, p]."""
    cfg = KernelConfig(block_q=128, block_kv=128, causal=True, window=window,
                       optimized_softmax=False, kv_loop=kv_loop)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=True,
                                          q_offset=0, window=window)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"window {window} {kv_loop}: {kerr:.3e} vs {berr:.3e}"


def test_sliding_window_with_kv_splits():
    cfg = KernelConfig(block_q=128, block_kv=512, kv_splits=4, causal=True,
                       window=300, optimized_softmax=False)
    q, k, v = generate_qkv(1024, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=True,
                                          q_offset=0, window=300)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"{kerr:.3e} vs {berr:.3e}"


def test_window_validation():
    with pytest.raises(ValueError, match="window"):
        KernelConfig(window=128)  # requires causal
    with pytest.raises(ValueError, match="optimized_softmax"):
        KernelConfig(causal=True, window=128)  # default os=True conflicts


@pytest.mark.parametrize("kv_loop", [KVLoop.GRID, KVLoop.FORI])
@pytest.mark.parametrize("causal", [False, True])
def test_gqa(kv_loop, causal):
    """Grouped-query attention: 4 Q heads share each KV head via index map."""
    cfg = KernelConfig(block_q=128, block_kv=128, causal=causal, kv_loop=kv_loop)
    q, _, _ = generate_qkv(256, n_heads=8, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16, seed=1)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=causal)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"gqa {kv_loop}: {kerr:.3e} vs baseline {berr:.3e}"


def test_gqa_invalid_heads():
    cfg = KernelConfig(block_q=128, block_kv=128)
    q, _, _ = generate_qkv(256, n_heads=6, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(256, n_heads=4, batch=1, dtype=jnp.bfloat16)
    with pytest.raises(ValueError):
        flash_forward(q, k, v, cfg)


def test_fori_multi_buffer():
    _check(KernelConfig(block_q=128, block_kv=128, kv_loop=KVLoop.FORI,
                        num_kv_buffers=3))


def test_d_head_256():
    """The reference is hardwired to d_head 128; here any 128-multiple works."""
    cfg = KernelConfig(block_q=128, block_kv=256, d_head=256)
    q, k, v = generate_qkv(512, d_head=256, n_heads=2, batch=1,
                           dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"d256: {kerr:.3e} vs {berr:.3e}"


def test_custom_scale():
    cfg = KernelConfig(block_q=128, block_kv=128)
    q, k, v = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg, scale=0.5)
    from flash_attention_from_scratch_tpu.ops.reference import reference_attention

    ref = reference_attention(q, k, v, scale_override=0.5)
    ref32 = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        scale_override=0.5,
    )
    ok, kerr, berr = adaptive_tolerance_check(out, ref, ref32)
    assert ok, f"scale override: {kerr:.3e} vs {berr:.3e}"


def test_validation_errors():
    cfg = KernelConfig()
    q, k, v = generate_qkv(256, n_heads=2, batch=1, dtype=jnp.bfloat16)
    with pytest.raises(ValueError):  # dtype mismatch
        flash_forward(q.astype(jnp.float32), k, v, cfg)
    with pytest.raises(ValueError):  # seq not divisible by block
        flash_forward(q[:, :, :100], k, v, cfg)
    with pytest.raises(ValueError):  # K/V mismatch
        flash_forward(q, k, v[:, :, :128], cfg)


# -- split-partials softmax (kv_splits) --------------------------------------


@pytest.mark.parametrize("kv_loop", [KVLoop.GRID, KVLoop.FORI])
@pytest.mark.parametrize("causal", [False, True])
def test_kv_splits(kv_loop, causal):
    """Independent sub-tile partials, merged flash-style at block end."""
    cfg = KernelConfig(block_q=128, block_kv=256, kv_splits=2, causal=causal,
                       kv_loop=kv_loop)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=causal)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"kv_splits {kv_loop} causal={causal}: {kerr:.3e} vs {berr:.3e}"


def test_kv_splits_single_block_gqa():
    """Whole-sequence KV block + splits + GQA: the production fast path."""
    cfg = KernelConfig(block_q=128, block_kv=512, kv_splits=4)
    q, _, _ = generate_qkv(512, n_heads=8, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16, seed=1)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"kv_splits gqa: {kerr:.3e} vs {berr:.3e}"


def test_kv_splits_causal_masked_subtile():
    """A sub-tile that is fully masked must contribute exactly zero.

    With block_kv == seq and kv_splits 4, the first Q block (rows 0-127)
    sees sub-tiles 2-4 fully above the causal diagonal: their local max is
    the mask value and their merge weight underflows to 0.
    """
    cfg = KernelConfig(block_q=128, block_kv=512, kv_splits=4, causal=True)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=True)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"masked sub-tile: {kerr:.3e} vs {berr:.3e}"
    assert not jnp.any(jnp.isnan(out.astype(jnp.float32)))


def test_kv_splits_lse():
    """The LSE residual must be split-invariant (backward-pass contract)."""
    from flash_attention_from_scratch_tpu.ops.flash_forward import (
        flash_forward_with_lse,
    )

    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    base = KernelConfig(block_q=128, block_kv=512)
    split = KernelConfig(block_q=128, block_kv=512, kv_splits=4)
    _, lse_base = flash_forward_with_lse(q, k, v, base)
    out, lse_split = flash_forward_with_lse(q, k, v, split)
    assert float(jnp.max(jnp.abs(lse_base - lse_split))) < 1e-3


def test_kv_splits_validation():
    with pytest.raises(ValueError):  # does not divide
        KernelConfig(block_kv=512, kv_splits=3)
    with pytest.raises(ValueError):  # sub-tile below one lane tile
        KernelConfig(block_kv=256, kv_splits=4)


def test_for_shape_picks_splits():
    # Defaults follow the measured v5e winners (_SWEEP_TABLE).
    cfg = KernelConfig.for_shape(4096, 4096)
    assert cfg.block_kv == 4096 and cfg.kv_splits == 2 and cfg.q_splits == 2
    cfg = KernelConfig.for_shape(16384, 16384)
    assert cfg.kv_splits == 8 and cfg.q_splits == 2
    cfg = KernelConfig.for_shape(1024, 1024)
    assert cfg.kv_splits == 1 and cfg.head_pack == 1
    # With heads known (and no GQA) short sequences pack whole heads.
    cfg = KernelConfig.for_shape(512, 512, heads=16, kv_heads=16)
    assert cfg.head_pack == 16 and cfg.q_splits == 2
    cfg = KernelConfig.for_shape(2048, 2048, heads=16, kv_heads=16)
    assert cfg.head_pack == 4 and cfg.kv_splits == 1
    # GQA cannot pack: falls back to q_splits (+ kv_splits once wide).
    cfg = KernelConfig.for_shape(2048, 2048, heads=16, kv_heads=4)
    assert cfg.head_pack == 1 and cfg.q_splits == 2 and cfg.kv_splits == 2
    cfg = KernelConfig.for_shape(8192, 8192, heads=16, kv_heads=16)
    assert cfg.head_pack == 2 and cfg.kv_splits == 4


# -- q-row split partials (q_splits) -----------------------------------------


@pytest.mark.parametrize("causal", [False, True])
def test_q_splits(causal):
    """Independent Q-row sub-tiles: same numerics as the whole-block path."""
    cfg = KernelConfig(block_q=256, block_kv=256, q_splits=2, causal=causal)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=causal)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"q_splits causal={causal}: {kerr:.3e} vs {berr:.3e}"


def test_q_splits_with_kv_splits():
    """Both split axes together (each sub-problem runs the split-kv path)."""
    cfg = KernelConfig(block_q=256, block_kv=512, q_splits=2, kv_splits=2)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"q+kv splits: {kerr:.3e} vs {berr:.3e}"


def test_q_splits_multiblock_kv_causal():
    """Sub-tiles that are fully masked for a later KV block contribute 0."""
    cfg = KernelConfig(block_q=256, block_kv=128, q_splits=2, causal=True)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=True)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"{kerr:.3e} vs {berr:.3e}"
    assert not jnp.any(jnp.isnan(out.astype(jnp.float32)))


def test_q_splits_validation():
    with pytest.raises(ValueError):  # does not divide
        KernelConfig(block_q=256, q_splits=3)
    with pytest.raises(ValueError):  # sub-tile below the bf16 sublane tile
        KernelConfig(block_q=32, q_splits=4)
    cfg = KernelConfig(block_q=256, q_splits=2)
    assert "qs2" in cfg.short_form()
    from flash_attention_from_scratch_tpu.ops.configs import parse_short_form
    assert parse_short_form(cfg.short_form()) == cfg


@pytest.mark.parametrize("causal", [False, True])
def test_q_splits_fori(causal):
    """FORI gained the q_splits overlap lever in round 4 (VERDICT r3 #1b)."""
    cfg = KernelConfig(block_q=256, block_kv=128, q_splits=2, causal=causal,
                       kv_loop=KVLoop.FORI)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=causal)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"fori q_splits causal={causal}: {kerr:.3e} vs {berr:.3e}"


def test_q_splits_fori_window():
    """FORI q_splits under a sliding window (mask-elision loop bounds)."""
    cfg = KernelConfig(block_q=128, block_kv=128, q_splits=2, causal=True,
                       window=200, optimized_softmax=False,
                       kv_loop=KVLoop.FORI)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=True, window=200)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"fori q_splits window: {kerr:.3e} vs {berr:.3e}"


def test_fori_lse_matches_grid():
    """FORI now emits the LSE residual; it must match GRID's exactly-ish."""
    from flash_attention_from_scratch_tpu.ops.flash_forward import (
        flash_forward_with_lse,
    )

    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    fori = KernelConfig(block_q=128, block_kv=128, causal=True,
                        kv_loop=KVLoop.FORI, q_splits=2)
    grid = KernelConfig(block_q=128, block_kv=128, causal=True)
    out_f, lse_f = flash_forward_with_lse(q, k, v, fori)
    out_g, lse_g = flash_forward_with_lse(q, k, v, grid)
    assert float(jnp.max(jnp.abs(lse_f - lse_g))) < 1e-3
    assert float(jnp.max(jnp.abs(out_f.astype(jnp.float32)
                                 - out_g.astype(jnp.float32)))) < 1e-2


# -- whole-head packing (head_pack) ------------------------------------------


@pytest.mark.parametrize("causal", [False, True])
def test_head_pack(causal):
    """Multiple heads per grid program: independent chains, same numerics."""
    cfg = KernelConfig(block_q=128, block_kv=128, head_pack=2, causal=causal)
    q, k, v = generate_qkv(256, n_heads=4, batch=2, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=causal)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"head_pack causal={causal}: {kerr:.3e} vs {berr:.3e}"


def test_head_pack_with_q_splits_lse():
    """head_pack x q_splits, and the LSE residual stays pack-invariant."""
    from flash_attention_from_scratch_tpu.ops.flash_forward import (
        flash_forward_with_lse,
    )

    q, k, v = generate_qkv(512, n_heads=4, batch=1, dtype=jnp.bfloat16)
    packed = KernelConfig(block_q=128, block_kv=256, head_pack=4, q_splits=2)
    plain = KernelConfig(block_q=128, block_kv=256)
    out_p, lse_p = flash_forward_with_lse(q, k, v, packed)
    out_0, lse_0 = flash_forward_with_lse(q, k, v, plain)
    assert float(jnp.max(jnp.abs(lse_p - lse_0))) < 1e-3
    assert float(jnp.max(jnp.abs(out_p.astype(jnp.float32)
                                 - out_0.astype(jnp.float32)))) < 1e-2


def test_head_pack_validation():
    cfg = KernelConfig(block_q=128, block_kv=128, head_pack=2)
    from flash_attention_from_scratch_tpu.ops.configs import parse_short_form
    assert "hp2" in cfg.short_form()
    assert parse_short_form(cfg.short_form()) == cfg


def test_head_pack_degrades_to_fit_shape():
    """An unfittable pack degrades instead of raising: under tensor-parallel
    shard_map the per-device head count shrinks, and a model-level config
    must keep working (and stay correct) on every shard."""
    cfg = KernelConfig(block_q=128, block_kv=128, head_pack=2)
    # heads=3: hp2 does not divide -> runs unpacked.
    q, k, v = generate_qkv(256, n_heads=3, batch=1, dtype=jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"degraded pack (heads=3): {kerr:.3e} vs {berr:.3e}"
    # heads=12, kv=4 (group=3): hp2 incompatible with the group -> unpacked.
    q12, _, _ = generate_qkv(256, n_heads=12, batch=1, dtype=jnp.bfloat16)
    _, k4, v4 = generate_qkv(256, n_heads=4, batch=1, dtype=jnp.bfloat16,
                             seed=1)
    out = flash_forward(q12, k4, v4, cfg)
    ref_native, ref_fp32 = reference_pair(q12, k4, v4)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"degraded pack (group=3): {kerr:.3e} vs {berr:.3e}"


@pytest.mark.parametrize("hp", [2, 4])
@pytest.mark.parametrize("causal,window", [(False, 0), (True, 0), (True, 200)])
def test_head_pack_gqa_fori(hp, causal, window):
    """FORI packing: one shared KV DMA stream serves the packed group."""
    cfg = KernelConfig(block_q=128, block_kv=128, head_pack=hp,
                       causal=causal, window=window, kv_loop=KVLoop.FORI,
                       optimized_softmax=not window, num_kv_buffers=2)
    q, _, _ = generate_qkv(512, n_heads=8, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16,
                           seed=1)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=causal,
                                          window=window)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, (f"fori gqa hp{hp} causal={causal} window={window}: "
                f"{kerr:.3e} vs {berr:.3e}")


@pytest.mark.parametrize("heads,kv_heads,hp", [(8, 2, 2), (8, 2, 4),
                                               (8, 2, 8), (8, 4, 4)])
@pytest.mark.parametrize("causal", [False, True])
def test_head_pack_gqa(heads, kv_heads, hp, causal):
    """GQA group packing: packed Q heads share their group's KV tile."""
    cfg = KernelConfig(block_q=128, block_kv=128, head_pack=hp,
                       causal=causal)
    q, _, _ = generate_qkv(256, n_heads=heads, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(256, n_heads=kv_heads, batch=1,
                           dtype=jnp.bfloat16, seed=1)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=causal)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, (f"gqa head_pack h{heads}/kv{kv_heads}/hp{hp} "
                f"causal={causal}: {kerr:.3e} vs {berr:.3e}")


@pytest.mark.parametrize("kv_loop", [KVLoop.GRID, KVLoop.FORI])
@pytest.mark.parametrize("scale_q", [True, False])
def test_attn_softcap(kv_loop, scale_q):
    """Gemma-2 logit softcap, composed with exp2 + scale-into-Q."""
    cfg = KernelConfig(block_q=128, block_kv=128, causal=True,
                       attn_softcap=50.0, scale_q=scale_q,
                       kv_loop=kv_loop)
    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    # Make scores big enough that the cap actually bends them.
    q = (q.astype(jnp.float32) * 8).astype(jnp.bfloat16)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=True,
                                          q_offset=0, softcap=50.0)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"softcap {kv_loop} sq={scale_q}: {kerr:.3e} vs {berr:.3e}"
    # And it must differ from the uncapped kernel (the cap bites).
    out_nocap = flash_forward(q, k, v, KernelConfig(
        block_q=128, block_kv=128, causal=True, scale_q=scale_q,
        kv_loop=kv_loop))
    diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                 - out_nocap.astype(jnp.float32))))
    assert diff > 1e-3, diff


# -- block-triangular causal decomposition (cfg.decompose) --------------------


def test_decompose_matches_monolithic():
    """Rectangles + merged leaves == the monolithic causal kernel, and the
    merged LSE equals the full-problem LSE (the backward relies on it)."""
    import dataclasses

    from flash_attention_from_scratch_tpu.ops.flash_forward import (
        flash_forward_with_lse,
    )

    q, _, _ = generate_qkv(1024, n_heads=4, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(1024, n_heads=2, batch=1, dtype=jnp.bfloat16,
                           seed=1)
    mono = KernelConfig(block_q=128, block_kv=256, causal=True)
    deco = dataclasses.replace(mono, decompose=True)
    o_m, l_m = flash_forward_with_lse(q, k, v, mono)
    o_d, l_d = flash_forward_with_lse(q, k, v, deco)
    assert float(jnp.max(jnp.abs(l_d - l_m))) < 1e-3
    assert float(jnp.max(jnp.abs(o_d.astype(jnp.float32)
                                 - o_m.astype(jnp.float32)))) < 1e-2


def test_decompose_with_sinks():
    """The sink folds in once, at the very top of the decomposition."""
    import dataclasses

    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    z = jnp.linspace(-0.5, 1.0, 2, dtype=jnp.float32)
    deco = KernelConfig(block_q=128, block_kv=128, causal=True,
                        decompose=True)
    out = flash_forward(q, k, v, deco, sinks=z)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=True, sinks=z)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"decompose+sinks: {kerr:.3e} vs {berr:.3e}"


def test_decompose_grad():
    """Training through the decomposed forward: the standard FA2 backward
    consumes the merged LSE unchanged."""
    import jax

    from flash_attention_from_scratch_tpu.ops.autodiff import flash_attention
    from flash_attention_from_scratch_tpu.ops.reference import (
        reference_attention,
    )

    q, k, v = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16)
    do = generate_qkv(512, n_heads=2, batch=1, dtype=jnp.bfloat16, seed=2)[0]
    cfg = KernelConfig(block_q=128, block_kv=128, causal=True, decompose=True)

    grads = jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v, cfg)
                                             * do), argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(lambda q, k, v: jnp.sum(
        reference_attention(q, k, v, causal=True) * do),
        argnums=(0, 1, 2))(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32))
    for name, a, b in zip("qkv", grads, ref):
        rel = float(jnp.abs(a.astype(jnp.float32) - b).max()
                    / (jnp.abs(b).max() + 1e-9))
        assert rel < 5e-2, f"d{name}: {rel}"


def test_decompose_validation():
    with pytest.raises(ValueError):
        KernelConfig(decompose=True)  # needs causal
    # Round 5: windows/offsets/softcaps COMPOSE with decompose (the band's
    # visible KV range is a clipped prefix — VERDICT r4 #6).
    KernelConfig(causal=True, decompose=True, window=128,
                 optimized_softmax=False)
    cfg = KernelConfig(causal=True, decompose=True)
    from flash_attention_from_scratch_tpu.ops.configs import parse_short_form
    assert parse_short_form(cfg.short_form()) == cfg


@pytest.mark.parametrize("window", [300, 512])
def test_decompose_window_matches_monolithic(window):
    """A sliding window clips each band's KV slice from below; the banded
    result must equal the monolithic windowed kernel exactly-ish."""
    import dataclasses

    from flash_attention_from_scratch_tpu.ops.flash_forward import (
        flash_forward_with_lse,
    )

    q, _, _ = generate_qkv(1024, n_heads=4, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(1024, n_heads=2, batch=1, dtype=jnp.bfloat16,
                           seed=1)
    mono = KernelConfig(block_q=128, block_kv=128, causal=True, window=window,
                        optimized_softmax=False)
    deco = dataclasses.replace(mono, decompose=True)
    o_m, l_m = flash_forward_with_lse(q, k, v, mono)
    o_d, l_d = flash_forward_with_lse(q, k, v, deco)
    assert float(jnp.max(jnp.abs(l_d - l_m))) < 1e-3
    assert float(jnp.max(jnp.abs(o_d.astype(jnp.float32)
                                 - o_m.astype(jnp.float32)))) < 1e-2


def test_decompose_window_oracle():
    """Banded windowed attention against the jnp double oracle."""
    q, k, v = generate_qkv(1024, n_heads=2, batch=1, dtype=jnp.bfloat16)
    cfg = KernelConfig(block_q=128, block_kv=128, causal=True, window=384,
                       optimized_softmax=False, decompose=True)
    out = flash_forward(q, k, v, cfg)
    ref_native, ref_fp32 = reference_pair(q, k, v, causal=True, window=384)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, f"decompose+window: {kerr:.3e} vs {berr:.3e}"


def test_decompose_chunked_prefill():
    """Offset-causal chunks band too: q_offset shifts every band's
    diagonal (round 5 — chunked prefill on the banded path)."""
    import dataclasses

    from flash_attention_from_scratch_tpu.ops.flash_forward import (
        flash_forward_with_lse,
    )

    seq_kv, q_offset = 1024, 512
    qf, _, _ = generate_qkv(seq_kv, n_heads=2, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(seq_kv, n_heads=2, batch=1, dtype=jnp.bfloat16,
                           seed=1)
    q = qf[:, :, q_offset:]
    mono = KernelConfig(block_q=128, block_kv=128, causal=True,
                        q_offset=q_offset)
    deco = dataclasses.replace(mono, decompose=True)
    o_m, l_m = flash_forward_with_lse(q, k, v, mono)
    o_d, l_d = flash_forward_with_lse(q, k, v, deco)
    assert float(jnp.max(jnp.abs(l_d - l_m))) < 1e-3
    assert float(jnp.max(jnp.abs(o_d.astype(jnp.float32)
                                 - o_m.astype(jnp.float32)))) < 1e-2


def test_decompose_window_offset_softcap():
    """The full Gemma/Mistral chunked combination on the banded path."""
    import dataclasses

    from flash_attention_from_scratch_tpu.ops.flash_forward import (
        flash_forward_with_lse,
    )

    seq_kv, q_offset = 1024, 256
    qf, _, _ = generate_qkv(seq_kv, n_heads=2, batch=1, dtype=jnp.bfloat16)
    _, k, v = generate_qkv(seq_kv, n_heads=2, batch=1, dtype=jnp.bfloat16,
                           seed=1)
    q = qf[:, :, q_offset:]
    mono = KernelConfig(block_q=128, block_kv=128, causal=True, window=300,
                        q_offset=q_offset, attn_softcap=30.0,
                        optimized_softmax=False)
    deco = dataclasses.replace(mono, decompose=True)
    o_m, l_m = flash_forward_with_lse(q, k, v, mono)
    o_d, l_d = flash_forward_with_lse(q, k, v, deco)
    assert float(jnp.max(jnp.abs(l_d - l_m))) < 1e-3
    assert float(jnp.max(jnp.abs(o_d.astype(jnp.float32)
                                 - o_m.astype(jnp.float32)))) < 1e-2
