"""Config system tests: short-form round trip, pruning, FLOP model."""

import pytest

from flash_attention_from_scratch_tpu.ops.configs import (
    DType,
    KernelConfig,
    KVLoop,
    calc_self_attn_flop,
    calc_total_flop,
    get_autotuning_kernel_configs,
    get_kernel_progression_configs,
    get_kernels_to_build,
    parse_short_form,
    should_autotune_config,
)


def test_short_form_round_trip():
    for cfg in get_kernels_to_build():
        assert parse_short_form(cfg.short_form()) == cfg


def test_short_form_round_trip_exotic():
    cfg = KernelConfig(
        block_q=128, block_kv=256, dtype=DType.FP16, use_exp2=False,
        optimized_softmax=False, cast_p_to_dtype=False, reverse_kv=True,
        kv_loop=KVLoop.FORI, num_kv_buffers=3,
    )
    assert parse_short_form(cfg.short_form()) == cfg


def test_parse_embedded_in_tool_output():
    cfg = KernelConfig()
    line = f"| {cfg.short_form()} | 123.4 TFLOPs | 98.2% |"
    assert parse_short_form(line) == cfg


def test_invalid_configs_rejected():
    with pytest.raises(ValueError):
        KernelConfig(block_q=100)
    with pytest.raises(ValueError):
        KernelConfig(block_kv=64)
    with pytest.raises(ValueError):
        KernelConfig(d_head=96)
    with pytest.raises(ValueError):
        KernelConfig(num_kv_buffers=0)
    with pytest.raises(ValueError):
        KernelConfig(causal=True, reverse_kv=True)


def test_autotune_space_nonempty_and_pruned():
    cfgs = get_autotuning_kernel_configs()
    assert len(cfgs) > 10
    assert all(should_autotune_config(c) for c in cfgs)
    assert all(c.fits_vmem() for c in cfgs)


def test_progression_ladder_shape():
    ladder = get_kernel_progression_configs()
    names = [n for n, _ in ladder]
    assert names[0] == "1_base"
    assert len(ladder) == 12
    assert names[-1] == "12_head_pack" and ladder[-1][1].head_pack > 1
    assert ladder[-2][1].scale_q
    # The base rung must be the synchronous fori variant.
    assert ladder[0][1].kv_loop == KVLoop.FORI
    assert ladder[0][1].num_kv_buffers == 1
    # The final rungs must be grid-pipelined with all softmax optimizations.
    final = ladder[-1][1]
    assert final.kv_loop == KVLoop.GRID
    assert final.use_exp2 and final.optimized_softmax and final.cast_p_to_dtype


def test_flop_model_matches_reference_formula():
    # 4*s^2*d + 6*s^2 per head per sample (kernel_configs.py:102-103).
    assert calc_self_attn_flop(512, 128, 1, 1) == 4 * 512**2 * 128 + 6 * 512**2
    assert calc_self_attn_flop(512, 128, 16, 2) == 32 * (4 * 512**2 * 128 + 6 * 512**2)


def test_total_flop_exceeds_algorithmic_flop():
    cfg = KernelConfig()
    # Implementation FLOPs include softmax overhead, so must be larger than
    # the pure 4*s^2*d matmul count.
    s = 4096
    assert calc_total_flop(cfg, s, 16, 1) > 16 * 4 * s * s * cfg.d_head


def test_vmem_estimate_scales_with_blocks():
    small = KernelConfig(block_q=128, block_kv=128)
    big = KernelConfig(block_q=512, block_kv=1024)
    assert small.vmem_bytes() < big.vmem_bytes()
