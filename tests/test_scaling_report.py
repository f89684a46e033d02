"""Tensor-parallel decode scaling report (virtual mesh)."""

import jax
import pytest

from flash_attention_from_scratch_tpu.models.llama import LlamaConfig
from flash_attention_from_scratch_tpu.tools.scaling_report import (
    tp_decode_report)

CFG = LlamaConfig(vocab_size=512, dim=256, n_layers=2, n_heads=4,
                  n_kv_heads=2, d_head=128, hidden_dim=512,
                  block_q=128, block_kv=128)


@pytest.mark.skipif(len(jax.devices("cpu")) < 2, reason="needs 2 devices")
def test_tp2_halves_device_bytes():
    rows = tp_decode_report(CFG, (1, 2), batch=4, context=128,
                            weights="int8", kv="int8",
                            single_chip_ms=10.0, hbm_gbps_val=819.0)
    r1, r2 = rows
    assert r1["executed"] and r2["executed"]
    # Exact per-device byte measurement: tp=2 must shard the weight stream
    # ~in half (norms/scales replicate, hence the small remainder).
    assert 0.45 < r2["byte_ratio_vs_tp1"] < 0.56, r2
    # GSPMD must have actually inserted cross-device collectives.
    assert r2["collectives"]["all-reduce"] > 0, r2["collectives"]
    assert sum(r1["collectives"].values()) == 0, r1["collectives"]
    # The projection anchored on a measured tp=1 step must show scaling.
    assert r2["projected_scaling_vs_tp1"] > 1.3, r2
