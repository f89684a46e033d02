"""Mosaic op-count regression gate over the committed kernel_ir dumps.

The automated analogue of the reference's ptxas register-pressure CSVs
(``tools/build/parse_ptx_build.py:31-141``) and SASS opcode-count diffs
(``tools/analysis/compare_sass_instruction_counts.py``): if a code change
makes Mosaic emit meaningfully more ops for a committed kernel (a stray
relayout, a softmax pass that stopped fusing), this fails with the delta
table. Needs the TPU lowering path, so it runs in the onchip lane.
"""

import os

import pytest

from flash_attention_from_scratch_tpu.tools.mosaic_dump import check_regression

IR_DIR = os.path.join(os.path.dirname(__file__), "..", "kernel_ir")


@pytest.mark.onchip
def test_mosaic_op_counts_within_budget():
    failures = check_regression(IR_DIR, log=lambda *a: None)
    assert not failures, "\n".join(failures)
