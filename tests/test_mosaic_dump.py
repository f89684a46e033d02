"""IR introspection tools: op histograms, delta tables, def-use slicing.

These are pure text tools (the TPU analogue of the reference's SASS
opcode-count and PTX dependency-slice scripts, SURVEY.md §2.3), so they are
tested on synthetic MLIR rather than live kernel dumps.
"""

from flash_attention_from_scratch_tpu.tools.mosaic_dump import (
    diff_histograms,
    op_histogram,
    slice_ir,
)

MODULE = """\
module @kernel {
  func.func @main(%arg0: vector<8x128xf32>, %arg1: vector<8x128xf32>) {
    %0 = arith.constant dense<1.0> : vector<8x128xf32>
    %1 = arith.addf %arg0, %0 : vector<8x128xf32>
    %2 = arith.mulf %1, %arg1 : vector<8x128xf32>
    %3 = math.exp %2 : vector<8x128xf32>
    %4 = arith.subf %1, %0 : vector<8x128xf32>
    %5:2 = tpu.something %3 : vector<8x128xf32>
    %6 = arith.addf %5#1, %4 : vector<8x128xf32>
    vector.store %6, %arg1 : vector<8x128xf32>
    func.return
  }
}
"""


def test_op_histogram_counts_dialect_ops():
    hist = op_histogram(MODULE)
    assert hist["arith.addf"] == 2
    assert hist["arith.mulf"] == 1
    assert hist["math.exp"] == 1
    assert hist["vector.store"] == 1


def test_diff_histograms_delta_table():
    before = op_histogram(MODULE)
    after = before.copy()
    after["arith.addf"] += 3
    table = diff_histograms(before, after)
    assert "| arith.addf | 2 | 5 | +3 |" in table
    assert "**total**" in table


def test_backward_slice_collects_producers():
    out = slice_ir(MODULE, "%3")
    # %3 <- math.exp(%2) <- mulf(%1, %arg1) <- addf(%arg0, %0) <- constant.
    for op in ("math.exp", "arith.mulf", "arith.addf", "arith.constant"):
        assert op in out, out
    # %4 and %6 are not producers of %3.
    assert "arith.subf" not in out
    assert "%6" not in out
    assert "%arg0" in out  # reported as a loose end


def test_backward_slice_through_multi_result():
    # %6 uses %5#1 (projection of multi-result %5), which uses %3.
    out = slice_ir(MODULE, "%6")
    assert "tpu.something" in out
    assert "math.exp" in out
    assert "arith.subf" in out  # via the %4 operand


def test_forward_slice_collects_consumers():
    out = slice_ir(MODULE, "%1", forward=True)
    # %1 feeds %2 (mulf) -> %3 (exp) -> %5 -> %6 -> store; and %4 (subf).
    for op in ("arith.mulf", "math.exp", "tpu.something", "arith.subf",
               "vector.store"):
        assert op in out, out
    assert "arith.constant" not in out


def test_slice_depth_limit():
    out = slice_ir(MODULE, "%3", max_depth=1)
    assert "math.exp" in out and "arith.mulf" in out
    assert "arith.constant" not in out


def test_slice_missing_value():
    assert "not found" in slice_ir(MODULE, "%nope")
