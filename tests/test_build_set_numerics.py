"""Compiled numerics over the FULL build set, on real hardware.

The reference numerics-tests every one of its 84 built kernels
(``py/flash_helpers/test/test.py:73-99``); this is the same guarantee for
the TPU build set: every config the autotuner can crown has a compiled
(non-interpret) pass against the double oracle with the adaptive 2x rule.

Runs only with a TPU attached (``JAX_PLATFORMS=tpu,cpu pytest -m onchip``):
interpret-mode coverage of the kernel *features* lives in
``test_flash_forward.py``; this lane exists to catch Mosaic-compilation and
layout bugs that interpret mode cannot see, across the whole config space.
"""

import pytest

from flash_attention_from_scratch_tpu.ops.configs import (
    DType,
    get_kernels_to_build,
)
from flash_attention_from_scratch_tpu.ops.flash_forward import flash_forward
from flash_attention_from_scratch_tpu.ops.reference import reference_pair
from flash_attention_from_scratch_tpu.utils.testing import (
    adaptive_tolerance_check,
    generate_qkv,
)

BUILD_SET = get_kernels_to_build((DType.BF16,))


@pytest.mark.onchip
@pytest.mark.parametrize("cfg", BUILD_SET, ids=[c.short_form() for c in BUILD_SET])
def test_build_set_compiled_numerics(cfg):
    # Smallest shape that exercises >= 2 Q blocks and >= 1 full KV block of
    # the online-softmax recurrence (reference fixture: seq 2048, test.py:19).
    seq = max(1024, 2 * cfg.block_q, cfg.block_kv)
    q, k, v = generate_qkv(seq, d_head=cfg.d_head, n_heads=2, batch=1,
                           dtype=cfg.dtype.jnp_dtype)
    out = flash_forward(q, k, v, cfg, interpret=False)
    ref_native, ref_fp32 = reference_pair(q, k, v)
    ok, kerr, berr = adaptive_tolerance_check(out, ref_native, ref_fp32)
    assert ok, (
        f"{cfg.short_form()}: kernel max err {kerr:.3e} > 2x baseline {berr:.3e}"
    )
