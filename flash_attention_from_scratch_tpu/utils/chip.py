"""Chip identification and speed-of-light constants.

Analogue of the reference's device-attribute queries (``cuda_utils.cuh:5-46``)
and its clock-locked FA2 baseline role (``pt_bench.py:111-134``): on TPU the
baseline every kernel is judged against is the chip's bf16 MXU peak, plus a
*measured* matmul ceiling (big bf16 matmul) for an honest attainable bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["chip_sol_tflops", "chip_int8_tops", "device_kind",
           "measured_matmul_tflops", "hbm_gbps"]

# Nominal (bf16 MXU peak TFLOP/s, int8 MXU peak TOP/s, HBM GB/s) by device
# kind. int8 runs the systolic array at 2x the bf16 rate on v5e+ (measured
# on this v5e: 255 TOP/s sustained on an 8192^3 int8 dot vs the 187 bf16
# ceiling); v4 has no int8 fast path.
_CHIP_TABLE = {
    "v5 lite": (197.0, 394.0, 819.0),   # v5e
    "v5e": (197.0, 394.0, 819.0),
    "v5p": (459.0, 918.0, 2765.0),
    "v4": (275.0, 275.0, 1228.0),
    "v6 lite": (918.0, 1836.0, 1640.0),  # v6e / Trillium
    "v6e": (918.0, 1836.0, 1640.0),
}


def device_kind() -> str:
    return jax.devices()[0].device_kind


_warned_unknown = False


def _lookup():
    kind = device_kind().lower()
    for key, val in _CHIP_TABLE.items():
        if key in kind:
            return val
    global _warned_unknown
    if not _warned_unknown:
        import warnings

        warnings.warn(
            f"unknown device kind {kind!r}: using v5e speed-of-light "
            f"constants — %-of-SoL numbers will be wrong for other chips",
            stacklevel=3)
        _warned_unknown = True
    return (197.0, 394.0, 819.0)


def chip_sol_tflops() -> float:
    return _lookup()[0]


def chip_int8_tops() -> float:
    """Nominal int8 MXU peak (TOP/s)."""
    return _lookup()[1]


def hbm_gbps() -> float:
    return _lookup()[2]


@functools.lru_cache(maxsize=1)
def measured_matmul_tflops(n: int = 4096, iters: int = 10) -> float:
    """Measured bf16 matmul throughput — the attainable MXU ceiling.

    The TPU analogue of benchmarking official FA2 as the reference bar: a
    plain n^3 matmul is the best the chip actually sustains, which is what
    an attention kernel should be compared against (nominal SoL includes
    margins no real kernel reaches). n = 4096 is the measured-best shape on
    v5e (scan-timed: 4096^3 193.6, 8192^3 176.0, 16384^3 185.0 TFLOP/s —
    bigger operands lose to VMEM buffering, not HBM bandwidth).
    """
    from ..dispatch import chain_runtime

    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32).astype(jnp.bfloat16)
    # In-jit unrolled chain, same timer as every kernel measurement (host-fenced
    # timing over-reports through the tunnel; the ceiling and the kernels
    # must be measured the same way or %-of-ceiling is meaningless). The
    # 2^-4 rescale keeps the chained values finite at ~n^2 extra FLOPs.
    secs = chain_runtime(lambda x, y: (x @ y) * jnp.bfloat16(2.0 ** -4),
                        a, b, iters=iters, est_secs=2 * n**3 / 180e12)
    return 2 * n**3 / secs / 1e12
