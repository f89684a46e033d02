"""Weight-only quantized matmul: INT8 / packed-INT4 weights, bf16 activations.

Extension beyond the reference (BASELINE north star "INT4 weight-only
matmuls"): decode-time dense layers are HBM-bound on *weights*, so halving /
quartering the weight stream is a direct speedup — and it is what lets
Llama-3-8B fit a single 16 GB v5e chip at all. Dequantization never touches
HBM:

- Weights are stored per-output-channel symmetric: ``values (K, N)`` int8
  (or ``(K//2, N)`` for INT4, half-split along K: byte (k, n) packs
  W[k, n] in the low nibble and W[k + K/2, n] in the high nibble), plus
  ``scales (N,)`` fp32.
- The kernel streams weight tiles HBM->VMEM through the Pallas pipeline,
  upconverts on the VPU, matmuls on the MXU with fp32 accumulation, and
  folds the per-channel scale into the output tile once at the last K step.
- INT4's half-split layout means the kernel feeds two *contiguous* x tiles
  (rows k and k + K/2) to two matmuls — no stride-2 relayout, the same
  trick as the KV int4 packing (``quant.py``).
"""

from __future__ import annotations

import contextlib
import contextvars

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import unpack_int4_halves

__all__ = ["QuantizedWeight", "quantize_weight", "quant_matmul",
           "xla_fallback_mode", "spmd_partition_mode", "spmd_safe",
           "quantize_activations", "concat_weights"]

_QMAX = {"int8": 127.0, "int4": 7.0}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedWeight:
    """values (K, N) int8 (int4: (K//2, N) packed) + per-column scales (N,).

    ``act`` records the matmul recipe: "bf16" = weight-only (dequantize to
    the activation dtype on the VPU), "int8" = also quantize activations
    per-row and use int8 x int8 MXU dots (W8A8/W4A8).
    """

    values: jax.Array
    scales: jax.Array
    mode: str
    orig_dtype: object = jnp.bfloat16
    act: str = "bf16"

    def tree_flatten(self):
        return ((self.values, self.scales),
                (self.mode, self.orig_dtype, self.act))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def k_dim(self) -> int:
        return self.values.shape[0] * (2 if self.mode == "int4" else 1)

    @property
    def shape(self):
        return (self.k_dim, self.values.shape[1])

    def dequantize(self):
        if self.mode == "int4":
            lo, hi = unpack_int4_halves(self.values, jnp.float32)
            w = jnp.concatenate([lo, hi], axis=0)
        else:
            w = self.values.astype(jnp.float32)
        return (w * self.scales[None, :]).astype(self.orig_dtype)


@functools.partial(jax.jit, static_argnames=("mode", "act"))
def quantize_weight(w, mode: str = "int8", act: str = "bf16") -> QuantizedWeight:
    """Symmetric per-output-channel quantization of a (K, N) weight."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / _QMAX[mode], 1e-12)
    q = jnp.round(wf / scale[None, :])
    if mode == "int8":
        vals = jnp.clip(q, -127, 127).astype(jnp.int8)
    elif mode == "int4":
        q = jnp.clip(q, -7, 7).astype(jnp.int8)
        k = q.shape[0]
        lo = q[: k // 2] & 0x0F
        hi = q[k // 2:] & 0x0F
        vals = (lo | (hi << 4)).astype(jnp.int8)
    else:
        raise ValueError(f"unknown weight quant mode {mode!r}")
    return QuantizedWeight(vals, scale, mode, w.dtype, act)


def concat_weights(ws) -> QuantizedWeight:
    """Concatenate quantized weights along N (output channels).

    Per-output-channel scales make this exact: the fused weight computes
    bit-identical results to the separate matmuls. Used to fuse QKV and
    gate|up projections into single weight streams — fewer, larger kernels
    keep the HBM weight stream saturated at decode.
    """
    modes = {w.mode for w in ws}
    ks = {w.k_dim for w in ws}
    if len(modes) != 1 or len(ks) != 1:
        raise ValueError(f"cannot concat: modes={modes} k_dims={ks}")
    return QuantizedWeight(
        jnp.concatenate([w.values for w in ws], axis=1),
        jnp.concatenate([w.scales for w in ws], axis=0),
        ws[0].mode, ws[0].orig_dtype, ws[0].act)


def _stored_int8_columns(wq: QuantizedWeight):
    """The (K, N) int8 value matrix (int4 halves unpacked, un-scaled)."""
    if wq.mode == "int4":
        lo, hi = unpack_int4_halves(wq.values, jnp.int8)
        return jnp.concatenate([lo, hi], axis=0)
    return wq.values


def _precision(compute_dtype):
    """fp32 activations need HIGHEST or the MXU rounds them to bf16."""
    return (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else None)


def _qmm_kernel_int4(num_k: int, compute_dtype,
                     x_lo_ref, x_hi_ref, w_ref, s_ref, o_ref, acc_ref):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    lo, hi = unpack_int4_halves(w_ref[...], compute_dtype)
    acc_ref[...] += jax.lax.dot_general(
        x_lo_ref[...], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(compute_dtype),
    ) + jax.lax.dot_general(
        x_hi_ref[...], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(compute_dtype),
    )

    @pl.when(ki == num_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _qmm_kernel_int8(num_k: int, compute_dtype,
                     x_ref, w_ref, s_ref, o_ref, acc_ref):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...].astype(compute_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(compute_dtype),
    )

    @pl.when(ki == num_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _qmm_kernel_int8_a8(num_k: int, x_ref, xs_ref, w_ref, s_ref, o_ref,
                        acc_ref):
    """W8A8: int8 x int8 MXU dot with exact int32 accumulation.

    The weight tile goes straight from DMA to the MXU — zero per-value
    VPU converts, unlike the weight-only path whose int8->bf16 upconvert
    is the throughput ceiling (measured: the bf16-activation int8 kernel
    streams at ~620 GB/s conversion-bound; int4 runs at int8's speed for
    half the bytes). Scales fold in once per output tile: per-row
    activation scale x per-column weight scale.
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(ki == num_k - 1)
    def _():
        o_ref[...] = (acc_ref[...].astype(jnp.float32)
                      * xs_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _qmm_kernel_int4_a8(num_k: int, x_lo_ref, x_hi_ref, rs_ref, xs_ref, w_ref,
                        s_ref, o_ref, acc_ref):
    """W4A8: bitwise-only nibble handling, two int8 MXU dots, exact int32.

    Mosaic legalizes int8 AND/XOR but not int8 shifts or subtraction, and
    the i32-shift unpack pays an 8-bit->32-bit relayout on every weight
    byte. Both nibbles instead reach the MXU as plain int8 bitmasks:

      ``hi16 = p & 0xF0``  equals ``16 * hi`` exactly (two's complement),
      so ``dot(x_hi, hi16) >> 4`` is the hi product (each term is a
      multiple of 16, the shift is exact);
      ``lo_b = (p & 15) ^ 8`` equals ``lo + 8``, so the lo product carries
      a ``+8 * rowsum(x_lo)`` bias, removed once at the end from the
      precomputed full-row sums ``rs_ref``.

    Zero per-weight-byte type conversions: the VPU cost drops from two
    int8->int32 unpack/shift pipelines to three lane-width int8 bit ops.
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = w_ref[...]
    lo_b = (p & 15) ^ 8
    hi16 = p & jnp.int8(-16)
    acc_ref[...] += jax.lax.dot_general(
        x_lo_ref[...], lo_b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) + (jax.lax.dot_general(
        x_hi_ref[...], hi16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) >> 4)

    @pl.when(ki == num_k - 1)
    def _():
        o_ref[...] = ((acc_ref[...] - 8 * rs_ref[...]).astype(jnp.float32)
                      * xs_ref[...] * s_ref[...]).astype(o_ref.dtype)


def _qmm_kernel_int8_nlast(num_k: int, bn: int, compute_dtype,
                           x_ref, w_ref, s_ref, o_ref, acc_ref):
    """K-outer / N-inner walk: weight reads sweep one contiguous K-stripe.

    Grid is (m, k, n) with n fastest, so for a fixed K block the w tiles
    cover rows [ki*bk, ki*bk+bk) x ALL of N in HBM-sequential order — the
    whole weight is read as num_k contiguous stripes instead of num_n
    strided column walks. The accumulator persists the full (bm, N) output
    row in VMEM across the K sweep (decode m is tiny, so it fits easily).
    """
    ki = pl.program_id(1)
    j = pl.program_id(2)

    cols = pl.ds(j * bn, bn)

    @pl.when(ki == 0)
    def _():
        acc_ref[:, cols] = jnp.zeros((acc_ref.shape[0], bn), jnp.float32)

    acc_ref[:, cols] += jax.lax.dot_general(
        x_ref[...], w_ref[...].astype(compute_dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(compute_dtype),
    )

    @pl.when(ki == num_k - 1)
    def _():
        o_ref[...] = (acc_ref[:, cols] * s_ref[...]).astype(o_ref.dtype)


@functools.lru_cache(maxsize=256)
def _build_qmm_a8(m: int, k: int, n: int, mode: str, compute_dtype_name: str,
                  bm: int, bk: int, bn: int, interpret: bool):
    """Activation-quantized (int8 x int8 MXU) variant of ``_build_qmm``."""
    compute_dtype = jnp.dtype(compute_dtype_name)
    k_eff = k // 2 if mode == "int4" else k
    num_k = k_eff // bk

    def x_lo_idx(i, j, ki):
        return (i, ki)

    if mode == "int4":
        kernel = functools.partial(_qmm_kernel_int4_a8, num_k)

        def x_hi_idx(i, j, ki):
            return (i, ki + num_k)

        # x_lo half, x_hi half, and the full-row x_lo sums for the +8 bias.
        x_specs = [pl.BlockSpec((bm, bk), x_lo_idx, memory_space=pltpu.VMEM),
                   pl.BlockSpec((bm, bk), x_hi_idx, memory_space=pltpu.VMEM),
                   pl.BlockSpec((bm, 1), lambda i, j, ki: (i, 0),
                                memory_space=pltpu.VMEM)]
    else:
        kernel = functools.partial(_qmm_kernel_int8_a8, num_k)
        x_specs = [pl.BlockSpec((bm, bk), x_lo_idx, memory_space=pltpu.VMEM)]

    call = pl.pallas_call(
        kernel,
        grid=(m // bm, n // bn, num_k),
        in_specs=x_specs + [
            pl.BlockSpec((bm, 1), lambda i, j, ki: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), compute_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k + k_eff * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    if mode == "int4":
        def int4_call(xq, xs, w, s):
            rs = jnp.sum(xq[:, : k // 2], axis=1, dtype=jnp.int32,
                         keepdims=True)
            return call(xq, xq, rs, xs, w, s)
        return jax.jit(int4_call)
    return jax.jit(lambda xq, xs, w, s: call(xq, xs, w, s))


@functools.lru_cache(maxsize=256)
def _build_qmm(m: int, k: int, n: int, mode: str, compute_dtype_name: str,
               bm: int, bk: int, bn: int, interpret: bool,
               n_inner: bool = False):
    compute_dtype = jnp.dtype(compute_dtype_name)
    k_eff = k // 2 if mode == "int4" else k  # stored K rows
    num_k = k_eff // bk

    if n_inner and mode == "int8":
        # K-outer / N-inner: sequential weight stripes, full-N accumulator.
        kernel = functools.partial(_qmm_kernel_int8_nlast, num_k, bn,
                                   compute_dtype)
        call = pl.pallas_call(
            kernel,
            grid=(m // bm, num_k, n // bn),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, ki, j: (i, ki),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda i, ki, j: (ki, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, ki, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, ki, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), compute_dtype),
            scratch_shapes=[pltpu.VMEM((bm, n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m * k * n,
                bytes_accessed=m * k * 2 + k_eff * n + m * n * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )
        return jax.jit(lambda x, w, s: call(x, w, s))

    def x_lo_idx(i, j, ki):
        return (i, ki)

    # INT4 feeds two x tiles per step — rows [ki*bk, ...) and the same block
    # K/2 later — so x appears twice with different index maps. INT8 takes a
    # single x operand (a duplicated spec would pipeline the same block's
    # HBM->VMEM copy twice).
    if mode == "int4":
        kernel = functools.partial(_qmm_kernel_int4, num_k, compute_dtype)

        def x_hi_idx(i, j, ki):
            return (i, ki + num_k)

        x_specs = [pl.BlockSpec((bm, bk), x_lo_idx, memory_space=pltpu.VMEM),
                   pl.BlockSpec((bm, bk), x_hi_idx, memory_space=pltpu.VMEM)]
    else:
        kernel = functools.partial(_qmm_kernel_int8, num_k, compute_dtype)
        x_specs = [pl.BlockSpec((bm, bk), x_lo_idx, memory_space=pltpu.VMEM)]

    call = pl.pallas_call(
        kernel,
        grid=(m // bm, n // bn, num_k),
        in_specs=x_specs + [
            pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, ki: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), compute_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * 2 + k_eff * n + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    if mode == "int4":
        return jax.jit(lambda x, w, s: call(x, x, w, s))
    return jax.jit(lambda x, w, s: call(x, w, s))


def _fit_block(block: int, dim: int, quantum: int) -> int:
    """Largest tile <= ``block`` that divides ``dim``, multiple of ``quantum``.

    Requiring divisibility by the *default* block silently sent odd output
    widths to the XLA fallback — Llama's 128256-wide lm_head landed there
    every decode step (its int4 dequant fusion alone measured 5.6 ms/step
    on the 8B model; the fitted 768-wide tile keeps it in the kernel).
    Returns 0 when no such tile exists (caller falls back).
    """
    b = min(block, dim)
    b -= b % quantum
    while b >= quantum and dim % b:
        b -= quantum
    return max(b, 0)


def quantize_activations(x, *, qmax: float = 127.0):
    """Per-row symmetric int8 quantization of (..., K) activations.

    Returns ``(x_q int8, scales f32 (..., 1))``. The row absmax sets the
    scale, so the quantization error is <= scale/2 per element (~0.4%
    relative for typical rows).
    """
    xf = x.astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / qmax,
                         1e-12)
    x_q = jnp.clip(jnp.round(xf / scales), -qmax, qmax).astype(jnp.int8)
    return x_q, scales


def _qmm_local(x_ops, values, scales2, *, mode, act_quant, block_m, block_k,
               block_n, n_inner, interpret, out_dtype_name=None):
    """Single-device quant matmul on (possibly shard-local) 2-D operands.

    ``x_ops`` is ``x2`` for the weight-only path or ``(x_q, xs)`` for W8A8 /
    W4A8. Block sizes re-fit to whatever local shapes arrive (a tp shard's
    N or K slice), falling back to exact-math XLA ops when no MXU-aligned
    tile exists.
    """
    if act_quant:
        x_q, xs = x_ops
        m, k = x_q.shape
    else:
        x2 = x_ops
        m, k = x2.shape
    n = values.shape[1]
    k_eff = values.shape[0]
    bm = _fit_block(block_m, m, 8)
    bk = _fit_block(block_k, k_eff, 128)
    bn = _fit_block(block_n, n, 128)
    # The a8 path's x is already int8 and xs is f32: neither carries the
    # MODEL's activation dtype, so it must arrive explicitly or bf16 models
    # would silently widen to f32 outputs under the partitioned path.
    out_dtype = (jnp.dtype(out_dtype_name) if out_dtype_name is not None
                 else x2.dtype)
    if not (bm > 0 and bk > 0 and bn > 0):
        if act_quant:
            if mode == "int4":
                lo, hi = unpack_int4_halves(values, jnp.int8)
                stored = jnp.concatenate([lo, hi], axis=0)
            else:
                stored = values
            acc = jax.lax.dot_general(
                x_q, stored.astype(jnp.int8), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * xs
                    * scales2.astype(jnp.float32)).astype(out_dtype)
        if mode == "int4":
            lo, hi = unpack_int4_halves(values, jnp.float32)
            stored_f = jnp.concatenate([lo, hi], axis=0)
        else:
            stored_f = values.astype(jnp.float32)
        deq = stored_f * scales2.astype(jnp.float32)
        return (x2.astype(jnp.float32) @ deq).astype(out_dtype)
    cdt = str(out_dtype)
    if act_quant:
        fn = _build_qmm_a8(m, k, n, mode, cdt, bm, bk, bn, interpret)
        return fn(x_q, xs, values, scales2)
    fn = _build_qmm(m, k, n, mode, cdt, bm, bk, bn, interpret,
                    n_inner=False)
    return fn(x2, values, scales2)


# GSPMD cannot partition a Mosaic custom call: under a multi-chip mesh the
# weight-stream Pallas kernel would fail to shard (or silently replicate
# the weights), so mesh-aware callers flip this trace-time switch and take
# the XLA fused dequant-matmul path — same math, GSPMD-shardable. The
# single-chip hot path keeps the kernel. (A custom_partitioning rule for
# the kernel is the eventual fix.)
_FORCE_XLA = contextvars.ContextVar("qmm_force_xla", default=False)


@contextlib.contextmanager
def xla_fallback_mode(on: bool = True):
    """Trace-time DEBUG escape hatch: route quant_matmul through plain XLA
    ops. The production mesh story is spmd_partition_mode (the Pallas
    kernel under custom_partitioning); flip this instead when bisecting a
    kernel-vs-XLA numerics or partitioning question."""
    tok = _FORCE_XLA.set(bool(on))
    try:
        yield
    finally:
        _FORCE_XLA.reset(tok)


# Under a mesh the kernel path routes through jax.experimental
# custom_partitioning: each device runs the Pallas weight-stream kernel on
# its OWN weight shard (column-parallel: local N slice, no comms;
# row-parallel: local K slice + psum of partial products). The switch is
# trace-time, flipped by @spmd_safe on the mesh-aware model entry points.
_SPMD_PARTITION = contextvars.ContextVar("qmm_spmd_partition", default=False)

# interpret=None default for quant matmuls reached through a mesh-aware
# entry point (prefill/decode_step/forward with mesh=...): the mesh's
# devices say where the kernel runs, while jax.default_backend() reports
# the process default — wrong on a TPU-attached box driving a virtual-CPU
# mesh. Set by @spmd_safe, read by quant_matmul.
_INTERPRET_OVERRIDE = contextvars.ContextVar("qmm_interpret", default=None)


def _spec_of(info):
    sh = getattr(info, "sharding", None)
    spec = getattr(sh, "spec", None)
    if spec is None:
        return ()
    return tuple(spec)


def _dim_axis(spec, i):
    return spec[i] if i < len(spec) else None


@functools.lru_cache(maxsize=64)
def _make_qmm_partitioned(mode: str, act_quant: bool, block_m: int,
                          block_k: int, block_n: int,
                          interpret: bool | None,
                          out_dtype_name: str = "bfloat16"):
    """custom_partitioning-wrapped quant matmul for one static config.

    ``interpret=None`` is resolved per-mesh inside ``partition`` (the only
    place the actual device mesh is known — the process default backend is
    wrong on a TPU-attached box driving a virtual-CPU mesh).

    Sharding contract (derived from the WEIGHT operand, matching
    parallel.mesh.llama_param_specs):
    - values P(None, tp): column-parallel — x replicated over tp, scales
      P(None, tp); each shard runs the kernel on its N slice; the result is
      N-sharded. Zero collectives.
    - values P(tp, None): row-parallel — x sharded on its K dim, scales
      replicated; shards compute partial products on their K slice and
      psum over tp; the result is replicated.
    - replicated values: plain local call.
    x's leading (batch/m) dim sharding passes through untouched.
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import mesh_interpret

    def kw(interp):
        return dict(mode=mode, act_quant=act_quant, block_m=block_m,
                    block_k=block_k, block_n=block_n, n_inner=False,
                    interpret=interp, out_dtype_name=out_dtype_name)

    def impl_interpret():
        # Unpartitioned lowering of the custom_partitioning op (eager, or
        # spmd_partition_mode without going through @spmd_safe): partition()
        # never runs, so honor the caller's mesh-resolved override before
        # falling back to the process default backend — which is the
        # documented-wrong answer on a TPU-attached box driving a
        # virtual-CPU mesh.
        i = interpret if interpret is not None else _INTERPRET_OVERRIDE.get()
        return mesh_interpret(None, i)

    if act_quant:
        def impl(x_q, xs, values, scales2):
            return _qmm_local((x_q, xs), values, scales2,
                              **kw(impl_interpret()))
        w_idx = 2
    else:
        def impl(x2, values, scales2):
            return _qmm_local(x2, values, scales2,
                              **kw(impl_interpret()))
        w_idx = 1

    fn = custom_partitioning(impl)

    def infer(mesh, arg_infos, result_info):
        wspec = _spec_of(arg_infos[w_idx])
        xspec = _spec_of(arg_infos[0])
        return NamedSharding(
            mesh, P(_dim_axis(xspec, 0), _dim_axis(wspec, 1)))

    def partition(mesh, arg_infos, result_infos):
        wspec = _spec_of(arg_infos[w_idx])
        xspec = _spec_of(arg_infos[0])
        m_axis = _dim_axis(xspec, 0)
        k_axis = _dim_axis(wspec, 0)   # row-parallel when set
        n_axis = _dim_axis(wspec, 1)   # column-parallel when set
        if k_axis is not None and n_axis is not None:
            raise NotImplementedError(
                "quant matmul weights sharded on BOTH dims")
        if k_axis is not None and mode == "int4":
            # Half-split nibble pairing: K-dim shards would separate the
            # lo/hi partners (same reason shard_params rejects it).
            raise NotImplementedError(
                "row-parallel int4 quant matmul cannot shard")

        if act_quant:
            arg_shardings = (
                NamedSharding(mesh, P(m_axis, k_axis)),   # x_q
                NamedSharding(mesh, P(m_axis, None)),     # xs (per-row)
                NamedSharding(mesh, P(k_axis, n_axis)),   # values
                NamedSharding(mesh, P(None, n_axis)),     # scales2
            )
        else:
            arg_shardings = (
                NamedSharding(mesh, P(m_axis, k_axis)),
                NamedSharding(mesh, P(k_axis, n_axis)),
                NamedSharding(mesh, P(None, n_axis)),
            )
        result_sharding = NamedSharding(mesh, P(m_axis, n_axis))
        kw_p = kw(mesh_interpret(mesh, interpret))

        def lower(*ops):
            if act_quant:
                x_q, xs, values, scales2 = ops
                out = _qmm_local((x_q, xs), values, scales2, **kw_p)
            else:
                x2, values, scales2 = ops
                out = _qmm_local(x2, values, scales2, **kw_p)
            if k_axis is not None:
                # Row-parallel: shards hold partial products over their K
                # slice; the dequant scales are linear, so summing the
                # scaled partials is exact.
                out = jax.lax.psum(out, k_axis)
            return out

        return mesh, lower, result_sharding, arg_shardings

    # Shardy (the current propagation backend) additionally wants an
    # einsum-style factor rule; size-1 dims get their own free factors.
    # int4 values pack K into K//2 rows: that dim is its OWN factor (h) —
    # tying it to k would be a factor-size mismatch, which Shardy silently
    # resolves by replicating the weights (defeating the sharding).
    wk = "h" if mode == "int4" else "k"
    rule = (f"m k, m u, {wk} n, v n -> m n" if act_quant
            else f"m k, {wk} n, v n -> m n")
    fn.def_partition(partition=partition,
                     infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return fn


@contextlib.contextmanager
def spmd_partition_mode(on: bool = True):
    """Trace-time switch: wrap the quant kernel in custom_partitioning so
    GSPMD runs it shard-locally (see _make_qmm_partitioned)."""
    tok = _SPMD_PARTITION.set(bool(on))
    try:
        yield
    finally:
        _SPMD_PARTITION.reset(tok)


def spmd_safe(fn):
    """Decorator: whenever ``fn`` is called with a non-None ``mesh``
    argument (positional or keyword), quant matmuls trace through the
    custom_partitioning wrapper — GSPMD then runs the Pallas weight-stream
    kernel on each device's own weight shard (column-parallel: zero
    collectives; row-parallel: psum of partials) instead of failing to
    shard the raw Mosaic custom call. Single-chip calls are untouched.

    Interpret-mode resolution is delegated to ``parallel.mesh
    .mesh_interpret`` so an explicit ``interpret=`` on the entry point
    propagates to the quant kernels exactly as it does to the attention
    kernels, and the platform logic lives in one place."""
    import functools as _ft
    import inspect as _inspect

    sig = _inspect.signature(fn)

    @_ft.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = sig.bind_partial(*args, **kwargs).arguments
        mesh = bound.get("mesh")
        tok = None
        if mesh is not None:
            from ..parallel.mesh import mesh_interpret

            tok = _INTERPRET_OVERRIDE.set(
                mesh_interpret(mesh, bound.get("interpret")))
        try:
            with spmd_partition_mode(mesh is not None):
                return fn(*args, **kwargs)
        finally:
            if tok is not None:
                _INTERPRET_OVERRIDE.reset(tok)
    return wrapper


def quant_matmul(x, wq: QuantizedWeight, *, block_m: int = 256,
                 block_k: int = 512, block_n: int | None = None,
                 act_quant: bool = False,
                 n_inner: bool | None = None, interpret: bool | None = None):
    """``x @ W`` with W stored int8/int4, dequant fused into the kernel.

    ``x``: (..., K) activations (bf16/fp32); returns (..., N) in x's dtype.
    Small/ragged shapes fall back to a fused XLA dequant-matmul (the kernel
    wants MXU-aligned tiles; decode's tiny M is bandwidth-bound either way).

    Default blocks (512 K x 4096 N at decode m, 2048 N otherwise) are tuned
    on the 8B decode workload on v5e: the N-dim sweep 512 -> 1024 -> 2048
    measured 723 -> 803 -> 811 tokens/s end to end, and 2048 -> 4096 moved
    the W4A8 gate|up stream 726 -> 764 GB/s (bigger N tiles amortize the
    per-grid-step ramp of the weight stream; K 1024 regressed slightly).
    Tiles clamp to the operand, so small layers keep working.

    ``act_quant=True`` additionally quantizes activations per-row to int8
    and runs int8 x int8 MXU dots with exact int32 accumulation (W8A8 /
    W4A8): the weight tile goes straight from DMA to the MXU with no
    per-value upconvert, which is the weight-only path's throughput
    ceiling. Adds ~0.4% relative activation rounding error — opt in per
    weight via ``quantize_weight(..., act="int8")`` or per call.
    """
    if interpret is None:
        interpret = _INTERPRET_OVERRIDE.get()
    # Possibly-None view for the custom_partitioning path, which resolves
    # None against its actual mesh at partition time (the process default
    # backend is wrong for a virtual-CPU mesh on a TPU-attached box).
    interpret_arg = interpret
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    k, n = wq.shape
    lead = x.shape[:-1]
    m = 1
    for dim in lead:
        m *= dim
    if m == 0:
        return jnp.zeros((*lead, n), x.dtype)
    x2 = x.reshape(m, k)

    if block_n is None:
        # Decode-size m affords wide N tiles (the fp32 accumulator stays
        # tiny): bn 4096 measured 764 vs 726 GB/s on the W4A8 gate|up
        # stream. Larger m keeps 2048 to bound accumulator VMEM.
        block_n = 4096 if m <= 64 else 2048

    k_eff = k // 2 if wq.mode == "int4" else k
    bm = _fit_block(block_m, m, 8)
    bk = _fit_block(block_k, k_eff, 128)
    bn = _fit_block(block_n, n, 128)
    aligned = bm > 0 and bk > 0 and bn > 0 and not _FORCE_XLA.get()
    if not aligned:
        if act_quant:
            # Same math as the a8 kernel (exact int32 accumulation in XLA)
            # so ragged shapes stay consistent with the kernel path.
            x_q, xs = quantize_activations(x2)
            acc = jax.lax.dot_general(
                x_q, _stored_int8_columns(wq), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = (acc.astype(jnp.float32) * xs
                   * wq.scales[None, :].astype(jnp.float32))
            return out.astype(x.dtype).reshape(*lead, n)
        out = (x2.astype(jnp.float32) @ wq.dequantize().astype(jnp.float32))
        return out.astype(x.dtype).reshape(*lead, n)

    spmd = _SPMD_PARTITION.get()
    if act_quant:
        x_q, xs = quantize_activations(x2)
        scales = wq.scales.reshape(1, n).astype(jnp.float32)
        if spmd:
            pfn = _make_qmm_partitioned(wq.mode, True, block_m, block_k,
                                        block_n, interpret_arg,
                                        str(x.dtype))
            return pfn(x_q, xs, wq.values, scales).reshape(*lead, n)
        fn = _build_qmm_a8(m, k, n, wq.mode, str(x.dtype), bm, bk, bn,
                           interpret)
        return fn(x_q, xs, wq.values, scales).reshape(*lead, n)

    # The K-outer/N-inner walk needs the full-N fp32 accumulator row in
    # VMEM next to the double-buffered tiles; cap its use by footprint.
    # Off by default: measured within noise of the N-outer walk on the 8B
    # decode workload (807 vs 811 tok/s — the pipeline already hides the
    # strided weight stream), kept as an opt-in for other weight shapes.
    if n_inner is None:
        n_inner = False
    scales = wq.scales.reshape(1, n).astype(jnp.float32)
    if spmd:
        pfn = _make_qmm_partitioned(wq.mode, False, block_m, block_k,
                                    block_n, interpret_arg, str(x.dtype))
        return pfn(x2, wq.values, scales).reshape(*lead, n)
    use_n_inner = (n_inner and wq.mode == "int8"
                   and bm * n * 4 <= 16 * 1024 * 1024)
    fn = _build_qmm(m, k, n, wq.mode, str(x.dtype), bm, bk, bn, interpret,
                    n_inner=use_n_inner)
    return fn(x2, wq.values, scales).reshape(*lead, n)
