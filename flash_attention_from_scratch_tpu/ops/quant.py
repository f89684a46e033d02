"""Quantized tensor representation and quantization kernels.

Extension beyond the bf16/fp16 reference (BASELINE north star): symmetric
per-(batch, head) quantization of K/V to INT8 / packed INT4 / FP8-e4m3
(abs-max scales, deterministic round-to-nearest; plain jnp — XLA fuses the
scale/round/pack chain into one pass). Dequantization is never materialized
in HBM — the flash kernel folds the scales into the softmax scale (K) and
the output normalization (V); see ``flash_quant.py``.

On v5e the int8 MXU path is 2x bf16 throughput; fp8 has no native MXU
support on v5 (values are stored e4m3 for the 2x HBM saving and upcast to
bf16 in-kernel).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["QTensor", "quantize_kv", "quantize_kv_pages", "dequantize",
           "KVQuantMode"]

_INT4_MAX = 7.0
_INT8_MAX = 127.0
_FP8_MAX = 448.0  # e4m3 finite max


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """values + per-(batch, head) scales; layout (b, h, s, d) like the dense API.

    ``mode`` is one of "int8", "int4", "fp8". For int4 the values array packs
    two signed nibbles per int8 byte along d_head (d/2 bytes per row) with a
    *half-split* layout: byte j holds column j (low nibble) and column
    j + d/2 (high nibble). That way the consuming kernel never needs a
    stride-2 relayout — it slices the bf16 operand into contiguous halves
    and issues two half-d matmuls (see ``flash_quant.py``).
    """

    values: jax.Array
    scales: jax.Array  # (b, h) float32
    mode: str
    orig_dtype: object = jnp.bfloat16

    def tree_flatten(self):
        return (self.values, self.scales), (self.mode, self.orig_dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])

    @property
    def shape(self):
        return self.values.shape

    @property
    def seq_len(self):
        return self.values.shape[2]


class KVQuantMode:
    INT8 = "int8"
    INT4 = "int4"
    FP8 = "fp8"


def _qmax(mode: str) -> float:
    return {"int8": _INT8_MAX, "int4": _INT4_MAX, "fp8": _FP8_MAX}[mode]


@partial(jax.jit, static_argnames=("mode",))
def quantize_kv(x, mode: str = "int8") -> QTensor:
    """Symmetric per-(batch, head) quantization of a (b, h, s, d) tensor."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=(2, 3))  # (b, h)
    scale = jnp.maximum(absmax / _qmax(mode), 1e-12)
    inv = (1.0 / scale)[:, :, None, None]
    if mode == "int8":
        vals = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)
    elif mode == "int4":
        q = jnp.clip(jnp.round(xf * inv), -7, 7).astype(jnp.int8)
        d = q.shape[-1]
        # Half-split packing: byte j = col j (low nibble) | col j+d/2 (high).
        lo = q[..., : d // 2] & 0x0F
        hi = q[..., d // 2 :] & 0x0F
        vals = (lo | (hi << 4)).astype(jnp.int8)
    elif mode == "fp8":
        vals = (xf * inv).astype(jnp.float8_e4m3fn)
    else:
        raise ValueError(f"unknown quant mode {mode!r}")
    return QTensor(vals, scale, mode, x.dtype)


@partial(jax.jit, static_argnames=("mode",))
def quantize_kv_pages(pages, mode: str = "int8"):
    """Quantize a KV page pool (kv_heads, num_pages, page_size, d).

    Scales are per-(kv_head, page). INT4 uses the *sublane-packed* page
    layout the paged decode kernel consumes — byte (t, c) holds token t
    (lo nibble) and token t + page_size/2 (hi nibble) — keeping the lane
    dim 128-wide (the along-d packing of :func:`quantize_kv` would leave a
    64-lane minor dim that per-page DMA slices can't address).

    Returns (values, scales).
    """
    xf = pages.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=(2, 3))  # (kv_heads, num_pages)
    scale = jnp.maximum(absmax / _qmax(mode), 1e-12)
    inv = (1.0 / scale)[:, :, None, None]
    if mode == "int8":
        return jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8), scale
    if mode == "fp8":
        return (xf * inv).astype(jnp.float8_e4m3fn), scale
    if mode == "int4":
        q = jnp.clip(jnp.round(xf * inv), -7, 7).astype(jnp.int8)
        ps = q.shape[2]
        lo = q[:, :, : ps // 2] & 0x0F
        hi = q[:, :, ps // 2:] & 0x0F
        return (lo | (hi << 4)).astype(jnp.int8), scale
    raise ValueError(f"unknown quant mode {mode!r}")


def unpack_int4_halves(packed, out_dtype=jnp.float32):
    """Unpack half-split int4 bytes (..., d/2) -> (lo, hi), each (..., d/2).

    ``lo`` are columns [0, d/2), ``hi`` are columns [d/2, d). Sign-extension
    via arithmetic shifts: identical VPU ops inside Pallas kernels and jnp.
    """
    # i32 shifts: Mosaic only legalizes 32-bit shift ops (i8/i16 shli fails
    # to legalize, and v5e has no bf16 ALU for a float floor-trick route —
    # both were measured slower or uncompilable on chip).
    i32 = packed.astype(jnp.int32)
    lo = (jnp.left_shift(i32, 28) >> 28).astype(out_dtype)
    hi = (jnp.left_shift(i32, 24) >> 28).astype(out_dtype)
    return lo, hi


def unpack_int4(packed, out_dtype=jnp.float32):
    """Unpack half-split int4 (..., d/2) int8 -> (..., d) float."""
    lo, hi = unpack_int4_halves(packed, out_dtype)
    return jnp.concatenate([lo, hi], axis=-1)


@partial(jax.jit, static_argnames=())
def dequantize(qt: QTensor):
    """Full dequantization (testing/debug only — kernels fuse instead)."""
    s = qt.scales[:, :, None, None]
    if qt.mode == "int4":
        vals = unpack_int4(qt.values)
    else:
        vals = qt.values.astype(jnp.float32)
    return (vals * s).astype(qt.orig_dtype)
